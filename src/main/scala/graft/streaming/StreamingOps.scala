package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators — the incremental counterparts of
  * [[graft.ops.EventOps]] (SURVEY.md §2.8: the reference has NO streaming;
  * these are the north-star additions a live PGN/event drop directory would
  * need: `readStream` → these transforms → `writeStream` with
  * `Trigger.AvailableNow`).
  *
  * All operators take/return streaming DataFrames and are tested end-to-end
  * with MemoryStream in StreamingSpec. Watermarks bound state: an hour
  * window + 2h watermark keeps O(active windows × groups) state regardless
  * of stream length — the property that matters on an unbounded 100 TB/day
  * feed.
  */
object StreamingOps {

  /** Tumbling-window counts with watermark (append-mode capable). Input must
    * have an event-time `ts: timestamp` column.
    */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Gap-based session windows via the built-in session_window — streaming
    * sessionization with watermark-bounded state.
    */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup — the live-ingest form of the batch q20 operator:
    * drop records whose `key` column was already seen, with state bounded by
    * the watermark (a duplicate arriving later than the watermark delay is
    * passed through rather than held forever — the standard
    * state-size/completeness trade on an unbounded feed).
    */
  def dedupStream(records: DataFrame, watermark: String = "1 hour"): DataFrame =
    records
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("key")

  /** Stream-stream interval join — attribute each `click` to the
    * `impression` with the same key that happened at most `window` before
    * it. BOTH sides carry watermarks and the join condition bounds the
    * event-time range in BOTH directions, so Spark can size the join state
    * and evict rows once the watermark passes (an unbounded-interval
    * stream-stream join would accumulate state forever — the condition IS
    * the state bound). Inputs: impressions(key, ts), clicks(key, ts).
    */
  def intervalJoinStreams(
      impressions: DataFrame,
      clicks: DataFrame,
      window: String = "10 minutes",
      watermark: String = "20 minutes"): DataFrame = {
    val i = impressions
      .select(col("key"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val c = clicks
      .select(col("key").as("c_key"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    i.join(c,
      col("key") === col("c_key") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"interval $window"))
      .select(col("key"), col("imp_ts"), col("click_ts"))
  }

  /** Spark 4 `transformWithState` form of the running per-user totals —
    * the successor API to mapGroupsWithState: typed named-state handles
    * (ValueState/ListState/MapState), per-state TTL, and timers. Requires
    * the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...RocksDBStateStoreProvider`). One ValueState cell per user; state
    * size is O(users) regardless of stream length.
    */
  case class UserTotals(count: Long, sum: Double)
  case class UserTotalsOut(user_id: Long, count: Long, sum: Double)

  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), UserTotalsOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var totals: ValueState[UserTotals] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals](
        "totals", org.apache.spark.sql.Encoders.product[UserTotals], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[(Long, Double)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotalsOut] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(0L, 0.0)
      var c = prev.count
      var s = prev.sum
      rows.foreach { case (_, v) => c += 1; s += v }
      totals.update(UserTotals(c, s))
      Iterator.single(UserTotalsOut(user, c, s))
    }
  }

  /** Running per-user (count, sum) via transformWithState. Input columns:
    * (user_id, value).
    */
  def runningTotalsTWS(events: Dataset[(Long, Double)]): Dataset[UserTotalsOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(
        new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Custom keyed state via mapGroupsWithState: running per-user event count
    * + last-seen event time (update mode). Demonstrates the arbitrary-state
    * surface (KeyValueGroupedDataset) the built-in windows can't express.
    */
  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class UserState(count: Long, lastTs: Long)
  case class UserSnapshot(user_id: Long, count: Long, last_seen_ms: Long)

  def runningUserCounts(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSnapshot](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, Long.MinValue))
          var c = prev.count
          var last = prev.lastTs
          rows.foreach { e =>
            c += 1
            if (e.ts.getTime > last) last = e.ts.getTime
          }
          state.update(UserState(c, last))
          UserSnapshot(user, c, last)
      }
  }

  /** Streaming throttle — the live form of the batch q108 debounce, with
    * the STRICTER semantics batch lag/cumsum cannot express: an event is
    * kept iff it is ≥ `gapMs` after the last KEPT event of its
    * (user, type) key (throttle-to-last-kept; the batch form is
    * burst-first, and the two diverge when a burst outlives the window).
    * That "last kept" is genuine running state — exactly what
    * flatMapGroupsWithState exists for: one 8-byte cell per live key,
    * emitted events only (update mode).
    *
    * Rows inside one micro-batch are buffered and sorted by event time
    * before the gap test (a micro-batch hands the group an unordered
    * iterator; state size is per-key-per-batch rows, bounded by trigger
    * interval — the standard micro-batch memory bound).
    */
  case class ThrottleEvent(user_id: Long, event_type: String,
      ts: java.sql.Timestamp)
  case class ThrottleState(lastKeptMs: Long)

  def throttleStream(events: Dataset[ThrottleEvent],
      gapMs: Long): Dataset[ThrottleEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[ThrottleState, ThrottleEvent](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (_, rows: Iterator[ThrottleEvent], state: GroupState[ThrottleState]) =>
          var last = state.getOption.map(_.lastKeptMs).getOrElse(Long.MinValue)
          val kept = rows.toSeq.sortBy(_.ts.getTime).filter { e =>
            val t = e.ts.getTime
            val keep = last == Long.MinValue || t - last >= gapMs
            if (keep) last = t
            keep
          }
          if (last != Long.MinValue) state.update(ThrottleState(last))
          kept.iterator
      }
  }

  // ------------------------------------------------ streaming count-min grid

  /** One sketch cell after a batch's increments. */
  case class CmsCell(d: Int, bucket: Long, cnt: Long)

  /** Keyed cell counter: state per (d, bucket) is ONE long — the whole
    * query checkpoints at most CmsDepth×CmsWidth values no matter how much
    * stream has flowed, which is the q177 scaladoc's claim ("the grid is
    * the only state a streaming ingest would checkpoint") made literal.
    */
  class CmsCellProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, Long), (Int, Long), CmsCell] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long](
        "cnt", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        cell: (Int, Long),
        rows: Iterator[(Int, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[CmsCell] = {
      val c = (if (cnt.exists()) cnt.get() else 0L) + rows.size
      cnt.update(c)
      Iterator.single(CmsCell(cell._1, cell._2, c))
    }
  }

  /** Streaming maintenance of the q177 count-min grid: terms flatMap to
    * their [[graft.ops.SketchOps.CmsDepth]] cells (the SAME portable
    * bucket formula as the batch operator — one shared definition), cells
    * key the stateful counter. Update-mode output emits each touched
    * cell's running count; after any prefix of the stream the state equals
    * the batch grid over the same terms (StreamingSpec proves equality
    * against [[graft.ops.SketchOps.sketchCells]]).
    */
  def cmsCellsStream(terms: Dataset[String]): Dataset[CmsCell] = {
    import terms.sparkSession.implicits._
    terms
      .flatMap(t => graft.ops.SketchOps.cellsOf(graft.functions.PortableHash.h32(t)))
      .groupByKey(identity)
      .transformWithState(
        new CmsCellProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  // ------------------------------------------------ streaming digest manifest

  /** One manifest bucket after a batch's rows. */
  case class DigestBucket(bucket: Long, n: Long, xr: Long, ms: Long)

  /** Keyed digest state: three longs per bucket — the whole integrity
    * manifest checkpoints at most
    * [[graft.ops.LakehouseOps.ManifestBuckets]]×3 values however much
    * stream has flowed. Commutativity of XOR and the bounded modular sum
    * is what makes the state a DIGEST rather than a log: arrival order,
    * batch boundaries and retries-with-dedup cannot change the fixpoint.
    */
  class DigestBucketProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long, Long), DigestBucket] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)](
        "digest", org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(
        bucket: Long,
        rows: Iterator[(Long, Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[DigestBucket] = {
      var (n, xr, ms) = if (st.exists()) st.get() else (0L, 0L, 0L)
      rows.foreach { case (_, h64, hm) => n += 1; xr ^= h64; ms += hm }
      st.update((n, xr, ms))
      Iterator.single(DigestBucket(bucket, n, xr, ms))
    }
  }

  /** Streaming maintenance of the release-integrity manifest (the q185 /
    * CorpusBuild digest kernel): each (id, payload) row folds into its
    * bucket's (count, XOR, modular-sum) state using the SAME portable
    * hash and modulus as the batch operator, so after any prefix of the
    * stream the state table equals
    * [[graft.ops.LakehouseOps.digestManifest]] over the same rows
    * (StreamingSpec proves the equality). This is how an INGEST pipeline
    * keeps its manifest current without re-scanning what it already
    * wrote: the digest is mergeable, so batch-computed history and
    * stream-maintained tail compose by one more fold.
    */
  def digestManifestStream(rows: Dataset[(Long, String)]): Dataset[DigestBucket] = {
    import rows.sparkSession.implicits._
    import graft.functions.PortableHash
    val buckets = graft.ops.LakehouseOps.ManifestBuckets
    val mod = graft.ops.LakehouseOps.ManifestSumMod
    rows
      .map { case (id, payload) =>
        val rowStr = s"$id|$payload"
        (math.floorMod(PortableHash.h32(id.toString), buckets.toLong),
          PortableHash.h64(rowStr), PortableHash.h32(rowStr) % mod)
      }
      .groupByKey(_._1)
      .transformWithState(
        new DigestBucketProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  // ------------------------------------------- streaming CDC chunk index

  /** One chunk-fp cell after a batch's occurrences. */
  case class ChunkCell(fp: Long, n: Long)

  /** Keyed occurrence counter for the q200 chunk index: state per chunk
    * fp is ONE long. Unlike the CMS grid the key space is data-sized —
    * but it is bounded by DISTINCT chunk content (the dedup index itself),
    * and content-hash keys are skew-proof; this is the streaming form of
    * exactly the state a batch q200 materializes as its aggregation.
    */
  class ChunkCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Long, ChunkCell] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long](
        "cnt", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        fp: Long,
        rows: Iterator[Long],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[ChunkCell] = {
      val c = (if (cnt.exists()) cnt.get() else 0L) + rows.size
      cnt.update(c)
      Iterator.single(ChunkCell(fp, c))
    }
  }

  /** Streaming maintenance of the q200 content-defined chunk index:
    * arriving documents chunk through the SAME
    * [[graft.functions.PortableHash.cdcChunkList]] core as the batch
    * kernel (identical boundaries by construction), and each chunk fp
    * keys a one-long occurrence counter. After any prefix of the stream,
    * cells with n ≥ 2 equal the batch q200 index's (chunk_fp, n_occ) over
    * the same documents (StreamingSpec proves the equality) — so a
    * crawler's ingest can maintain its storage-dedup candidate index
    * incrementally instead of re-chunking the corpus per release.
    */
  def chunkIndexStream(docs: Dataset[(Long, String)]): Dataset[ChunkCell] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap { case (_, text) =>
        graft.functions.PortableHash
          .cdcChunkList(text, graft.ops.Dedup.CdcK, graft.ops.Dedup.CdcMod)
          .map(_._1)
      }
      .groupByKey(identity)
      .transformWithState(
        new ChunkCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  // -------------------------------------- streaming near-dup on arrival

  /** A document's 64-bit SimHash fingerprint entering the stream. */
  case class FpDoc(doc_id: Long, fp: Long)

  /** A verified near-duplicate detection: doc_a < doc_b, hamming ≤ the
    * q24 threshold. The same fp may fire from several shared chunks —
    * consumers `distinct` (the batch side dedups identically).
    */
  case class NearDupHit(doc_a: Long, doc_b: Long, hamming: Int)

  /** Per-bucket retained fingerprints (bounded, newest-last). */
  case class BucketState(ids: List[Long], fps: List[Long])

  /** Max fingerprints retained per chunk bucket — the STREAMING twin of
    * the batch MaxPostings cap: total state ≤ buckets × cap entries no
    * matter how much stream has flowed; a mega-bucket (a boilerplate
    * chunk value shared by millions of docs) evicts oldest-first instead
    * of growing without bound, exactly the trade the batch cap makes.
    */
  val NearDupBucketCap = 64

  /** SimHash near-dup detection ON ARRIVAL — the streaming counterpart of
    * q24's batch pair generation, for an ingest pipeline that must flag
    * (or quarantine) a document against everything already ingested
    * WITHOUT re-running a corpus-wide join per batch. Same geometry as
    * the batch operator ([[graft.ops.Dedup.simhashPairs]]): the 64-bit
    * fingerprint splits into 8 8-bit chunks; pigeonhole guarantees any
    * pair with hamming ≤ 7 shares a chunk, so keying state by (chunk idx,
    * chunk value) and hamming-verifying each arrival against the bucket's
    * retained fingerprints finds every qualifying pair whose partner is
    * still retained. Arrivals in the same micro-batch check each other
    * too (processed in doc_id order, so the emitted pair set is
    * batch-boundary-invariant BELOW the cap — once a bucket evicts, the
    * retained set depends on arrival order across batches, so the
    * invariance guarantee holds for globally doc_id-ascending streams or
    * buckets under the cap); pairs normalize to doc_a < doc_b and
    * multi-chunk double-fires dedup downstream, mirroring the batch
    * plan's verify-then-dropDuplicates.
    *
    * State bound: [[NearDupBucketCap]] (id, fp) entries per live bucket —
    * 2048 buckets × cap at the q24 geometry, independent of stream
    * length; production additionally ages buckets out with a state TTL
    * (GroupStateTimeout) when "already ingested" has a freshness horizon.
    * Drained-stream equivalence against the batch operator is pinned in
    * StreamingSpec, cap permitting (an evicted fingerprint can no longer
    * pair — the recall cost of bounded state, same as the batch cap's).
    */
  def nearDupStream(docs: Dataset[FpDoc],
      cap: Int = NearDupBucketCap): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    val chunks = graft.ops.Dedup.Simhash64Chunks
    val maxH = graft.ops.Dedup.Simhash64MaxHamming
    val bits = 64 / chunks
    val mask = (1L << bits) - 1
    docs
      .flatMap { d =>
        (0 until chunks).map { i =>
          ((i.toLong << bits) | ((d.fp >>> (i * bits)) & mask), d.doc_id, d.fp)
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var ids = state.getOption.map(_.ids).getOrElse(Nil)
          var fps = state.getOption.map(_.fps).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[NearDupHit]
          rows.toSeq.sortBy(_._2).foreach { case (_, id, fp) =>
            if (!ids.contains(id)) { // idempotent under re-delivery
              ids.iterator.zip(fps.iterator).foreach { case (pid, pfp) =>
                val h = java.lang.Long.bitCount(pfp ^ fp)
                if (h <= maxH)
                  out += NearDupHit(math.min(pid, id), math.max(pid, id), h)
              }
              ids = (ids :+ id).takeRight(cap)
              fps = (fps :+ fp).takeRight(cap)
            }
          }
          state.update(BucketState(ids, fps))
          out.iterator
      }
  }
}
