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
}
