package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Checkpointing.LineageSyntax
import graft.Tables

/** Round-2 widening: MERGE-style upsert, as-of join, range join, k-means
  * IVF training, and the analytic-window suite — operators a training-data
  * lakehouse needs that the reference (and round 1) lacked. Each is
  * oracle-checked; each is written for the 100 TB shape first (no driver
  * collects on the fact side, joins keyed for shuffle-hash or broadcast,
  * as-of without pair fan-out).
  */
object AdvancedOps {

  private def r4(c: Column): Column = Portable.r4(c)
  private def r4Sql(x: String) = Portable.r4Sql(x)
  /** 2-decimal floor-round (money), same portability rationale as r4. */
  private def r2(c: Column): Column = floor(c * 100.0 + 0.5) / 100.0
  private def r2Sql(x: String) = s"floor(($x) * 100.0 + 0.5) / 100.0"

  // ---------------------------------------------------------------- q50 MERGE

  /** Generic MERGE INTO on immutable storage (recompute model, like
    * OpeningEnrichment.writeBack generalizes the reference's UPDATE…FROM):
    * WHEN MATCHED THEN UPDATE SET — `updateSet` maps target column names to
    * expressions that may reference both sides via `target("c")` /
    * `source("c")`; WHEN NOT MATCHED THEN INSERT — `insertRow` projects
    * source rows to the target schema (aliased to target column names).
    *
    * PRECONDITION: `source` must be unique on `sourceKey` — SQL MERGE raises
    * a cardinality violation for multi-matches; this recompute form would
    * instead silently emit the target row once per match. Enforced by
    * default (`assertUniqueSource`): one count-vs-distinct aggregation over
    * the source (the delta side — small relative to the target; at 100 TB
    * the extra pass costs O(|source|), not O(|target|)). Disable only when
    * the caller has already aggregated the source by key.
    *
    * Scale shape: ONE full-outer equi-join on the merge key serves both
    * MERGE branches — matched rows take the update expressions, source-only
    * rows take the insert projection, target-only rows pass through — so
    * the fact table shuffles ONCE (the earlier left-join + anti-join form
    * shuffled it twice, and its plan flipped broadcast→SMJ with scale
    * because the delta is a fixed FRACTION of the fact, ~1/7 here: never
    * broadcastable at 100 TB, so the single sort-merge join IS the honest
    * plan at every scale factor — same strategy at sf0.1 and sf1, no flip).
    * Row membership is decided by side-marker columns, not key nullability,
    * so NULL source keys still flow to the insert branch. `insertRow` must
    * be aliased to target column names AND in target column order. No
    * driver-side state, no fact-table rewrite beyond the touched columns.
    */
  def mergeUpsert(
      target: DataFrame,
      source: DataFrame,
      targetKey: String,
      sourceKey: String,
      updateSet: Map[String, Column],
      insertRow: Seq[Column],
      assertUniqueSource: Boolean = true): DataFrame = {
    if (assertUniqueSource) {
      // count(col) vs count(*): NULL source keys are MERGE-legal (they match
      // no target row and flow to the insert branch), and count_distinct
      // skips NULLs — comparing against count(*) would reject a unique
      // source that merely contains a NULL key
      val r = source.agg(count(col(sourceKey)), count_distinct(col(sourceKey))).head()
      require(r.getLong(0) == r.getLong(1),
        s"mergeUpsert: source has duplicate '$sourceKey' values " +
          s"(${r.getLong(0)} non-null keys, ${r.getLong(1)} distinct) — " +
          "SQL MERGE would raise a cardinality violation; aggregate the source first")
    }
    require(insertRow.length == target.columns.length,
      s"mergeUpsert: insertRow has ${insertRow.length} expressions for " +
        s"${target.columns.length} target columns")
    // binding is positional, but the aliases the API encourages must not
    // silently lie: an aliased insert expression whose name disagrees with
    // the column it is zipped against is a caller error, not decoration
    target.columns.toIndexedSeq.zip(insertRow).foreach { case (c, ins) =>
      org.apache.spark.sql.graft.ColumnBridge.expression(ins) match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias =>
          require(a.name == c,
            s"mergeUpsert: insert expression aliased '${a.name}' is bound " +
              s"to target column '$c' — insertRow is positional in " +
              "target.columns order")
        case _ => // unaliased expressions bind positionally by contract
      }
    }
    val t = target.withColumn("__t", lit(1))
    val s = source.withColumn("__s", lit(1))
    val joined = t.join(s, target(targetKey) === source(sourceKey), "full_outer")
    val isInsert = col("__t").isNull
    val matched = col("__s").isNotNull
    joined.select(target.columns.toIndexedSeq.zip(insertRow).map {
      case (c, ins) =>
        val upd = updateSet.get(c) match {
          case Some(e) => when(matched, e).otherwise(target(c))
          case None => target(c)
        }
        when(isInsert, ins).otherwise(upd).as(c)
    }: _*)
  }

  /** q50: MERGE upsert over `orders` — updates bump the price of every 7th
    * order by 10%; inserts add a synthetic order per 500th key. Exercises
    * the matched-update join + not-matched anti-join + union recompute shape
    * against a LEFT-JOIN + NOT-EXISTS oracle.
    */
  def mergeUpsertOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    // insert keys are NEGATIVE (-k - 1): structurally disjoint from real
    // o_orderkey (≥ 0) at ANY scale factor — an offset like +10M would
    // collide once the key domain outgrows it
    val src = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("u_key"),
        r2(col("o_totalprice") * 1.1).as("u_price"))
      .unionByName(
        o.filter(col("o_orderkey") % 500 === 0)
          .select((-col("o_orderkey") - 1L).as("u_key"),
            lit(42.0).as("u_price")))
    mergeUpsert(
      target = o, source = src, targetKey = "o_orderkey", sourceKey = "u_key",
      updateSet = Map("o_totalprice" -> src("u_price")),
      insertRow = Seq(
        src("u_key").as("o_orderkey"), lit(-1L).as("o_custkey"),
        lit("N").as("o_orderstatus"), src("u_price").as("o_totalprice"),
        // session-TZ-safe literal: Timestamp.valueOf would bake in the JVM
        // default zone; to_timestamp honors spark.sql.session.timeZone=UTC
        to_timestamp(lit("2000-01-01 00:00:00")).as("o_orderdate"),
        lit("0-MERGED").as("o_orderpriority")))
  }

  val mergeUpsertOrdersSql: String =
    s"""WITH upd AS (
       |  SELECT o_orderkey AS u_key, ${r2Sql("o_totalprice * 1.1")} AS u_price
       |  FROM orders WHERE o_orderkey % 7 = 0),
       |ins AS (SELECT -o_orderkey - 1 AS u_key FROM orders WHERE o_orderkey % 500 = 0)
       |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
       |       coalesce(u.u_price, o.o_totalprice) AS o_totalprice,
       |       o.o_orderdate, o.o_orderpriority
       |FROM orders o LEFT JOIN upd u ON o.o_orderkey = u.u_key
       |UNION ALL
       |SELECT i.u_key, -1, 'N', 42.0, TIMESTAMP '2000-01-01 00:00:00', '0-MERGED'
       |FROM ins i WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = i.u_key)""".stripMargin

  // ---------------------------------------------------------------- q51 as-of

  /** q51: as-of join — for each `click` event, the latest `purchase` by the
    * same user at or before the click.
    *
    * Spark has no ASOF JOIN operator; the naive form (theta join on
    * `p.ts <= c.ts` + per-click top-1) fans out to O(clicks × purchases)
    * within a user. This is the **union merge-asof** instead: tag both
    * streams, one shuffle on user_id, one sort on (ts, side), then a
    * running `last(purchase, ignoreNulls)` window carries the most recent
    * purchase forward into each click row — O(n log n) per user partition,
    * no pair fan-out, works at any skew (a user's events fit one partition;
    * if a single user exceeded a partition, range-partition on (user, time)
    * with per-range seed carry-in — documented, not needed at this scale).
    * (user_id, ts) is unique in the events table, so the sort is total; the
    * `side` key orders a purchase before a click at equal ts (ties are
    * inclusive: `p.ts <= c.ts`).
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    // sort_id (event_id) as the final sort key: two purchases by one user at
    // the same µs-truncated tns would otherwise make both the running-last
    // window and the oracle's row_number pick an ARBITRARY one (latent
    // nondeterminism / parity flake); with it, both sides deterministically
    // keep the max event_id (last in ASC order ≡ rn=1 of DESC order)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tns"), col("side"), col("sort_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    asofProject(asofUnion(spark, sfDir)
      .withColumn("last_p", last(col("p"), ignoreNulls = true).over(w)))
  }

  /** The tagged purchase/click union both as-of forms (q51 window, q172
    * ranged) consume: one row per event, `p` non-null exactly on purchase
    * (build) rows, ordered per user by (tns, side, sort_id).
    */
  private def asofUnion(spark: SparkSession, sfDir: String): DataFrame = {
    // ts is int64 epoch-nanos (Tables.NanosFlag), µs-truncated to the
    // precision DuckDB reads parquet TIMESTAMP(NANOS) at (see EventOps)
    val ev = Tables.events(spark, sfDir)
      .withColumn("tns", col("ts") - pmod(col("ts"), lit(1000L)))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tns"), lit(0).as("side"),
        col("event_id").as("sort_id"),
        struct(col("event_id"), col("tns").as("p_ts"), col("value")).as("p"),
        lit(null).cast("long").as("click_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tns"), lit(1).as("side"),
        col("event_id").as("sort_id"),
        lit(null).cast(purchases.schema("p").dataType).as("p"),
        col("event_id").as("click_id"))
    purchases.unionByName(clicks)
  }

  /** Shared projection from a carried `last_p` row set to the q51 output
    * contract (click rows only).
    */
  private def asofProject(withLast: DataFrame): DataFrame =
    withLast
      .filter(col("side") === 1)
      .select(
        col("click_id"), col("user_id"), col("tns").as("click_ts"),
        col("last_p.event_id").as("purchase_id"),
        col("last_p.p_ts").as("purchase_ts"),
        col("last_p.value").as("purchase_value"))

  /** Range width for the q172 ranged as-of: 6 hours of epoch-nanos. The
    * stitch frame is span/6h rows per user (calendar-bounded); the max
    * window task is one user's events in one 6-hour span — tune DOWN for
    * hotter keys, UP for sparser ones (per-key stitch rows grow as the
    * range shrinks, both sides stay calendar/event bounded).
    */
  val AsOfRangeNs: Long = 6L * 3600L * 1000000000L

  /** q172: the q51 as-of join with NO per-user event sort —
    * [[ScaleOps.rangedAsOf]]'s bucket-and-stitch replaces the
    * user-partitioned running-last window, so a mega-user (the q51
    * scaladoc's documented degenerate case: 10¹⁰ events in one window
    * partition) splits across (user, 6h-range) tasks instead of
    * serializing one straggler. Output contract and oracle are exactly
    * q51's — the driver hash-matches both against the same SQL, which IS
    * the row-identity proof at gate scale (RangedAsOfSpec adds the
    * constructed cross-range fixtures: empty probe-only ranges, seeds
    * carried across many empty ranges, build-and-probe ties).
    */
  def asofJoinRanged(spark: SparkSession, sfDir: String): DataFrame =
    asofProject(ScaleOps.rangedAsOf(
      asofUnion(spark, sfDir), "user_id", "tns", "side", "sort_id", "p",
      AsOfRangeNs, out = "last_p"))

  val asofJoinSql: String =
    """WITH c AS (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) * 1000 AS tns
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) * 1000 AS tns, value
      |      FROM events WHERE event_type = 'purchase'),
      |matched AS (
      |  SELECT c.event_id AS click_id, c.user_id, c.tns AS click_ts,
      |         p.event_id AS purchase_id, p.tns AS purchase_ts, p.value AS purchase_value,
      |         row_number() OVER (PARTITION BY c.event_id
      |                            ORDER BY p.tns DESC, p.event_id DESC) AS rn
      |  FROM c JOIN p ON p.user_id = c.user_id AND p.tns <= c.tns)
      |SELECT click_id, user_id, click_ts, purchase_id, purchase_ts, purchase_value
      |FROM matched WHERE rn = 1
      |UNION ALL
      |SELECT c.event_id, c.user_id, c.tns, NULL::BIGINT, NULL::BIGINT, NULL::DOUBLE
      |FROM c WHERE NOT EXISTS (
      |  SELECT 1 FROM p WHERE p.user_id = c.user_id AND p.tns <= c.tns)""".stripMargin

  // ------------------------------------------------------------- q52 range join

  val RangeWindowMinutes = 5

  /** q52: range join — per click, count/sum of `view` events by the same
    * user in the preceding 5-minute window [ts-5min, ts).
    *
    * The naive plan is a BroadcastNestedLoopJoin on the inequality — O(n·m)
    * per user. Bucketizing time into window-sized epochs turns it into an
    * **equi-join on (user_id, bucket)**: a 5-minute look-back spans at most
    * 2 buckets, so each click probes exactly 2 keys and the residual
    * inequality filters within-bucket — the standard range-join-to-hash-join
    * rewrite, linear shuffle volume at any scale.
    */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val windowNs = RangeWindowMinutes * 60L * 1000000000L
    // bucket key = bucket START in nanos (pure integer math — dividing
    // epoch-nanos would exceed double's 2^53 exact range)
    def bkt(tns: Column): Column = tns - pmod(tns, lit(windowNs))
    // ts is int64 epoch-nanos, µs-truncated (same contract as EventOps)
    val ev = Tables.events(spark, sfDir)
      .withColumn("tns", col("ts") - pmod(col("ts"), lit(1000L)))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("tns").as("c_tns"))
      // a windowNs look-back spans at most 2 window-sized buckets
      .withColumn("bkt", explode(array(bkt(col("c_tns")) - windowNs, bkt(col("c_tns")))))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("tns").as("v_tns"), col("value"),
        bkt(col("tns")).as("bkt"))
    val matched = clicks.join(views, Seq("user_id", "bkt"))
      .filter(col("v_tns") >= col("c_tns") - windowNs && col("v_tns") < col("c_tns"))
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n_views"), sum(col("value")).as("sv"))
    // left semantics: clicks with no views in range report 0
    val allClicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("tns").as("click_ts"))
    allClicks.join(matched, Seq("click_id"), "left")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        r4(coalesce(col("sv"), lit(0.0))).as("sum_value"))
  }

  val rangeJoinSql: String = {
    val windowNs = RangeWindowMinutes * 60L * 1000000000L
    s"""WITH c AS (SELECT event_id AS click_id, user_id,
       |                  epoch_us(ts::TIMESTAMP) * 1000 AS click_ts
       |           FROM events WHERE event_type = 'click'),
       |v AS (SELECT user_id, epoch_us(ts::TIMESTAMP) * 1000 AS tns, value
       |      FROM events WHERE event_type = 'view')
       |SELECT c.click_id, c.user_id, c.click_ts,
       |       count(v.tns) AS n_views,
       |       ${r4Sql("coalesce(sum(v.value), 0)")} AS sum_value
       |FROM c LEFT JOIN v
       |  ON v.user_id = c.user_id
       | AND v.tns >= c.click_ts - $windowNs
       | AND v.tns < c.click_ts
       |GROUP BY 1, 2, 3""".stripMargin
  }

  // ----------------------------------------------------------- q49 k-means IVF

  val KmeansK = 8
  val KmeansIters = 2

  /** q49: k-means training (Lloyd iterations) for the IVF-ANN index family —
    * q37 uses fixed sample vectors as "centroids"; this trains them.
    * Deterministic contract shared with the oracle: init = vectors with
    * vec_id < K; distance = ||e||² − 2·e·c + ||c||² evaluated in exactly
    * that form; assignment tie-break = lowest centroid id; `KmeansIters`
    * reassign→recompute rounds; output = final assignment.
    *
    * Scale shape per iteration: assignment is a broadcast of K centroid
    * rows against the vector table (narrow, no fact shuffle) + a map-side-
    * combinable argmin; recompute is one posexplode + (cluster, dim) hash
    * aggregation — shuffle volume O(K × dim), independent of row count.
    * The driver never materializes vectors, only the K×dim centroid table.
    */
  def kmeansAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val dot = (a: Column, b: Column) => graft.functions.chess.vecDot(a, b)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    var cent = e.filter(col("vec_id") < KmeansK)
      .select(col("vec_id").as("c_id"), col("emb").as("cv"))

    def assign(cent: DataFrame): DataFrame =
      e.join(broadcast(cent), lit(true))
        .select(col("vec_id"), col("emb"), col("c_id"),
          (dot(col("emb"), col("emb")) - lit(2.0) * dot(col("emb"), col("cv")) +
            dot(col("cv"), col("cv"))).as("d2"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("c_id"))).as("best"),
          first(col("emb")).as("emb"))
        .select(col("vec_id"), col("emb"), col("best.c_id").as("cluster"))

    var assigned = assign(cent)
    for (_ <- 1 until KmeansIters) {
      // r4 floor-round each centroid component: avg() sums doubles in
      // partition-dependent order, so unrounded centroids could differ from
      // the oracle's by an ulp and flip a near-tied assignment — rounding on
      // BOTH sides makes the round-2 distances bit-identical
      cent = assigned
        .select(col("cluster"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos")).agg(r4(avg(col("v"))).as("m"))
        .groupBy(col("cluster"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("cluster").as("c_id"),
          transform(col("ps"), p => p.getField("m")).as("cv"))
      assigned = assign(cent)
    }
    assigned.select(col("vec_id"), col("cluster"))
  }

  val kmeansAssignSql: String = {
    val dim = Similarity.Dim
    val d2 = (e: String, c: String) =>
      s"""(list_sum(list_transform(range(1, ${dim + 1}), i -> $e[i]::DOUBLE * $e[i]::DOUBLE))
         | - 2.0 * list_sum(list_transform(range(1, ${dim + 1}), i -> $e[i]::DOUBLE * $c[i]::DOUBLE))
         | + list_sum(list_transform(range(1, ${dim + 1}), i -> $c[i]::DOUBLE * $c[i]::DOUBLE)))""".stripMargin
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
       |           FROM embeddings),
       |c0 AS (SELECT vec_id AS c_id, emb AS cv FROM e WHERE vec_id < $KmeansK),
       |a1 AS (
       |  SELECT vec_id, emb, c_id AS cluster FROM (
       |    SELECT e.vec_id, e.emb, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${d2("e.emb", "c.cv")} ASC, c.c_id ASC) AS rn
       |    FROM e CROSS JOIN c0 c) WHERE rn = 1),
       |c1 AS (
       |  SELECT cluster AS c_id, list(m ORDER BY pos) AS cv FROM (
       |    SELECT cluster, i AS pos, ${r4Sql("avg(emb[i])")} AS m
       |    FROM a1, range(1, ${dim + 1}) r(i) GROUP BY 1, 2)
       |  GROUP BY 1),
       |a2 AS (
       |  SELECT vec_id, c_id AS cluster FROM (
       |    SELECT e.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${d2("e.emb", "c.cv")} ASC, c.c_id ASC) AS rn
       |    FROM e CROSS JOIN c1 c) WHERE rn = 1)
       |SELECT vec_id, cluster FROM a2""".stripMargin
  }

  // ------------------------------------------------------- q53 window suite

  /** q53: analytic window suite — lag/lead/ntile/percent_rank in one pass
    * (single shuffle+sort on (o_custkey; o_orderdate, o_orderkey)).
    */
  def windowSuite(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      ntile(4).over(w).as("quartile"),
      r4(percent_rank().over(w)).as("pct_rank"))
  }

  val windowSuiteSql: String =
    s"""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  lag(o_totalprice, 1) OVER w AS prev_price,
       |  lead(o_totalprice, 1) OVER w AS next_price,
       |  (ntile(4) OVER w)::INT AS quartile,
       |  ${r4Sql("percent_rank() OVER w")} AS pct_rank
       |FROM orders
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // ------------------------------------------------------------- q54 TF-IDF

  val TfidfTopK = 3

  /** q54: TF-IDF keyword extraction — top-k terms per document. The
    * classic corpus-statistics op: explode tokens → (doc, term) tf →
    * term-level df (a small dimension joined back broadcast) → score →
    * per-doc top-k window. N rides along as a broadcast 1-row aggregate, so
    * the only fact-side shuffles are the two hash aggregations.
    */
  def tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs
      .select(col("doc_id"), explode(Portable.toks(col("text"))).as("tok"))
      .select(col("doc_id"), lower(col("tok")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        r4(col("tf") * log(col("n").cast("double") / col("df"))).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TfidfTopK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("rn"))
  }

  val tfidfSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lower(unnest(${Portable.toksSql})) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |         ${r4Sql("tf.tf * ln(n.n::DOUBLE / df.df)")} AS score
       |  FROM tf JOIN df USING (term) CROSS JOIN n)
       |SELECT doc_id, term, tf, df, score, rn::INT AS rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |                               ORDER BY score DESC, term ASC) AS rn
       |  FROM scored)
       |WHERE rn <= $TfidfTopK""".stripMargin

  // ------------------------------------------------- q55 multi-probe LSH ANN

  /** q55: multi-probe hyperplane-LSH ANN — q26 probes only the query's own
    * bucket; here each query ALSO probes the bucket with its least-confident
    * sign bit flipped (smallest |margin|), roughly doubling candidates and
    * recall for 2× probe cost — the standard recall/cost knob that avoids
    * growing the index. Same downstream: exact cosine + per-query top-k.
    */
  def annMultiProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val fns = graft.functions.chess
    def dot(a: Column, b: Column): Column = fns.vecDot(a, b)
    def norm(a: Column): Column = sqrt(dot(a, a))
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        fns.hyperplaneBucket(col("embedding")).as("bkt"),
        norm(col("embedding")).as("nrm"))
    val qBase = e.filter(col("vec_id") < Similarity.NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("bkt"), col("nrm").as("qn"),
        fns.hyperplaneMargins(col("embedding")).as("ms"))
    val absMs = transform(col("ms"), m => abs(m))
    val weakest = array_position(absMs, array_min(absMs)) // 1-based
    val q = qBase
      .withColumn("probe", explode(array(col("bkt"),
        col("bkt").bitwiseXOR(
          call_function("shiftleft", lit(1L), (weakest - 1).cast("int"))))))
      .select(col("q_id"), col("qv"), col("qn"), col("probe"))
    val scored = q.join(e, col("probe") === e("bkt"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm"))).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Similarity.K)
      .select(col("q_id"), col("n_id"), col("score"), col("rn"))
  }

  val annMultiProbeSql: String = {
    val dim = Similarity.Dim
    val dotSql = (a: String, b: String) => Portable.dotSql(a, b, dim)
    val planeDots = Similarity.Hyperplanes.map { plane =>
      plane.zipWithIndex.map { case (p, d) => s"embedding[${d + 1}]::DOUBLE * ($p)" }
        .mkString(" + ")
    }
    val msList = planeDots.mkString("[", ", ", "]")
    val bktFromMs = (0 until Similarity.LshBits)
      .map(i => s"(CASE WHEN ms[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString("(", " + ", ")::BIGINT")
    s"""WITH base AS (
       |  SELECT vec_id, embedding, $msList AS ms FROM embeddings),
       |b AS (
       |  SELECT vec_id, embedding, $bktFromMs AS bkt,
       |         list_indexof(list_transform(ms, x -> abs(x)),
       |                      list_min(list_transform(ms, x -> abs(x)))) AS weakest
       |  FROM base),
       |q AS (
       |  SELECT vec_id AS q_id, embedding AS qv, probe FROM (
       |    SELECT *, unnest([bkt, xor(bkt, 1::BIGINT << (weakest - 1))]) AS probe
       |    FROM b WHERE vec_id < ${Similarity.NQueries})),
       |scored AS (
       |  SELECT q.q_id, e.vec_id AS n_id,
       |         ${dotSql("q.qv", "e.embedding")} /
       |         (sqrt(${dotSql("q.qv", "q.qv")}) * sqrt(${dotSql("e.embedding", "e.embedding")})) AS cos
       |  FROM q JOIN b e ON q.probe = e.bkt WHERE q.q_id <> e.vec_id),
       |ranked AS (
       |  SELECT q_id, n_id, ${r4Sql("cos")} AS score,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY ${r4Sql("cos")} DESC, n_id ASC) AS rn
       |  FROM scored)
       |SELECT q_id, n_id, score, rn::INT AS rn
       |FROM ranked WHERE rn <= ${Similarity.K}""".stripMargin
  }

  // ------------------------------------- q57 dedup clusters (connected comps)

  /** q57: near-dup clustering — connected components over the SimHash pair
    * graph (q24), labeling every document in a dup group with the group's
    * minimum doc_id (the "keep-first" representative). This is the step a
    * production dedup pipeline runs after pair finding: pairs → clusters →
    * keep one per cluster.
    *
    * Algorithm: min-label propagation to fixpoint. The fixpoint (every node
    * labeled with its component's min id) is unique and independent of
    * iteration order/count, so the Spark loop (driver-bounded, converges in
    * O(log diameter) rounds over an equi-join per round) and DuckDB's
    * recursive CTE provably agree — no floating point, no tie-breaks.
    * Each round shuffles O(edges); at 100 TB this is the standard
    * large-graph CC shape (alternating small-star/large-star would halve
    * rounds; plain propagation keeps the oracle trivially equivalent).
    */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame =
    ccMemo.computeIfAbsent((spark, sfDir), _ => computeDedupClusters(spark, sfDir))

  /** q57 and q63 both consume the component labels; the loop's rounds are
    * materialized via localCheckpoint anyway, so one computation per
    * (session, input) feeds both gate queries instead of running the whole
    * pairs → CC stack twice (it was ~19 s of a 64 s bench). Plain strong
    * memo ON PURPOSE: a weak-keyed map would be a no-op here because the
    * cached DataFrame strongly references its own SparkSession (value pins
    * key — the classic WeakHashMap pitfall), so lifecycle is explicit
    * instead: entries live until [[invalidateDedupCache]] or process end,
    * which matches the gate harness (one long-lived session, immutable
    * input dirs). computeIfAbsent locks per key — computations for
    * different (session, input) pairs proceed concurrently.
    */
  private val ccMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Drop a session's memoized labels — required after rewriting an input
    * directory in place, and frees the entries of a stopped session.
    */
  def invalidateDedupCache(spark: SparkSession): Unit =
    ccMemo.keySet.removeIf(_._1 eq spark)

  private def computeDedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Dedup.simhashPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    // undirected edges, both directions. localCheckpoint (eager) rather than
    // cache: each loop round references the previous labels TWICE (hop +
    // pointer-doubling self-join), so with plain caching the logical plan
    // TRIPLES per round — analysis/codegen/task-serialization grew
    // exponentially (iter 4 took 30 s on a cached 10k-row table). Lineage
    // truncation keeps every round's plan constant-size. The local-vs-
    // reliable trade (executor-loss recovery vs speed) is the
    // graft.checkpoint.mode seam inside lineageCheckpoint — set it to
    // `reliable` on unreliable fleets; no call site hardcodes the choice.
    // checkpoint the DOUBLED edge list, not the pairs: edges are referenced
    // by every loop round, and a lazy union over a pairs-checkpoint would
    // re-execute per round (measured +20% on the whole query)
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")
      .lineageCheckpoint()
    val nodes = edges.select(col("src").as("doc")).distinct()
    var labels = nodes.withColumn("label", col("doc")).lineageCheckpoint()
    // labels only ever decrease, so Σlabel strictly decreases until the
    // fixpoint — a one-agg convergence probe instead of a change-count join
    // sum() of an empty frame is NULL — an edge-free corpus (no near-dup
    // pairs) must yield an empty result, not an NPE. The probe sums as
    // decimal(38,0): a BIGINT Σlabel would overflow (and break the
    // strict-decrease termination test) once ids × rows pass 2^63.
    def labelSum(df: DataFrame): BigDecimal = {
      val r = df.agg(
        org.apache.spark.sql.functions.sum(col("label").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) BigDecimal(0) else BigDecimal(r.getDecimal(0))
    }
    var prevSum: BigDecimal = null
    var sum = labelSum(labels)
    // pointer doubling converges in O(log diameter); the cap is a backstop
    // against pathological data, not a tuning knob (2^60 ≫ any real graph)
    var rounds = 0
    while ((prevSum == null || sum < prevSum) && sum > 0 && rounds < 60) {
      rounds += 1
      // (1) one-hop neighbor min
      val viaNeighbors = edges.join(labels, edges("src") === labels("doc"))
        .groupBy(col("dst").as("doc2"))
        .agg(min(col("label")).as("n_label"))
      val hop = labels.join(viaNeighbors, col("doc") === col("doc2"), "left")
        .select(col("doc"),
          least(col("label"), coalesce(col("n_label"), col("label"))).as("label"))
      // (2) pointer doubling ×2: label ← label(label) applied twice — path
      // compression reaches 4-hop ancestors per round (O(log diameter)
      // rounds overall); labels are always node ids, so the self-joins hit.
      // Fixpoint is unchanged (still the component min); a second cheap
      // self-join per round halves the number of convergence probes.
      def pointerDouble(df: DataFrame): DataFrame = {
        val byDoc = df.select(col("doc").as("l_doc"), col("label").as("l_label"))
        df.join(byDoc, col("label") === col("l_doc"), "left")
          .select(col("doc"), coalesce(col("l_label"), col("label")).as("label"))
      }
      val next = pointerDouble(pointerDouble(hop)).lineageCheckpoint()
      prevSum = sum
      sum = labelSum(next)
      labels = next
    }
    labels.select(col("doc").as("doc_id"), col("label").as("component"))
  }

  val dedupClustersSql: String =
    s"""WITH pairs AS (${Dedup.simhashPairsSql.replace("\n", "\n  ")}),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS doc FROM edges),
       |reach AS (
       |  WITH RECURSIVE r(doc, label) AS (
       |    SELECT doc, doc FROM nodes
       |    UNION
       |    SELECT e.dst, r.label FROM r JOIN edges e ON e.src = r.doc)
       |  SELECT * FROM r)
       |SELECT doc AS doc_id, min(label) AS component
       |FROM reach GROUP BY 1""".stripMargin

  // ------------------------------------------------ q63 corpus keep-list

  /** q63: the end product of the dedup stack — one row per document with its
    * keep/drop decision and representative: pairs (q24) → components (q57)
    * → keep = "I am my component's min id" (docs in no dup cluster keep
    * themselves). This is the table a 100 TB training-data pipeline joins
    * against its corpus to materialize the deduplicated training set; the
    * join back to `documents` is on doc_id, so the heavy text/payload
    * columns never enter the dedup computation.
    */
  def dedupKeepList(spark: SparkSession, sfDir: String): DataFrame = {
    val cc = dedupClusters(spark, sfDir)
      .select(col("doc_id"), col("component"))
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("representative"),
        coalesce(col("component") === col("doc_id"), lit(true)).as("keep"))
  }

  val dedupKeepListSql: String =
    s"""WITH cc AS (${dedupClustersSql.replace("\n", "\n  ")})
       |SELECT d.doc_id,
       |       coalesce(cc.component, d.doc_id) AS representative,
       |       coalesce(cc.component = d.doc_id, true) AS keep
       |FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id""".stripMargin

  // ---------------------------------------------- q253 duplication flow

  /** q253: cross-source duplication flow — for every DROPPED document
    * (q63's keep-list), one row per (its source → its representative's
    * source) edge with the count: the "who copies whom" matrix. The
    * source-level triage behind a dedup report: a heavy
    * `source → same source` diagonal is internal templating (fix the
    * extractor), heavy off-diagonal mass means one source mirrors another
    * (drop or down-weight the mirror, cf. q136/q232's overlap estimates —
    * this is the EXACT assignment those sketches approximate, restricted
    * to the elected keepers). `within` flags the diagonal for direct
    * filtering.
    *
    * Scale shape: composes the MEMOIZED q57 components (CC runs once per
    * session); adds two id-keyed joins to the doc→source dimension and a
    * hash agg to ≤ |sources|² rows. No new exchange class; the text never
    * moves.
    *
    * Parity: exact integer counts on exact cluster labels (q57/q63's own
    * hash-matches prove the labels); no floats anywhere.
    */
  def dupFlow(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    dedupKeepList(spark, sfDir).filter(!col("keep"))
      .select(col("doc_id"), col("representative"))
      .join(src, "doc_id")
      .join(src.select(col("doc_id").as("representative"),
        col("source").as("rep_source")), "representative")
      .groupBy(col("source"), col("rep_source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("rep_source"), col("n_docs"),
        (col("source") === col("rep_source")).cast("int").as("within"))
  }

  val dupFlowSql: String =
    s"""WITH kl AS (${dedupKeepListSql.replace("\n", "\n  ")})
       |SELECT a.source, b.source AS rep_source, count(*)::BIGINT AS n_docs,
       |       (a.source = b.source)::INT AS within
       |FROM kl
       |JOIN documents a ON kl.doc_id = a.doc_id
       |JOIN documents b ON kl.representative = b.doc_id
       |WHERE NOT kl.keep
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------- q256 cluster-size tail fit

  /** q256: power-law fit of the near-dup cluster-size distribution — the
    * size histogram of q57's components (size ≥ 2) with a log-log OLS of
    * count-on-size (the q184/q237 discipline) plus the tail facts a dedup
    * report leads with: how many docs sit in clusters, the largest
    * cluster, and the share of duplicated mass it carries. Duplication is
    * heavy-tailed in every web corpus (Lee et al. 2022 §3); the fitted
    * exponent says HOW heavy — a flat slope means dedup savings
    * concentrate in a few mega-clusters (cut those first, cf. q253's flow
    * matrix for WHO they are), a steep one means the long tail dominates
    * and pair-level dedup is the only lever.
    *
    * Scale shape: composes the MEMOIZED q57 components; adds one size
    * hash agg, one (size → count) hash agg (bounded by distinct sizes ≪
    * corpus), and the zipf-style in-array OLS over that bounded frame.
    *
    * Parity: sizes/counts exact integers; ln terms evaluated inside an
    * index-ORDERED array fold on both engines (the q184 contract); the
    * degenerate single-point fit (denominator exactly 0) pins slope and
    * intercept to 0.0 on both engines.
    */
  def clusterPowerlaw(spark: SparkSession, sfDir: String): DataFrame = {
    val sizes = dedupClusters(spark, sfDir)
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
    val sc = sizes.filter(col("sz") >= 2)
      .groupBy(col("sz")).agg(count(lit(1)).as("n"))
    val tail = sizes.filter(col("sz") >= 2)
      .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_dup_docs"),
        max(col("sz")).as("max_size"))
    def fsum(term: Column): Column =
      aggregate(term, lit(0.0), (acc, e) => acc + e)
    val pts = sc.agg(sort_array(collect_list(struct(col("sz"), col("n"))))
      .as("ps"))
      .select(size(col("ps")).cast("long").as("k"),
        transform(col("ps"), p => log(p.getField("sz").cast("double"))).as("xs"),
        transform(col("ps"), p => log(p.getField("n").cast("double"))).as("ys"),
        transform(col("ps"), p => log(p.getField("sz").cast("double")) *
          log(p.getField("n").cast("double"))).as("xys"),
        transform(col("ps"), p => log(p.getField("sz").cast("double")) *
          log(p.getField("sz").cast("double"))).as("xxs"))
    val kD = col("k").cast("double")
    val den = kD * fsum(col("xxs")) - fsum(col("xs")) * fsum(col("xs"))
    val slope = (kD * fsum(col("xys")) - fsum(col("xs")) * fsum(col("ys"))) / den
    val intercept = (fsum(col("ys")) - slope * fsum(col("xs"))) / kD
    pts.crossJoin(broadcast(tail))
      .select(col("n_clusters"), col("n_dup_docs"), col("max_size"),
        col("k").cast("int").as("n_sizes"),
        r4(col("max_size").cast("double") / col("n_dup_docs").cast("double"))
          .as("top_share"),
        r4(when(den === 0.0, 0.0).otherwise(slope)).as("slope"),
        r4(when(den === 0.0, 0.0).otherwise(intercept)).as("intercept"))
  }

  val clusterPowerlawSql: String = {
    def fsum(xs: String) = s"list_sum($xs)"
    val den = s"(k::DOUBLE * ${fsum("xxs")} - ${fsum("xs")} * ${fsum("xs")})"
    val slope =
      s"(k::DOUBLE * ${fsum("xys")} - ${fsum("xs")} * ${fsum("ys")}) / $den"
    s"""WITH cc AS (${dedupClustersSql.replace("\n", "\n  ")}),
       |sizes AS (SELECT component, count(*)::BIGINT AS sz
       |          FROM cc GROUP BY 1 HAVING count(*) >= 2),
       |tail AS (SELECT count(*)::BIGINT AS n_clusters,
       |                sum(sz)::BIGINT AS n_dup_docs,
       |                max(sz)::BIGINT AS max_size
       |         FROM sizes),
       |scnt AS (SELECT sz, count(*)::BIGINT AS n FROM sizes GROUP BY 1),
       |pts AS (
       |  SELECT len(ps)::BIGINT AS k,
       |         list_transform(ps, p -> ln(p.sz::DOUBLE)) AS xs,
       |         list_transform(ps, p -> ln(p.n::DOUBLE)) AS ys,
       |         list_transform(ps, p -> ln(p.sz::DOUBLE) * ln(p.n::DOUBLE)) AS xys,
       |         list_transform(ps, p -> ln(p.sz::DOUBLE) * ln(p.sz::DOUBLE)) AS xxs
       |  FROM (SELECT list({'sz': sz, 'n': n} ORDER BY sz, n) AS ps FROM scnt))
       |SELECT t.n_clusters, t.n_dup_docs, t.max_size, p.k::INT AS n_sizes,
       |       ${r4Sql("t.max_size::DOUBLE / t.n_dup_docs::DOUBLE")} AS top_share,
       |       ${r4Sql(s"CASE WHEN $den = 0.0 THEN 0.0 ELSE $slope END")} AS slope,
       |       ${r4Sql(
          s"CASE WHEN $den = 0.0 THEN 0.0 ELSE (${fsum("ys")} - ($slope) * ${fsum("xs")}) / k::DOUBLE END")}
       |         AS intercept
       |FROM pts p CROSS JOIN tail t""".stripMargin
  }

  // --------------------------------------------- q277 cluster-label purity

  /** q277: cluster–label purity — for each q49 k-means cluster, its
    * majority embedding label and the purity (majority share), plus the
    * label entropy on the q247 integer grid. The supervised complement of
    * q248's geometric silhouette: silhouette says the clusters are
    * SHAPED well, purity says they MEAN something (a cluster whose
    * members share a label is safe to treat as a unit in q115/q186's
    * cluster-keyed decisions; purity ≈ label prior means the clustering
    * is ignoring the signal). Output: one row per realized cluster.
    *
    * Scale shape: q49's assignment pass + ONE (cluster × label) grid hash
    * agg (bounded by K·|labels|) and a K-row rollup.
    *
    * Parity: the majority is an exact-integer argmax with smaller-label
    * ties; purity an exact ratio r4'd; entropy integer-scaled ln cells
    * (q247 discipline).
    */
  def clusterPurity(spark: SparkSession, sfDir: String): DataFrame = {
    val sc = TopicEntropyScale
    val cells = kmeansAssign(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir).select(col("vec_id"), col("label")),
        "vec_id")
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n"))
    cells
      .select(col("cluster"), col("label"), col("n"),
        (col("n") * floor(log(col("n").cast("double")) * sc + 0.5)
          .cast("long")).as("ti"))
      .groupBy(col("cluster"))
      .agg(sum(col("n")).as("n"),
        max(struct(col("n"), (-col("label")).cast("long").as("nl"))).as("m"),
        count(lit(1)).cast("int").as("n_labels"),
        sum(col("ti")).as("sti"))
      .select(col("cluster"), col("n"), col("n_labels"),
        (-col("m.nl")).cast("int").as("top_label"),
        r4(col("m.n").cast("double") / col("n").cast("double")).as("purity"),
        r4(log(col("n").cast("double")) -
          col("sti").cast("double") / (col("n").cast("double") * sc))
          .as("label_entropy"))
  }

  val clusterPuritySql: String = {
    val sc = TopicEntropyScale
    s"""WITH a AS (${kmeansAssignSql.replace("\n", "\n  ")}),
       |cells AS (
       |  SELECT a.cluster, e.label, count(*)::BIGINT AS n
       |  FROM a JOIN embeddings e ON a.vec_id = e.vec_id
       |  GROUP BY 1, 2),
       |g AS (
       |  SELECT cluster, sum(n)::BIGINT AS n,
       |         count(*)::INT AS n_labels,
       |         sum(n * floor(ln(n::DOUBLE) * $sc + 0.5)::BIGINT)::BIGINT AS sti
       |  FROM cells GROUP BY 1),
       |top AS (
       |  SELECT cluster, label AS top_label, n AS top_n FROM (
       |    SELECT cluster, label, n,
       |           row_number() OVER (PARTITION BY cluster
       |                              ORDER BY n DESC, label ASC) AS rn
       |    FROM cells) WHERE rn = 1)
       |SELECT g.cluster, g.n, g.n_labels, t.top_label::INT AS top_label,
       |       ${r4Sql("t.top_n::DOUBLE / g.n::DOUBLE")} AS purity,
       |       ${r4Sql(
          s"ln(g.n::DOUBLE) - g.sti::DOUBLE / (g.n::DOUBLE * $sc)")}
       |         AS label_entropy
       |FROM g JOIN top t ON g.cluster = t.cluster""".stripMargin
  }

  // ------------------------------------------- q264 dedup quality uplift

  /** q264: dedup quality-uplift audit — per source, the mean q17 quality
    * BEFORE and AFTER applying the q63 near-dup keep-list, with the
    * delta. The before/after number a dedup report leads with: dedup is
    * usually sold on token savings (q149/q252), but its quality effect
    * per source is what decides whether the dropped mass was boilerplate
    * (delta > 0: the dups were low-quality templating) or real content
    * duplicated across mirrors (delta ≈ 0) — read next to q253's flow
    * matrix, which says where the dropped mass went.
    *
    * Scale shape: the MEMOIZED q57 components + ONE quality kernel scan
    * joined to the keep-list on doc_id → a |sources|-row hash agg; the
    * text never moves twice.
    *
    * Parity: quality is r4-grid (its 1e4 quantization is an exact
    * integer), so all four sums are EXACT integers; the means/delta are
    * r4'd divisions with the empty-survivor corner pinned to 0.0 on both
    * engines.
    */
  def dedupQualityUplift(spark: SparkSession, sfDir: String): DataFrame = {
    val q = TextOps.qualityScore(spark, sfDir).select(col("doc_id"),
      floor(col("quality") * 10000.0 + 0.5).cast("long").as("qi"))
    val cells = q
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("source")),
        "doc_id")
      .join(dedupKeepList(spark, sfDir).select(col("doc_id"), col("keep")),
        "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_before"),
        sum(col("keep").cast("long")).as("n_after"),
        sum(col("qi")).as("sqb"),
        sum(when(col("keep"), col("qi")).otherwise(0L)).as("sqa"))
    val mb = col("sqb").cast("double") / (col("n_before").cast("double") * 10000.0)
    val ma = when(col("n_after") === 0L, 0.0)
      .otherwise(col("sqa").cast("double") / (col("n_after").cast("double") * 10000.0))
    cells.select(col("source"), col("n_before"), col("n_after"),
      r4(mb).as("mean_before"), r4(ma).as("mean_after"),
      r4(ma - mb).as("delta"))
  }

  val dedupQualityUpliftSql: String =
    s"""WITH kl AS (${dedupKeepListSql.replace("\n", "\n  ")}),
       |q AS (SELECT doc_id,
       |             floor((${TextOps.qualitySqlExpr}) * 10000.0 + 0.5)::BIGINT AS qi
       |      FROM documents),
       |cells AS (
       |  SELECT d.source, count(*)::BIGINT AS n_before,
       |         sum(kl.keep::INT)::BIGINT AS n_after,
       |         sum(q.qi)::BIGINT AS sqb,
       |         sum(CASE WHEN kl.keep THEN q.qi ELSE 0 END)::BIGINT AS sqa
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id
       |         JOIN kl ON q.doc_id = kl.doc_id
       |  GROUP BY 1)
       |SELECT source, n_before, n_after,
       |       ${r4Sql("sqb::DOUBLE / (n_before::DOUBLE * 10000.0)")} AS mean_before,
       |       ${r4Sql(
          "CASE WHEN n_after = 0 THEN 0.0 ELSE sqa::DOUBLE / (n_after::DOUBLE * 10000.0) END")}
       |         AS mean_after,
       |       ${r4Sql(
          "(CASE WHEN n_after = 0 THEN 0.0 ELSE sqa::DOUBLE / (n_after::DOUBLE * 10000.0) END) - sqb::DOUBLE / (n_before::DOUBLE * 10000.0)")}
       |         AS delta
       |FROM cells""".stripMargin

  // ---------------------------------------------- q204 soft-dedup weights

  /** q204: soft deduplication — instead of q63's hard keep/drop, every
    * document gets training weight 1/|its duplicate cluster|, so each
    * near-dup cluster contributes exactly one document's worth of loss
    * mass while keeping all surface variants in the corpus (the
    * down-weight-don't-drop alternative the field reaches for when dup
    * clusters carry useful variation — SoftDedup-style reweighting). Rows
    * carry the representative, cluster size, token count, the weight, and
    * the effective (weighted) token contribution; Σ eff_tokens over a
    * cluster ≈ the cluster's mean doc length — the dedup token budget
    * without discarding anything.
    *
    * Scale shape: composes the MEMOIZED q57 components (the CC stack runs
    * once per session) with a size aggregation joined back on the
    * representative key and one narrow token count — all equi-joins on
    * ids, no new exchange class. The size table is NOT broadcast:
    * singletons are their own representative, so it has ~|documents| rows
    * (corpus-sized, not dimension-sized) — it stays a shuffle join keyed
    * on the same id the corpus would co-partition by. Parity:
    * sizes/counts exact integers; weight and eff_tokens are single r4'd
    * divisions.
    */
  def softDedupWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val rep = dedupKeepList(spark, sfDir)
      .select(col("doc_id"), col("representative"))
    val sizes = rep.groupBy(col("representative"))
      .agg(count(lit(1)).as("cluster_size"))
    val ntok = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(Portable.toks(col("text"))).cast("long").as("n_tok"))
    rep.join(sizes, "representative")
      .join(ntok, "doc_id")
      .select(col("doc_id"), col("representative"), col("cluster_size"),
        col("n_tok"),
        Portable.r4(lit(1.0) / col("cluster_size").cast("double")).as("weight"),
        Portable.r4(col("n_tok").cast("double") /
          col("cluster_size").cast("double")).as("eff_tokens"))
  }

  val softDedupWeightsSql: String =
    s"""WITH kl AS (${dedupKeepListSql.replace("\n", "\n  ")}),
       |sizes AS (SELECT representative, count(*) AS cluster_size
       |          FROM kl GROUP BY 1),
       |nt AS (SELECT doc_id, len(${Portable.toksSql})::BIGINT AS n_tok
       |       FROM documents)
       |SELECT kl.doc_id, kl.representative, s.cluster_size, nt.n_tok,
       |       ${Portable.r4Sql("1.0 / s.cluster_size::DOUBLE")} AS weight,
       |       ${Portable.r4Sql("nt.n_tok::DOUBLE / s.cluster_size::DOUBLE")}
       |         AS eff_tokens
       |FROM kl JOIN sizes s USING (representative)
       |JOIN nt USING (doc_id)""".stripMargin

  /** q132: quality-aware representative election — q63 keeps each dup
    * cluster's MIN-ID member (cheap, arbitrary); this re-elects the
    * highest-quality member (q17 kernel, ties to the lower id), which is
    * what a curation pipeline actually wants to keep from a duplicate
    * cluster. Composes the MEMOIZED q57 components (the stack runs once
    * per session/input) with one quality projection: singleton docs are
    * their own representative, so the output stays a partition of the
    * corpus into (kept representative, dropped member) rows.
    *
    * Scale shape: labels join is O(docs) equi-join; the election is one
    * argmax aggregation per component (max(struct) — the q06 kernel);
    * the winner table is |components| rows joined back on the component
    * key. No window, no sort of the corpus. Parity: quality is r4-rounded
    * before comparison; the (quality, −doc_id) struct order is identical
    * on both engines.
    */
  def bestRepKeepList(spark: SparkSession, sfDir: String): DataFrame = {
    val cc = dedupClusters(spark, sfDir).select(col("doc_id"), col("component"))
    val labeled = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.qualityCol(col("text")).as("quality"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality"),
        coalesce(col("component"), col("doc_id")).as("component"))
    val best = labeled.groupBy(col("component"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("neg"))).as("b"))
      .select(col("component"), (-col("b.neg")).as("representative"))
    labeled.join(best, "component")
      .select(col("doc_id"), col("quality"), col("representative"),
        (col("doc_id") === col("representative")).as("keep"))
  }

  val bestRepKeepListSql: String =
    s"""WITH cc AS (${dedupClustersSql.replace("\n", "\n  ")}),
       |lab AS (
       |  SELECT d.doc_id, ${TextOps.qualitySqlExpr} AS quality,
       |         coalesce(cc.component, d.doc_id) AS component
       |  FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id),
       |best AS (
       |  SELECT component,
       |         -struct_extract(max({'q': quality, 'neg': -doc_id}), 'neg')
       |           AS representative
       |  FROM lab GROUP BY 1)
       |SELECT lab.doc_id, lab.quality, best.representative,
       |       lab.doc_id = best.representative AS keep
       |FROM lab JOIN best USING (component)""".stripMargin

  // ------------------------------------------------ q69 snapshot diff (CDC)

  /** Generic snapshot diff — change-data-capture between two versions of a
    * keyed table: FULL OUTER join on the key (the one join shape the suite
    * didn't exercise yet), change classified as I(nsert)/D(elete)/U(pdate)
    * via null-ness and per-column null-safe inequality; unchanged rows are
    * dropped before anything downstream, so the output is O(churn), not
    * O(table). This is the table a lakehouse emits to feed incremental
    * consumers when storage has no native change feed.
    *
    * Scale shape: one equi-shuffle on the key (AQE picks the join
    * strategy); comparisons are narrow column expressions; no driver state.
    */
  def snapshotDiff(old: DataFrame, neu: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val o = old.select((key +: compareCols).map(c => col(c).as(s"o_$c")): _*)
    val n = neu.select((key +: compareCols).map(c => col(c).as(s"n_$c")): _*)
    val joined = o.join(n, col(s"o_$key") === col(s"n_$key"), "full_outer")
    val changed = compareCols
      .map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change",
        when(col(s"o_$key").isNull, lit("I"))
          .when(col(s"n_$key").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("change").isNotNull)
      .select(
        coalesce(col(s"o_$key"), col(s"n_$key")).as(key) +:
          col("change") +:
          compareCols.flatMap(c => Seq(col(s"o_$c").as(s"old_$c"), col(s"n_$c").as(s"new_$c"))): _*)
  }

  /** q69: snapshot diff over `orders` — the "new" snapshot drops every 13th
    * order, bumps every 7th's price, and inserts a row per 500th key (same
    * synthetic-churn constants inlined into the oracle SQL), so all three
    * change types appear.
    */
  def snapshotDiffOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val neu = o.filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, r2(col("o_totalprice") * 1.1))
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      .unionByName(
        o.filter(col("o_orderkey") % 500 === 0)
          .select((-col("o_orderkey") - 1L).as("o_orderkey"),
            lit(42.0).as("o_totalprice")))
    snapshotDiff(o.select("o_orderkey", "o_totalprice"), neu,
      "o_orderkey", Seq("o_totalprice"))
  }

  val snapshotDiffOrdersSql: String =
    s"""WITH neu AS (
       |  SELECT o_orderkey,
       |         CASE WHEN o_orderkey % 7 = 0 THEN ${r2Sql("o_totalprice * 1.1")}
       |              ELSE o_totalprice END AS o_totalprice
       |  FROM orders WHERE o_orderkey % 13 <> 0
       |  UNION ALL
       |  SELECT -o_orderkey - 1, 42.0 FROM orders WHERE o_orderkey % 500 = 0),
       |j AS (
       |  SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
       |         o.o_totalprice AS op, n.o_totalprice AS np
       |  FROM orders o FULL OUTER JOIN neu n ON o.o_orderkey = n.o_orderkey)
       |SELECT coalesce(ok, nk) AS o_orderkey,
       |       CASE WHEN ok IS NULL THEN 'I'
       |            WHEN nk IS NULL THEN 'D'
       |            ELSE 'U' END AS change,
       |       op AS old_o_totalprice, np AS new_o_totalprice
       |FROM j
       |WHERE ok IS NULL OR nk IS NULL OR op IS DISTINCT FROM np""".stripMargin

  // ------------------------------------- q74 incremental view maintenance

  /** q74: incremental aggregate maintenance — apply a change feed (the q69
    * snapshot-diff shape, here carrying the group column) to a previously
    * computed aggregate and land EXACTLY on what a full recompute over the
    * new snapshot produces. Every change row contributes a retraction to
    * its old group and an addition to its new group (an update within one
    * group nets the count to zero and the sum to the delta), so the
    * maintenance cost is O(churn) against O(table) for the recompute — the
    * core economics of materialized views at 100 TB.
    *
    * Exactness, not approximation: prices are summed as DECIMAL(18,2) on
    * both engines, so incremental arithmetic and full recomputation agree
    * bit-for-bit and the oracle needs no rounding tolerance at all (a
    * double sum would differ by summation order and flip cent boundaries).
    * The final total is cast to DOUBLE only after the exact sum.
    */
  def incrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val old = o.select(col("o_orderkey"), col("o_orderpriority"),
      col("o_totalprice").cast("decimal(18,2)").as("p"))
    val oldAgg = old.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("s"))
    // same synthetic churn as q69; inserts carry their own group
    val neu = o.filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        when(col("o_orderkey") % 7 === 0, r2(col("o_totalprice") * 1.1))
          .otherwise(col("o_totalprice")).cast("decimal(18,2)").as("p"))
      .unionByName(
        o.filter(col("o_orderkey") % 500 === 0)
          .select((-col("o_orderkey") - 1L).as("o_orderkey"),
            lit("0-INSERTED").as("o_orderpriority"),
            lit(42.0).cast("decimal(18,2)").as("p")))
    val diff = snapshotDiff(old, neu, "o_orderkey", Seq("o_orderpriority", "p"))
    // contribution validity comes from the CHANGE TYPE, not from the group
    // value being non-null: a g.isNotNull filter would silently drop
    // retractions/additions for rows whose group column is genuinely NULL
    // (the oracle's GROUP BY keeps a NULL group)
    val contrib = diff.select(explode(array(
        struct((col("change") =!= "I").as("ok"),
          col("old_o_orderpriority").as("g"), lit(-1L).as("dn"),
          (-col("old_p")).as("ds")),
        struct((col("change") =!= "D").as("ok"),
          col("new_o_orderpriority").as("g"), lit(1L).as("dn"),
          col("new_p").as("ds")))).as("c"))
      .filter(col("c.ok"))
      .select(col("c.g"), col("c.dn"), col("c.ds"))
    val delta = contrib.groupBy(col("g"))
      .agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
    // null-safe join key: a genuine NULL group must match its own delta row
    // (plain === would emit two disjoint NULL-group rows)
    oldAgg.join(delta, oldAgg("o_orderpriority") <=> delta("g"), "full_outer")
      .select(
        coalesce(col("o_orderpriority"), col("g")).as("o_orderpriority"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0).cast("decimal(28,2)")) +
          coalesce(col("ds"), lit(0).cast("decimal(28,2)")))
          .cast("double").as("total"))
      .filter(col("n") > 0)
  }

  /** Oracle = the FULL RECOMPUTE over the new snapshot — equality proves
    * the incremental path lands on the same table.
    */
  val incrementalAggSql: String =
    s"""WITH neu AS (
       |  SELECT o_orderkey, o_orderpriority,
       |         (CASE WHEN o_orderkey % 7 = 0 THEN ${r2Sql("o_totalprice * 1.1")}
       |               ELSE o_totalprice END)::DECIMAL(18,2) AS p
       |  FROM orders WHERE o_orderkey % 13 <> 0
       |  UNION ALL
       |  SELECT -o_orderkey - 1, '0-INSERTED', 42.0::DECIMAL(18,2)
       |  FROM orders WHERE o_orderkey % 500 = 0)
       |SELECT o_orderpriority, count(*) AS n, sum(p)::DOUBLE AS total
       |FROM neu GROUP BY 1""".stripMargin

  // ------------------------------------------------------- q56 sketches

  /** q56: approximate aggregates — the 100 TB path where exactness is
    * traded for one-pass mergeable sketches: approx_count_distinct
    * (HLL++, rsd 1%) and approx_percentile (KLL-style, accuracy 1000).
    * Sketch INTERNALS differ by engine, so the raw estimates can never
    * hash-match a DuckDB oracle; what IS deterministic — and what this
    * query outputs — is whether each estimate lands inside its
    * algorithm's published error bound around the exact value:
    *
    *  - `hll_ok`: |HLL estimate − exact NDV| ≤ 5%·exact (5σ of rsd 1%);
    *  - `median_ok`: the returned percentile value's true rank sits in
    *    the [0.5 − ε, 0.5 + ε] band with ε = 2/accuracy (2× the
    *    guaranteed 1/accuracy rank error, slack for boundary ties) —
    *    checked as count(< v) ≤ (0.5+ε)n AND count(≤ v) ≥ (0.5−ε)n,
    *    all integer cross-multiplications, no float division.
    *
    * The oracle asserts those booleans literally true next to the exact
    * NDV and row counts (which it recomputes), turning the r1–r8
    * rows-only gate row into a full rows+schema+hash pass while the
    * sketches stay in the measured path; SketchBoundsSpec keeps the
    * independent raw-estimate assertion. The rank-check pass broadcasts
    * the 3-row sketch frame back over the scan — one extra map-side
    * stage, no added shuffle of fact data.
    */
  /** q56 sketch-bound constants — the agg calls and the boolean bound
    * expressions below derive from THESE so a tuning change cannot
    * silently desync the gate (the 498/502/20 literals were coupled
    * copies before). All bound arithmetic stays integer.
    */
  /** approx_percentile accuracy: guaranteed rank error 1/accuracy. */
  final val SketchPctlAccuracy = 1000
  /** rank-band ε numerator: ε = SketchEpsNum/SketchPctlAccuracy — 2× the
    * guaranteed rank error, slack for boundary ties. */
  final val SketchEpsNum = 2
  private val pctlLoBand = SketchPctlAccuracy / 2 - SketchEpsNum
  private val pctlHiBand = SketchPctlAccuracy / 2 + SketchEpsNum
  /** HLL++ relative standard deviation, in percent (agg takes /100.0). */
  final val SketchHllRsdPct = 1
  /** hll_ok tolerance in σ: |est − exact|·100 ≤ σ·rsdPct·exact. HLL++'s
    * rsd is probabilistic, not a hard bound — 5σ makes a spurious gate
    * failure on a healthy sketch astronomically unlikely at any scale. */
  final val SketchHllSigma = 5

  def sketches(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
    val sk = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), SketchHllRsdPct / 100.0)
          .as("hll_orders"),
        approx_percentile(col("l_extendedprice"), lit(0.5),
          lit(SketchPctlAccuracy)).as("apx_median"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
        count(lit(1)).as("n"))
    val ranked = li.join(broadcast(sk), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_extendedprice") <= col("apx_median"), 1L)
          .otherwise(0L)).as("rank_le"),
        sum(when(col("l_extendedprice") < col("apx_median"), 1L)
          .otherwise(0L)).as("rank_lt"))
    exact.join(sk, "l_returnflag").join(ranked, "l_returnflag")
      .select(col("l_returnflag"), col("exact_orders"), col("n"),
        (abs(col("hll_orders") - col("exact_orders")) * 100 <=
          col("exact_orders") * (SketchHllSigma * SketchHllRsdPct))
          .as("hll_ok"),
        (col("rank_le") * SketchPctlAccuracy >= col("n") * pctlLoBand &&
          col("rank_lt") * SketchPctlAccuracy <= col("n") * pctlHiBand)
          .as("median_ok"))
  }

  val sketchesSql: String =
    """SELECT l_returnflag,
      |       count(DISTINCT l_orderkey) AS exact_orders,
      |       count(*) AS n,
      |       true AS hll_ok,
      |       true AS median_ok
      |FROM lineitem GROUP BY 1""".stripMargin
  // ---------------------------------------------- q247 topic diversity

  /** Fixed-point scale of the entropy terms (the q109/q131 regime).
    * `final` so the literal constant-inlines: q277's SQL twin is declared
    * EARLIER in this object and would otherwise bake the uninitialized 0.
    */
  final val TopicEntropyScale = 1000000000L

  /** q247: topic-diversity audit — per source, the EFFECTIVE number of
    * topics it contributes: exp of the Shannon entropy of its q49
    * k-means cluster shares (the "effective number of species" of
    * ecology, a.k.a. perplexity of the topic distribution). The mixture
    * diagnostic the source-weighting family (q84/q133/q228) reads next
    * to volume: a source with a million documents but eff_clusters ≈ 1
    * is topically redundant — its DoReMi/temperature boost buys
    * repetition, not coverage — while a small source with eff_clusters
    * near K earns its mixture slot.
    *
    * Scale shape: q49's assignment pass dominates (broadcast centroids,
    * one scan per Lloyd round); this adds one (source × cluster) grid
    * aggregation and a |sources|-row rollup. Parity: the entropy sums
    * integer-scaled ln terms (floor(ln(n)·scale + 0.5) per cell — never
    * an unordered float sum, the q109 discipline); ln(n_s) and the final
    * exp are per-row scalars whose 1-ulp libm skew sits far inside r4.
    */
  def topicDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = kmeansAssign(spark, sfDir)
    val src = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
    val cells = assigned
      .join(src, assigned("vec_id") === src("doc_id"))
      .groupBy(col("source"), col("cluster"))
      .agg(count(lit(1)).as("n"))
    cells
      .select(col("source"), col("n"),
        (col("n") * floor(log(col("n").cast("double")) *
          TopicEntropyScale + 0.5).cast("long")).as("ti"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).cast("int").as("n_clusters"),
        sum(col("ti")).as("sti"))
      .select(col("source"), col("n_docs"), col("n_clusters"),
        r4(log(col("n_docs").cast("double")) -
          col("sti").cast("double") /
            (col("n_docs").cast("double") * TopicEntropyScale))
          .as("entropy"),
        r4(exp(log(col("n_docs").cast("double")) -
          col("sti").cast("double") /
            (col("n_docs").cast("double") * TopicEntropyScale)))
          .as("eff_clusters"))
  }

  val topicDiversitySql: String =
    s"""WITH a AS (${kmeansAssignSql.replace("\n", "\n  ")}),
       |cells AS (
       |  SELECT d.source, a.cluster, count(*)::BIGINT AS n
       |  FROM a JOIN documents d ON a.vec_id = d.doc_id
       |  GROUP BY 1, 2),
       |g AS (
       |  SELECT source, sum(n)::BIGINT AS n_docs,
       |         count(*)::INT AS n_clusters,
       |         sum(n * floor(ln(n::DOUBLE) * $TopicEntropyScale + 0.5)::BIGINT)::BIGINT
       |           AS sti
       |  FROM cells GROUP BY 1)
       |SELECT source, n_docs, n_clusters,
       |       ${r4Sql(
          s"ln(n_docs::DOUBLE) - sti::DOUBLE / (n_docs::DOUBLE * $TopicEntropyScale)")}
       |         AS entropy,
       |       ${r4Sql(
          s"exp(ln(n_docs::DOUBLE) - sti::DOUBLE / (n_docs::DOUBLE * $TopicEntropyScale))")}
       |         AS eff_clusters
       |FROM g""".stripMargin

  // ---------------------------------------------- q248 cluster silhouette

  /** Fixed-point scale for per-vector silhouette/distance terms before the
    * unordered per-cluster sum (the q109/q247 integer-sum discipline).
    */
  val SilhouetteScale = 1000000000L

  /** q248: simplified-silhouette audit of the q49 clustering (Hruschka et
    * al.'s centroid silhouette — a(i) = distance to OWN centroid, b(i) =
    * distance to the nearest OTHER centroid, s = (b−a)/max(a,b)) — the
    * standard "are these clusters real structure or arbitrary cuts"
    * diagnostic read before any cluster-keyed curation decision (q115's
    * semantic dedup, q186's leakage-free splits, q247's diversity shares
    * all key on these labels). Centroids are recomputed post-hoc from the
    * FINAL assignments (one more r4'd-mean update — the same derivation
    * text on both engines), so a point reassigned-too-late can score
    * negative: per-cluster mean silhouette near 0 or below flags a
    * cluster the downstream ops should not treat as a unit. Output: one
    * row per realized cluster — size, mean own-centroid distance, mean
    * nearest-other distance, mean silhouette.
    *
    * Scale shape: identical to q49's assignment pass (the centroid frame
    * is K rows, BROADCAST; the corpus is touched by one narrow scan) plus
    * one K-row hash agg; full pairwise silhouette would be corpus², which
    * is exactly why the simplified form is the one production runs.
    *
    * Parity: d² via index-ordered dots (bit-equal), floored at 0 before
    * sqrt on both engines; per-vector a/b/s quantized to the
    * [[SilhouetteScale]] grid so the per-cluster sums are exact integers;
    * the b-less corner (a single realized cluster) pins s to 0 on both
    * engines.
    */
  def silhouette(spark: SparkSession, sfDir: String): DataFrame = {
    val dot = (a: Column, b: Column) => graft.functions.chess.vecDot(a, b)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val av = kmeansAssign(spark, sfDir).join(e, "vec_id")
    val cent = av
      .select(col("cluster"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos")).agg(r4(avg(col("v"))).as("m"))
      .groupBy(col("cluster"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col("cluster").as("c_id"),
        transform(col("ps"), p => p.getField("m")).as("cv"))
    val grid = av.join(broadcast(cent), lit(true))
      .select(col("vec_id"), col("cluster"), col("c_id"),
        greatest(dot(col("emb"), col("emb")) -
          lit(2.0) * dot(col("emb"), col("cv")) +
          dot(col("cv"), col("cv")), lit(0.0)).as("d2"))
    val per = grid.groupBy(col("vec_id"), col("cluster"))
      .agg(sqrt(max(when(col("c_id") === col("cluster"), col("d2")))).as("a"),
        sqrt(min(when(col("c_id") =!= col("cluster"), col("d2")))).as("b0"))
      .select(col("cluster"), col("a"), coalesce(col("b0"), col("a")).as("b"))
    val s = when(greatest(col("a"), col("b")) > 0.0,
      (col("b") - col("a")) / greatest(col("a"), col("b"))).otherwise(0.0)
    val sc = SilhouetteScale
    per
      .select(col("cluster"),
        floor(col("a") * sc + 0.5).cast("long").as("ai"),
        floor(col("b") * sc + 0.5).cast("long").as("bi"),
        floor(s * sc + 0.5).cast("long").as("si"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("ai")).as("sa"),
        sum(col("bi")).as("sb"), sum(col("si")).as("ss"))
      .select(col("cluster"), col("n"),
        r4(col("sa").cast("double") / (col("n") * sc).cast("double")).as("mean_a"),
        r4(col("sb").cast("double") / (col("n") * sc).cast("double")).as("mean_b"),
        r4(col("ss").cast("double") / (col("n") * sc).cast("double")).as("mean_sil"))
  }

  val silhouetteSql: String = {
    val dim = Similarity.Dim
    val d2 = (e: String, c: String) =>
      s"""greatest(
         |  list_sum(list_transform(range(1, ${dim + 1}), i -> $e[i]::DOUBLE * $e[i]::DOUBLE))
         |  - 2.0 * list_sum(list_transform(range(1, ${dim + 1}), i -> $e[i]::DOUBLE * $c[i]::DOUBLE))
         |  + list_sum(list_transform(range(1, ${dim + 1}), i -> $c[i]::DOUBLE * $c[i]::DOUBLE)),
         |  0.0)""".stripMargin
    val sc = SilhouetteScale
    s"""WITH a0 AS (${kmeansAssignSql.replace("\n", "\n  ")}),
       |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
       |      FROM embeddings),
       |av AS (SELECT a0.vec_id, a0.cluster, e.emb
       |       FROM a0 JOIN e ON a0.vec_id = e.vec_id),
       |cents AS (
       |  SELECT cluster AS c_id, list(m ORDER BY pos) AS cv FROM (
       |    SELECT cluster, i AS pos, ${r4Sql("avg(emb[i])")} AS m
       |    FROM av, range(1, ${dim + 1}) r(i) GROUP BY 1, 2)
       |  GROUP BY 1),
       |grid AS (
       |  SELECT av.vec_id, av.cluster, c.c_id,
       |         ${d2("av.emb", "c.cv").replace("\n", "\n         ")} AS d2
       |  FROM av CROSS JOIN cents c),
       |per0 AS (
       |  SELECT vec_id, cluster,
       |         sqrt(max(CASE WHEN c_id = cluster THEN d2 END)) AS a,
       |         sqrt(min(CASE WHEN c_id <> cluster THEN d2 END)) AS b0
       |  FROM grid GROUP BY 1, 2),
       |per AS (SELECT cluster, a, coalesce(b0, a) AS b FROM per0),
       |q AS (
       |  SELECT cluster,
       |         floor(a * $sc + 0.5)::BIGINT AS ai,
       |         floor(b * $sc + 0.5)::BIGINT AS bi,
       |         floor((CASE WHEN greatest(a, b) > 0.0
       |                     THEN (b - a) / greatest(a, b) ELSE 0.0 END)
       |               * $sc + 0.5)::BIGINT AS si
       |  FROM per)
       |SELECT cluster, count(*)::BIGINT AS n,
       |       ${r4Sql(s"sum(ai)::DOUBLE / (count(*) * $sc)::DOUBLE")} AS mean_a,
       |       ${r4Sql(s"sum(bi)::DOUBLE / (count(*) * $sc)::DOUBLE")} AS mean_b,
       |       ${r4Sql(s"sum(si)::DOUBLE / (count(*) * $sc)::DOUBLE")} AS mean_sil
       |FROM q GROUP BY 1""".stripMargin
  }
}
