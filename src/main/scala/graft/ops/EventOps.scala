package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-stream analytics over the `events` table (event_id, ts ns-epoch,
  * user_id, event_type, value, props).
  *
  * `ts` is parquet TIMESTAMP(NANOS); we keep it as int64 nanos end-to-end
  * (see [[graft.Tables.NanosFlag]]) so window arithmetic is exact integer
  * math — bit-identical on any engine, no timezone/unit traps. The streaming
  * equivalents of these (true incremental windows + watermarks) live in
  * [[graft.streaming.StreamingOps]].
  */
object EventOps {

  val HourNs: Long = 3600L * 1000 * 1000 * 1000
  val SessionGapNs: Long = 30L * 60 * 1000 * 1000 * 1000 // 30 min

  /** q28: tumbling hourly window aggregation — one shuffle on
    * (window, event_type), map-side partial aggs.
    */
  def tumblingWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        (col("ts") - pmod(col("ts"), lit(HourNs))).as("w_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        floor(sum(col("value")) * 100.0 + 0.5).cast("long").as("sum_value_c"))

  /** q29: gap-based sessionization — the classic lag/cumsum pattern: a row
    * starts a new session when its gap to the previous event of the same
    * user exceeds 30 min; session index = running count of session starts.
    * Two window passes over one user-partitioned sort (single shuffle).
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      // truncate to µs: DuckDB ≤1.0 reads parquet TIMESTAMP(NANOS) at µs
      // precision, so the oracle can never see sub-µs digits — pin both
      // engines to the same precision explicitly
      .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > SessionGapNs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"))
  }

  /** q174: q29's sessionization with NO per-user event sort —
    * [[ScaleOps.sessionizeRanged]]'s bucket-and-stitch (spec-proven
    * row-identical to the window form) under q29's gap and output
    * contract. Same oracle as q29, so the driver hash-match IS the
    * row-identity proof at gate scale — the q172 discipline applied to
    * the second documented mega-key degenerate case (q29/q92/q98/q108
    * all cite it). Range width = 4× the session gap: the stitch frame is
    * span/(4·gap) rows per user (calendar-bounded) and the max window
    * task is one user's events in one 2-hour span.
    */
  def sessionizeRangedGate(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      .select(col("user_id"), col("ts"), col("event_id"))
    graft.ops.ScaleOps.sessionizeRanged(ev, "user_id", "ts", "event_id",
        SessionGapNs, rangeNs = 4 * SessionGapNs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"))
  }

  val DayNs: Long = 86400L * 1000 * 1000 * 1000

  /** q78: cohort retention — users bucketed by their first-activity day,
    * counted per (cohort day, day offset). The canonical product-analytics
    * rollup. Shape: distinct (user, day) first (collapses per-user event
    * volume BEFORE any join), per-user min-day aggregation, then one
    * equi-join back on user_id and a (cohort, offset) count — every step a
    * hash shuffle on a uniform key, and (user, day) uniqueness makes the
    * final count(*) ≡ count(DISTINCT user) without a distinct-agg expand.
    * Day math is integer `div` on the int64 nanos (a double division at
    * 1e18-nanos magnitudes would round below integer precision and flip
    * day boundaries).
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts div ${DayNs}L").cast("int").as("day"))
      .distinct()
    val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    ud.join(first, "user_id")
      .groupBy(col("cohort").as("cohort_day"),
        (col("day") - col("cohort")).as("offset_day"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** q79: ordered funnel — view → click-after-view → purchase-after-click
    * conversion counts. Each stage is a per-user conditional min over the
    * previous stage's timestamp: one hash aggregation plus one equi-join on
    * user_id per stage (no window sort, no per-user event collection), so
    * stage cost is O(events) shuffled on a uniform key at any scale. The
    * summary row combines three 1-row aggregates via broadcast cross joins.
    * ts is µs-truncated like every cross-engine event operator (EventOps
    * scaladoc).
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns"))
    val v = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("tns"))).as("v"))
    val c = ev.join(v, "user_id").groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "click" && col("tns") >= col("v"),
        col("tns"))).as("c"))
    val p = ev.join(c, "user_id").groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase" && col("tns") >= col("c"),
        col("tns"))).as("p"))
    v.agg(count(lit(1)).as("n_users"), count(col("v")).as("n_viewed"))
      .crossJoin(broadcast(c.agg(count(col("c")).as("n_clicked"))))
      .crossJoin(broadcast(p.agg(count(col("p")).as("n_purchased"))))
  }

  /** q80: top user journeys — the first 5 event types per user in event
    * order, counted per path. Per-user ordering happens INSIDE the
    * aggregation (sort_array over collected (tns, event_id, type) structs,
    * truncated to 5) — no global window sort; per-user state is bounded by
    * that user's events and the output key space by the path alphabet.
    */
  val PathLen = 5
  val PathTopK = 20

  def topPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns"))
    val paths = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("tns"), col("event_id"), col("event_type")))).as("evs"))
      .select(concat_ws(">",
        transform(slice(col("evs"), 1, PathLen), e => e.getField("event_type")))
        .as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(PathTopK)
  }

  /** q91 hopping-window geometry: 4 overlapping 1-hour windows hopping
    * every 15 min (window = [[WinHops]] × [[HopNs]]).
    */
  val HopNs: Long = 15L * 60 * 1000 * 1000 * 1000
  val WinHops = 4

  /** q91: hopping (sliding) window aggregation — each event lands in
    * exactly [[WinHops]] overlapping windows: w_start = (ts div hop − k)·hop
    * for k < WinHops. The expansion is a narrow ×4 generate (integer nanos
    * math, no timestamp types), then ONE map-side-combinable aggregation on
    * (w_start, type) — the batch shape of the streaming sliding window
    * (StreamingOps.windowedCounts carries the watermark variant).
    */
  def hoppingWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"),
        explode(array((0 until WinHops).map(k =>
          (expr(s"ts div ${HopNs}L") - k) * HopNs): _*)).as("w_start"))
      .groupBy(col("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("value")) * 100.0 + 0.5).cast("long").as("sum_value_c"))

  val hoppingWindowSql: String =
    s"""SELECT ((epoch_ns(ts) // $HopNs) - k.k) * $HopNs AS w_start,
       |       event_type, count(*) AS n,
       |       floor(sum(value) * 100.0 + 0.5)::BIGINT AS sum_value_c
       |FROM events, (SELECT unnest(range(0, $WinHops)) AS k) k
       |GROUP BY 1, 2""".stripMargin

  /** q92 decay: α = ½, 8 taps — EVERY weight 2^−k is an exact power of
    * two, so value·weight and the fixed-order 8-term sum are bit-identical
    * across engines (a generic α would make the decayed sum a parity
    * flake; α = ½ makes it exact).
    */
  val EwmaTaps = 8

  /** q92: exponentially-weighted moving average of purchase values per
    * user — the decayed-feature kernel (fraud scores, session heat). A
    * fixed tap count keeps it a bounded-lag window projection: one
    * shuffle+sort on (user, ts), then 8 lag taps combined in an explicit
    * left-assoc chain (deterministic summation order by construction);
    * weights renormalize over the taps that exist near sequence starts.
    */
  def ewma(spark: SparkSession, sfDir: String): DataFrame =
    ewmaOf(Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns")))

  /** The q92 kernel over any (user_id, event_id, value, tns) frame — also
    * the spec surface (EventOpsSpec drives it with fabricated series to
    * pin the renormalization and tap semantics).
    */
  def ewmaOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tns").asc, col("event_id").asc)
    val num = (0 until EwmaTaps).map { k =>
      coalesce(lag(col("value"), k).over(w), lit(0.0)) * lit(math.pow(2, -k))
    }.reduce(_ + _)
    val den = (0 until EwmaTaps).map { k =>
      when(lag(col("value"), k).over(w).isNotNull, lit(math.pow(2, -k)))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    ev.select(col("user_id"), col("event_id"),
      Portable.r4(num / den).as("ewma"))
  }

  val ewmaSql: String = {
    val num = (0 until EwmaTaps).map { k =>
      s"coalesce(lag(value, $k) OVER uw, 0.0) * ${math.pow(2, -k)}"
    }.mkString(" + ")
    val den = (0 until EwmaTaps).map { k =>
      s"(CASE WHEN lag(value, $k) OVER uw IS NOT NULL THEN ${math.pow(2, -k)} ELSE 0.0 END)"
    }.mkString(" + ")
    s"""SELECT user_id, event_id,
       |       ${Portable.r4Sql(s"($num) / ($den)")} AS ewma
       |FROM (SELECT user_id, event_id, value,
       |             epoch_us(ts::TIMESTAMP) * 1000 AS tns
       |      FROM events WHERE event_type = 'purchase')
       |WINDOW uw AS (PARTITION BY user_id ORDER BY tns ASC, event_id ASC)""".stripMargin
  }

  /** q93: date-spine gap detection — the daily activity rollup LEFT-joined
    * onto a dense day spine so silent days appear as explicit zero rows
    * (monitoring dashboards and SLA checks need the gaps, not just the
    * activity). The spine generates from one 1-row min/max aggregate —
    * O(days) rows at any corpus scale; the only real shuffle is the daily
    * count.
    */
  def dateSpine(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .select(expr(s"ts div ${DayNs}L").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_events"))
    val spine = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.cast("int").as("is_gap"))
  }

  val dateSpineSql: String =
    s"""WITH daily AS (
       |  SELECT epoch_ns(ts) // $DayNs AS day, count(*) AS n_events
       |  FROM events GROUP BY 1),
       |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
       |spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b)
       |SELECT day, coalesce(n_events, 0) AS n_events,
       |       (n_events IS NULL)::INT AS is_gap
       |FROM spine LEFT JOIN daily USING (day)""".stripMargin

  // ----------------------------------------------------- q128 gap fill

  /** q128: gap filling with last-observation-carried-forward — the repair
    * step after q93's gap DETECTION: rebuild each event type's daily
    * series on the shared spine and fill missing days with the most
    * recent observed count (days before a type's first observation fill
    * with 0). LOCF is the standard imputation for cumulative/state-like
    * series where a missing day means "nothing changed", and the output
    * is the dense frame a forecasting or anomaly job trains on.
    *
    * Scale shape: one hash agg to the (type, day) grid, a spine generated
    * from a 1-row min/max (O(days) rows at any corpus size — the q93
    * shape), and ONE window partitioned by event type whose partitions
    * are |days| rows regardless of corpus size — bounded by the calendar,
    * not the data. Integer counts end-to-end (no float imputation).
    */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"), expr(s"ts div ${DayNs}L").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n0"))
    val types = daily.select(col("event_type")).distinct()
    val spine = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    types.crossJoin(broadcast(spine)) // |types| × |days| frame, both tiny
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n0"), lit(0L)).as("n_events"),
        coalesce(last(col("n0"), ignoreNulls = true).over(w), lit(0L))
          .as("filled"),
        col("n0").isNull.cast("int").as("is_gap"))
  }

  val gapFillSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // $DayNs AS day, count(*) AS n0
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
       |spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b),
       |frame AS (
       |  SELECT t.event_type, s.day
       |  FROM (SELECT DISTINCT event_type FROM daily) t CROSS JOIN spine s)
       |SELECT f.event_type, f.day,
       |       coalesce(d.n0, 0) AS n_events,
       |       coalesce(last_value(d.n0 IGNORE NULLS) OVER (
       |         PARTITION BY f.event_type ORDER BY f.day
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS filled,
       |       (d.n0 IS NULL)::INT AS is_gap
       |FROM frame f LEFT JOIN daily d
       |  ON f.event_type = d.event_type AND f.day = d.day""".stripMargin

  /** q94: Markov transition matrix over event types — per-user successive
    * event pairs (lead over one (user, ts) sort), pair counts, and
    * row-normalized transition probabilities. The sequence-modeling
    * companion to q80's path mining: q80 ranks whole journeys, this
    * estimates the chain. One window shuffle + two hash aggs; the
    * transition key space is |alphabet|², so the normalization join is a
    * broadcast at any corpus size.
    */
  def transitions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tns").asc, col("event_id").asc)
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        Portable.r4(col("n").cast("double") / col("tot").cast("double")).as("p"))
  }

  val transitionsSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |                  epoch_us(ts::TIMESTAMP) * 1000 AS tns FROM events),
       |pairs AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type, 1) OVER (PARTITION BY user_id
       |                                   ORDER BY tns ASC, event_id ASC) AS to_type
       |  FROM e),
       |counts AS (
       |  SELECT from_type, to_type, count(*) AS n
       |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |totals AS (SELECT from_type, sum(n)::BIGINT AS tot FROM counts GROUP BY 1)
       |SELECT from_type, to_type, n,
       |       ${Portable.r4Sql("n::DOUBLE / tot::DOUBLE")} AS p
       |FROM counts JOIN totals USING (from_type)""".stripMargin

  /** q98: time-weighted average value per user (TWAP) — each event's value
    * weighted by its holding duration (time to the user's next event; the
    * open-ended last event carries no weight). The time-weighted sibling
    * of q92's event-weighted EWMA. One (user, ts) window sort; durations
    * are exact int64 nanos, so the weights are bit-identical across
    * engines and only the value·duration double sum needs r4.
    */
  def twap(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tns").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns"))
      .withColumn("dur", lead(col("tns"), 1).over(w) - col("tns"))
      .filter(col("dur").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dur")).as("total_ns"),
        Portable.r4(sum(col("value") * col("dur")) /
          sum(col("dur")).cast("double")).as("twap"))
  }

  val twapSql: String =
    s"""WITH e AS (SELECT user_id, event_id, value,
       |                  epoch_us(ts::TIMESTAMP) * 1000 AS tns FROM events),
       |d AS (SELECT user_id, value,
       |             lead(tns, 1) OVER (PARTITION BY user_id
       |                                ORDER BY tns ASC, event_id ASC) - tns AS dur
       |      FROM e)
       |SELECT user_id, count(*) AS n_intervals, sum(dur)::BIGINT AS total_ns,
       |       ${Portable.r4Sql("sum(value * dur) / sum(dur)::DOUBLE")} AS twap
       |FROM d WHERE dur IS NOT NULL
       |GROUP BY 1""".stripMargin

  /** q99: first-touch attribution — purchase revenue credited to the
    * event type that OPENED the session (the classic marketing-analytics
    * question "which entry channel converts"). Reuses the q29
    * sessionization kernel (lag/cumsum, one (user, ts) sort); the session
    * opener is a min(struct) aggregate (no second window), and revenue
    * rolls up by opener type into an |alphabet|-row result. Cents are
    * floor-scaled integers like every money aggregate here.
    */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tns").asc, col("event_id").asc)
    val sess = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns"))
      .withColumn("prev_ts", lag(col("tns"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("tns") - col("prev_ts") > SessionGapNs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(byUser))
    sess.groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(struct(col("tns"), col("event_id"), col("event_type")))
          .getField("event_type").as("first_touch"),
        sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))).as("rev"))
      .groupBy(col("first_touch"))
      .agg(
        count(lit(1)).as("n_sessions"),
        floor(sum(col("rev")) * 100.0 + 0.5).cast("long").as("revenue_c"))
  }

  val attributionSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type, value,
       |                  epoch_us(ts::TIMESTAMP) * 1000 AS tns FROM events),
       |lagged AS (
       |  SELECT *, lag(tns) OVER (PARTITION BY user_id
       |                           ORDER BY tns ASC, event_id ASC) AS prev_ts
       |  FROM e),
       |sess AS (
       |  SELECT *, sum(CASE WHEN prev_ts IS NULL OR tns - prev_ts > $SessionGapNs
       |                     THEN 1 ELSE 0 END)
       |              OVER (PARTITION BY user_id ORDER BY tns ASC, event_id ASC)
       |              AS session_idx
       |  FROM lagged),
       |per_session AS (
       |  SELECT user_id, session_idx,
       |         first(event_type ORDER BY tns ASC, event_id ASC) AS first_touch,
       |         sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) AS rev
       |  FROM sess GROUP BY 1, 2)
       |SELECT first_touch, count(*) AS n_sessions,
       |       floor(sum(rev) * 100.0 + 0.5)::BIGINT AS revenue_c
       |FROM per_session GROUP BY 1""".stripMargin

  // ---- oracle SQL (DuckDB reads ts as a naive TIMESTAMP — µs since the
  // r6 testdata regeneration, TIMESTAMP_NS before; epoch_ns works on
  // both and equals Spark's int64-nanos contract either way) ----

  val funnelSql: String =
    """WITH e AS (SELECT user_id, event_type,
      |                  epoch_us(ts::TIMESTAMP) * 1000 AS tns FROM events),
      |v AS (SELECT user_id,
      |             min(CASE WHEN event_type = 'view' THEN tns END) AS v
      |      FROM e GROUP BY 1),
      |c AS (SELECT e.user_id,
      |             min(CASE WHEN event_type = 'click' AND tns >= v THEN tns END) AS c
      |      FROM e JOIN v USING (user_id) GROUP BY 1),
      |p AS (SELECT e.user_id,
      |             min(CASE WHEN event_type = 'purchase' AND tns >= c THEN tns END) AS p
      |      FROM e JOIN c USING (user_id) GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS n_users,
      |       (SELECT count(v) FROM v) AS n_viewed,
      |       (SELECT count(c) FROM c) AS n_clicked,
      |       (SELECT count(p) FROM p) AS n_purchased""".stripMargin

  val topPathsSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |                  epoch_us(ts::TIMESTAMP) * 1000 AS tns FROM events),
       |paths AS (
       |  SELECT array_to_string(
       |           list_slice(list(event_type ORDER BY tns, event_id), 1, $PathLen),
       |           '>') AS path
       |  FROM e GROUP BY user_id)
       |SELECT path, count(*) AS n_users
       |FROM paths GROUP BY 1
       |ORDER BY n_users DESC, path ASC LIMIT $PathTopK""".stripMargin

  val retentionSql: String =
    s"""WITH ud AS (SELECT DISTINCT user_id, (epoch_ns(ts) // $DayNs)::INT AS day
       |            FROM events),
       |f AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY 1)
       |SELECT cohort AS cohort_day, (day - cohort) AS offset_day,
       |       count(*) AS n_users
       |FROM ud JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin

  val tumblingWindowSql: String =
    s"""SELECT epoch_ns(ts) - (epoch_ns(ts) % $HourNs) AS w_start,
       |       event_type, count(*) AS n,
       |       floor(sum(value) * 100.0 + 0.5)::BIGINT AS sum_value_c
       |FROM events GROUP BY 1, 2""".stripMargin

  val sessionizeSql: String =
    s"""WITH lagged AS (
       |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) * 1000 AS tns,
       |         lag(epoch_us(ts::TIMESTAMP) * 1000)
       |           OVER (PARTITION BY user_id
       |                 ORDER BY epoch_us(ts::TIMESTAMP) * 1000, event_id) AS prev_ts
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL OR tns - prev_ts > $SessionGapNs
       |                 THEN 1 ELSE 0 END AS is_new
       |  FROM lagged),
       |sessions AS (
       |  SELECT *, sum(is_new) OVER (PARTITION BY user_id
       |                              ORDER BY tns, event_id) AS session_idx
       |  FROM flagged)
       |SELECT user_id, session_idx::BIGINT AS session_idx,
       |       count(*) AS n_events,
       |       min(tns) AS sess_start, max(tns) AS sess_end
       |FROM sessions GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------- q108 debounce

  /** Repeat-suppression window: a (user, type) event within 24 h of the
    * previous one in its burst is a duplicate signal, not a new one.
    */
  val DebounceNs: Long = 24L * 3600 * 1000 * 1000 * 1000

  /** q108: event debouncing — collapse bursts of the same (user_id,
    * event_type) into their first occurrence: an event is KEPT iff the gap
    * to its predecessor in the (user, type) stream exceeds [[DebounceNs]]
    * (or it has none). The dedup every telemetry/attribution pipeline runs
    * before counting "real" actions — retries, double-clicks, and
    * re-fired trackers land inside the window and are dropped.
    *
    * Burst-first (gap-to-PREVIOUS-EVENT) rather than throttle-to-last-kept
    * on purpose: it is exactly the q29 sessionization kernel on a finer
    * key — expressible as one lag + filter, no iterative state — and the
    * two coincide unless a burst outlives the window (pathological here).
    * Scale shape: one (user, type) window sort, then a map-side-combinable
    * per-type rollup; per-key state is one row. Result: per event_type
    * totals, kept, dropped — the before/after report a pipeline logs.
    */
  def debounce(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("tns").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns"))
      .withColumn("prev_ts", lag(col("tns"), 1).over(w))
      .select(col("event_type"),
        (col("prev_ts").isNull || col("tns") - col("prev_ts") > DebounceNs)
          .cast("long").as("kept"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("kept")).as("n_kept"),
        (count(lit(1)) - sum(col("kept"))).as("n_dropped"))
  }

  val debounceSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |                  epoch_us(ts::TIMESTAMP) * 1000 AS tns FROM events),
       |lagged AS (
       |  SELECT event_type,
       |         lag(tns) OVER (PARTITION BY user_id, event_type
       |                        ORDER BY tns ASC, event_id ASC) AS prev_ts,
       |         tns
       |  FROM e),
       |k AS (SELECT event_type,
       |             (prev_ts IS NULL OR tns - prev_ts > $DebounceNs)::INT AS kept
       |      FROM lagged)
       |SELECT event_type, count(*) AS n_events,
       |       sum(kept)::BIGINT AS n_kept,
       |       (count(*) - sum(kept))::BIGINT AS n_dropped
       |FROM k GROUP BY 1""".stripMargin

  // ---------------------------------------------- q140 interval coverage

  /** Interval length per centi-unit of `value` (36 s → value×1 h): derives
    * a deterministic integer duration from the event payload so both
    * engines build bit-identical intervals.
    */
  val CentiValueNs: Long = 36L * 1000 * 1000 * 1000

  /** q140: interval-union coverage — per user, the total wall-clock time
    * covered by the UNION of (possibly overlapping, possibly nested)
    * activity intervals, plus the count of merged intervals. Summing raw
    * durations double-counts overlap; this is the sweep-line gaps-and-
    * islands form: an interval starts a new island when it begins after
    * the running max end of everything before it. The billing/SLA/usage-
    * metering operator (and the batch twin of a session-merge).
    *
    * Scale shape: one shuffle partitioned by user, two window passes over
    * the same (user, start, id) sort order — running max(end) strictly
    * preceding, then the island cumsum — and two hash aggregations. All
    * per-user, so it scales out with the user dimension; all interval math
    * is int64 nanos (µs-truncated like every cross-engine event op).
    */
  def intervalCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("start_ns").asc, col("event_id").asc)
    val iv = Tables.events(spark, sfDir).select(
      col("user_id"), col("event_id"),
      (col("ts") - pmod(col("ts"), lit(1000L))).as("start_ns"),
      (floor(col("value") * 100.0 + 0.5).cast("long") * CentiValueNs).as("dur_ns"))
      .withColumn("end_ns", col("start_ns") + col("dur_ns"))
    iv.withColumn("prev_max_end",
        max(col("end_ns")).over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_max_end").isNull || col("start_ns") > col("prev_max_end"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("start_ns")).as("s"), max(col("end_ns")).as("e"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("e") - col("s")).as("covered_ns"))
  }

  val intervalCoverageSql: String =
    s"""WITH iv AS (
       |  SELECT user_id, event_id,
       |         epoch_us(ts::TIMESTAMP) * 1000 AS start_ns,
       |         epoch_us(ts::TIMESTAMP) * 1000
       |           + floor(value * 100.0 + 0.5)::BIGINT * $CentiValueNs AS end_ns
       |  FROM events),
       |flagged AS (
       |  SELECT *,
       |    CASE WHEN max(end_ns) OVER (PARTITION BY user_id
       |                                ORDER BY start_ns, event_id
       |                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |           IS DISTINCT FROM NULL
       |         AND start_ns <= max(end_ns) OVER (PARTITION BY user_id
       |                                ORDER BY start_ns, event_id
       |                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |         THEN 0 ELSE 1 END AS is_new
       |  FROM iv),
       |islands AS (
       |  SELECT *, sum(is_new) OVER (PARTITION BY user_id
       |                              ORDER BY start_ns, event_id) AS island
       |  FROM flagged),
       |merged AS (
       |  SELECT user_id, island, min(start_ns) AS s, max(end_ns) AS e
       |  FROM islands GROUP BY 1, 2)
       |SELECT user_id, count(*) AS n_intervals,
       |       sum(e - s)::BIGINT AS covered_ns
       |FROM merged GROUP BY 1""".stripMargin

  // ---------------------------------------------- q151 late-data audit

  /** Allowed lateness before an event counts as late (2 h in nanos). */
  val LateDelayNs: Long = 2L * 3600 * 1000 * 1000 * 1000
  /** Deterministic out-of-order replay: arrival = event_id shifted by
    * (event_id mod 7)·50 positions. The generated stream is perfectly
    * time-ordered (ingest order ≡ event time), which would make a
    * watermark audit vacuous — the jitter injects the disorder a real
    * ingest has, the q147 injected-corruption discipline.
    */
  val ArrivalJitterMod = 7
  val ArrivalJitterStep = 50

  /** q151: late-data audit — per event type, how many events arrive
    * later than the watermark a streaming job would have held: with
    * arrival order = the jittered replay sequence, the watermark after each
    * arrival is max(event time so far) − allowed delay, and an event is
    * LATE when its own timestamp is already behind that. This is the
    * batch-side measurement that justifies the streaming pipeline's
    * watermark delay (StreamingOps uses exactly this bound): you pick the
    * delay from the measured lateness distribution, not by guessing —
    * too small silently drops these events, too large holds state.
    *
    * Scale shape: one window pass per event-type partition (the
    * per-partition watermark model — Spark's global watermark is the min
    * over partitions) ordered by the arrival sequence, then one hash
    * aggregation. All integer nanos, µs-truncated like every cross-engine
    * event operator.
    */
  def lateData(spark: SparkSession, sfDir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("arr").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        (col("event_id") + (col("event_id") % ArrivalJitterMod) * ArrivalJitterStep)
          .as("arr"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns"))
      .withColumn("wm",
        max(col("tns")).over(byType.rowsBetween(Window.unboundedPreceding, -1))
          - LateDelayNs)
      .withColumn("late", (col("wm").isNotNull && col("tns") < col("wm")).cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("late")).as("n_late"),
        Portable.r4(sum(col("late")).cast("double") / count(lit(1)).cast("double"))
          .as("late_rate"),
        coalesce(max(when(col("late") === 1, col("wm") - col("tns"))), lit(0L))
          .as("max_lateness_ns"))
  }

  val lateDataSql: String =
    s"""WITH e AS (
       |  SELECT event_type, event_id,
       |         event_id + (event_id % $ArrivalJitterMod) * $ArrivalJitterStep AS arr,
       |         epoch_us(ts::TIMESTAMP) * 1000 AS tns
       |  FROM events),
       |w AS (
       |  SELECT event_type, tns,
       |         max(tns) OVER (PARTITION BY event_type ORDER BY arr, event_id
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |           - $LateDelayNs AS wm
       |  FROM e),
       |f AS (
       |  SELECT event_type, tns, wm,
       |         (wm IS NOT NULL AND tns < wm)::INT AS late
       |  FROM w)
       |SELECT event_type, count(*) AS n_events,
       |       sum(late)::BIGINT AS n_late,
       |       ${Portable.r4Sql("sum(late)::DOUBLE / count(*)::DOUBLE")} AS late_rate,
       |       coalesce(max(CASE WHEN late = 1 THEN wm - tns END), 0)::BIGINT
       |         AS max_lateness_ns
       |FROM f GROUP BY 1""".stripMargin

  // ---------------------------------------------- q159 active users

  /** Trailing window width for weekly-active users. */
  val WauDays = 7

  /** q159: DAU / trailing-WAU / stickiness — per calendar day, the
    * distinct users active that day, the distinct users active in the
    * trailing [[WauDays]]-day window, and the DAU/WAU ratio. The product
    * health metric every event pipeline publishes daily, and the batch
    * shape of a sliding-window distinct count.
    *
    * Scale shape: the event stream collapses to distinct (user, day)
    * FIRST (one hash agg — per-user daily volume never rides further);
    * the trailing window is a narrow ×7 integer generate per active pair
    * (each activity lights up the 7 window-ends it can serve), then one
    * distinct + count per window day. No sliding sort, no per-day
    * re-scan: cost is O(active-pairs × 7) shuffled on uniform keys —
    * the q91 hopping-window expansion applied to DISTINCT counting.
    * Day bounds ride along as a 1-row broadcast.
    */
  def activeUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts div ${DayNs}L").as("day"))
      .distinct()
    val bounds = ud.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + (WauDays - 1))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    wau.join(dau, Seq("day"), "left")
      .crossJoin(broadcast(bounds))
      .filter(col("day").between(col("d0"), col("d1")))
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        col("wau"),
        Portable.r4(coalesce(col("dau"), lit(0L)).cast("double") /
          col("wau").cast("double")).as("stickiness"))
  }

  val activeUsersSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, epoch_ns(ts) // $DayNs AS day FROM events),
       |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
       |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
       |wau AS (
       |  SELECT day, count(*) AS wau FROM (
       |    SELECT DISTINCT user_id, unnest(range(day, day + $WauDays)) AS day
       |    FROM ud)
       |  GROUP BY 1)
       |SELECT w.day, coalesce(d.dau, 0)::BIGINT AS dau, w.wau,
       |       ${Portable.r4Sql("coalesce(d.dau, 0)::DOUBLE / w.wau::DOUBLE")} AS stickiness
       |FROM wau w LEFT JOIN dau d USING (day), bounds
       |WHERE w.day BETWEEN bounds.d0 AND bounds.d1""".stripMargin

  // ------------------------------------------- q161 process conformance

  /** q161: process-conformance audit — purchases with no prior view and
    * clicks with no prior view, per user, rolled up to a corpus summary.
    * The process-mining check that event streams actually follow the
    * declared funnel order (q79 counts who CONVERTED; this counts who
    * acted OUT OF ORDER — instrumentation bugs, bots, and replayed
    * traffic all show up here first).
    *
    * Scale shape: one per-user min-view aggregation + one equi-join back
    * onto the action events + one summary rollup — the q79 funnel cost
    * class (no window sort). ts µs-truncated like every event op; a tie
    * (action at exactly the first view's timestamp) counts as conformant
    * on both engines (>=).
    */
  def conformance(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tns")).as("v0"))
    val actions = ev.filter(col("event_type").isin("click", "purchase"))
      .join(firstView, Seq("user_id"), "left")
      .select(col("event_type"),
        (col("v0").isNull || col("tns") < col("v0")).cast("long").as("orphan"))
    actions.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_actions"),
        sum(col("orphan")).as("n_orphan"),
        Portable.r4(sum(col("orphan")).cast("double") /
          count(lit(1)).cast("double")).as("orphan_rate"))
  }

  val conformanceSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) * 1000 AS tns
       |  FROM events),
       |fv AS (
       |  SELECT user_id, min(tns) AS v0 FROM ev
       |  WHERE event_type = 'view' GROUP BY 1),
       |a AS (
       |  SELECT e.event_type,
       |         (f.v0 IS NULL OR e.tns < f.v0)::INT AS orphan
       |  FROM ev e LEFT JOIN fv f USING (user_id)
       |  WHERE e.event_type IN ('click', 'purchase'))
       |SELECT event_type, count(*) AS n_actions,
       |       sum(orphan)::BIGINT AS n_orphan,
       |       ${Portable.r4Sql("sum(orphan)::DOUBLE / count(*)::DOUBLE")} AS orphan_rate
       |FROM a GROUP BY 1""".stripMargin

  // ------------------------------------------- q162 conversion latency

  /** q162: conversion-latency distribution — for every user whose first
    * purchase follows their first view, the view→purchase delay; reported
    * as count plus exact quartiles/p90 in seconds. The "how long does
    * conversion take" number product teams pair with q79's "how many
    * convert" — and the latency distribution that sizes attribution
    * windows (q99) and session gaps (q29) from data instead of folklore.
    *
    * Scale shape: ONE per-user aggregation computes both firsts
    * (conditional mins — no window, no join), then a 1-row percentile
    * rollup over the |converting users| latencies. Integer nanos in, r4'd
    * seconds out; Spark `percentile` ≡ DuckDB `quantile_cont` (the q86
    * equivalence) over exact integer inputs.
    */
  def conversionLatency(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns"))
    val perUser = ev.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("tns"))).as("v0"),
        min(when(col("event_type") === "purchase", col("tns"))).as("p0"))
      .filter(col("v0").isNotNull && col("p0").isNotNull && col("p0") >= col("v0"))
      .select(((col("p0") - col("v0")) / 1e9).as("latency_s"))
    perUser.agg(
      count(lit(1)).as("n_converted"),
      Portable.r4(Quantiles.pct(spark, col("latency_s"), 0.25)).as("p25_s"),
      Portable.r4(Quantiles.pct(spark, col("latency_s"), 0.5)).as("p50_s"),
      Portable.r4(Quantiles.pct(spark, col("latency_s"), 0.9)).as("p90_s"))
  }

  val conversionLatencySql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) * 1000 AS tns
       |  FROM events),
       |u AS (
       |  SELECT user_id,
       |         min(CASE WHEN event_type = 'view' THEN tns END) AS v0,
       |         min(CASE WHEN event_type = 'purchase' THEN tns END) AS p0
       |  FROM ev GROUP BY 1),
       |lat AS (
       |  SELECT (p0 - v0) / 1e9 AS latency_s FROM u
       |  WHERE v0 IS NOT NULL AND p0 IS NOT NULL AND p0 >= v0)
       |SELECT count(*) AS n_converted,
       |       ${Portable.r4Sql("quantile_cont(latency_s, 0.25)")} AS p25_s,
       |       ${Portable.r4Sql("quantile_cont(latency_s, 0.5)")} AS p50_s,
       |       ${Portable.r4Sql("quantile_cont(latency_s, 0.9)")} AS p90_s
       |FROM lat""".stripMargin

  // ---------------------------------------------------- q164 weekly churn

  val WeekNs: Long = 7L * DayNs

  /** q164: week-over-week churn — per calendar week, how many of the
    * previous week's active users came back (retained) vs disappeared
    * (churned). q78's cohort retention follows each signup class forward;
    * this is the rolling operational cut ("what % of last week's actives
    * did we lose?") that product/oncall dashboards track week to week.
    *
    * Scale shape: events collapse to distinct (user, week) first; the
    * week-over-week comparison is ONE self equi-join on (user, week+1) —
    * no window, no per-user sequence build; then a \|weeks\|-row rollup.
    * All integer week arithmetic on int64 nanos.
    */
  def weeklyChurn(spark: SparkSession, sfDir: String): DataFrame = {
    val uw = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts div ${WeekNs}L").as("week"))
      .distinct()
    val next = uw.select(col("user_id"), (col("week") - 1).as("week"),
      lit(1L).as("returned"))
    uw.join(next, Seq("user_id", "week"), "left")
      .groupBy((col("week") + 1).as("week"))
      .agg(
        count(lit(1)).as("n_active_prev"),
        sum(coalesce(col("returned"), lit(0L))).as("n_retained"))
      .select(col("week"), col("n_active_prev"), col("n_retained"),
        (col("n_active_prev") - col("n_retained")).as("n_churned"),
        Portable.r4((col("n_active_prev") - col("n_retained")).cast("double") /
          col("n_active_prev").cast("double")).as("churn_rate"))
  }

  val weeklyChurnSql: String =
    s"""WITH uw AS (
       |  SELECT DISTINCT user_id, epoch_ns(ts) // $WeekNs AS week FROM events),
       |j AS (
       |  SELECT a.week, (b.user_id IS NOT NULL)::INT AS returned
       |  FROM uw a LEFT JOIN uw b
       |    ON a.user_id = b.user_id AND b.week = a.week + 1)
       |SELECT week + 1 AS week, count(*) AS n_active_prev,
       |       sum(returned)::BIGINT AS n_retained,
       |       (count(*) - sum(returned))::BIGINT AS n_churned,
       |       ${Portable.r4Sql(
             "(count(*) - sum(returned))::DOUBLE / count(*)::DOUBLE")} AS churn_rate
       |FROM j GROUP BY 1""".stripMargin

  // ---------------------------------------------------- q165 max drawdown

  /** q165: maximum drawdown — per user, the largest drop of the running
    * cumulative value series below its running peak (value in exact
    * cents). The classic risk/health statistic for any monotone-ish
    * accumulating series (portfolio value, cumulative engagement, quota
    * consumption): a mean or a variance never shows the worst sustained
    * decline; this does.
    *
    * Scale shape: one user-partitioned sort carries all three window
    * passes (cumulative sum, running max, max of the gap) — single
    * shuffle, the q29/q92 window class. Value is floor-scaled to integer
    * cents BEFORE the cumulative sum, so the running series and every
    * drawdown are exact BIGINTs on both engines (a float cumsum would be
    * order-dependent inside ties).
    */
  def maxDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tns").asc, col("event_id").asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        (col("ts") - pmod(col("ts"), lit(1000L))).as("tns"),
        // signed flow: errors debit, everything else credits — a series
        // that actually goes down, so drawdown is non-trivial
        when(col("event_type") === "error",
          -floor(col("value") * 100.0 + 0.5).cast("long"))
          .otherwise(floor(col("value") * 100.0 + 0.5).cast("long")).as("flow_c"))
      .withColumn("bal", sum(col("flow_c")).over(run))
      .withColumn("peak", max(col("bal")).over(run))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("peak") - col("bal")).as("max_drawdown_c"),
        max(col("bal")).as("peak_c"))
  }

  val maxDrawdownSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) * 1000 AS tns,
       |         CASE WHEN event_type = 'error'
       |              THEN -floor(value * 100.0 + 0.5)::BIGINT
       |              ELSE floor(value * 100.0 + 0.5)::BIGINT END AS flow_c
       |  FROM events),
       |w1 AS (
       |  SELECT user_id, tns, event_id,
       |         sum(flow_c) OVER (PARTITION BY user_id ORDER BY tns, event_id
       |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
       |  FROM e),
       |w2 AS (
       |  SELECT user_id, bal,
       |         max(bal) OVER (PARTITION BY user_id ORDER BY tns, event_id
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
       |  FROM w1)
       |SELECT user_id, count(*) AS n_events,
       |       max(peak - bal)::BIGINT AS max_drawdown_c,
       |       max(bal)::BIGINT AS peak_c
       |FROM w2 GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- q181 CUPED

  /** q181: CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013) — the
    * experimentation-platform adjustment: each user's post-period metric is
    * debiased by their own pre-period baseline, adj = post − θ·(pre − x̄),
    * θ = cov(pre, post)/var(pre). The variance the pre-period explains
    * leaves the metric, which is what lets an A/B test reach significance
    * on a fraction of the traffic — the op every large experimentation
    * stack runs between raw metrics and the t-test.
    *
    * Scale shape: the corpus collapses to ONE per-user aggregation (the
    * pre/post split is a predicate inside two conditional sums — no
    * self-join, no second scan); θ and x̄ come from ONE 5-number moment
    * row over the user table, broadcast back as a 1-row cross. Nothing
    * bigger than the user table ever shuffles, and the moment row is
    * map-side combinable.
    *
    * Parity discipline: values floor-scale to integer cents BEFORE the
    * unordered sums (q165); the split point is integer nano math over the
    * observed range (`lo + (hi−lo) div 2`); every moment is an exact
    * BIGINT whose int→double conversion is IEEE-identical on both
    * engines, so θ and the per-user adjustments agree to the bit before
    * the final r4.
    */
  def cuped(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").as("tns"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
    val bounds = e.agg(min(col("tns")).as("lo"), max(col("tns")).as("hi"))
      .select((col("lo") + expr("(hi - lo) div 2")).as("mid"))
    val perUser = e.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("tns") < col("mid"), col("cents")).otherwise(0L)).as("pre_c"),
        sum(when(col("tns") >= col("mid"), col("cents")).otherwise(0L)).as("post_c"))
    val m = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("pre_c")).as("sx"), sum(col("post_c")).as("sy"),
      sum(col("pre_c") * col("post_c")).as("sxy"),
      sum(col("pre_c") * col("pre_c")).as("sxx"))
    val nD = col("n").cast("double")
    val theta = (nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
      (nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
    val meanPre = col("sx").cast("double") / nD
    perUser.crossJoin(broadcast(m))
      .select(
        col("user_id"), col("pre_c"), col("post_c"),
        Portable.r4(theta).as("theta"),
        Portable.r4(col("post_c").cast("double") / 100.0 -
          theta * ((col("pre_c").cast("double") - meanPre) / 100.0)).as("adj"))
  }

  val cupedSql: String = {
    val theta = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts::TIMESTAMP) * 1000 AS tns,
       |         floor(value * 100.0 + 0.5)::BIGINT AS cents
       |  FROM events),
       |b AS (SELECT min(tns) + (max(tns) - min(tns)) // 2 AS mid FROM e),
       |u AS (
       |  SELECT user_id,
       |         sum(CASE WHEN tns < mid THEN cents ELSE 0 END)::BIGINT AS pre_c,
       |         sum(CASE WHEN tns >= mid THEN cents ELSE 0 END)::BIGINT AS post_c
       |  FROM e, b GROUP BY 1),
       |m AS (
       |  SELECT count(*)::DOUBLE AS n,
       |         sum(pre_c)::DOUBLE AS sx, sum(post_c)::DOUBLE AS sy,
       |         sum(pre_c * post_c)::DOUBLE AS sxy,
       |         sum(pre_c * pre_c)::DOUBLE AS sxx
       |  FROM u)
       |SELECT user_id, pre_c, post_c,
       |       ${Portable.r4Sql(theta)} AS theta,
       |       ${Portable.r4Sql(
              s"post_c::DOUBLE / 100.0 - ($theta) * ((pre_c::DOUBLE - sx / n) / 100.0)")} AS adj
       |FROM u, m""".stripMargin
  }
}
