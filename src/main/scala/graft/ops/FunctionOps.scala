package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Function-surface widening: exact percentiles, pattern predicates, and
  * deterministic array aggregation — each oracle-checked.
  */
object FunctionOps {

  private def r4(c: Column): Column = Portable.r4(c)
  private def r4Sql(x: String) = Portable.r4Sql(x)

  /** q46: exact interpolated median + p90 per group (Spark `percentile` ≡
    * DuckDB `quantile_cont`).
    */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        r4(percentile(col("l_quantity"), lit(0.5))).as("median_qty"),
        r4(percentile(col("l_extendedprice"), lit(0.9))).as("p90_price"))

  val percentilesSql: String =
    s"""SELECT l_returnflag,
       |  ${r4Sql("quantile_cont(l_quantity, 0.5)")} AS median_qty,
       |  ${r4Sql("quantile_cont(l_extendedprice, 0.9)")} AS p90_price
       |FROM lineitem GROUP BY 1""".stripMargin

  // ------------------------------------------- q134 rank normalization

  /** q134: within-source rank (ECDF) normalization of the quality score —
    * before merging scores from heterogeneous sources, each doc's raw
    * quality is replaced by the fraction of its OWN source scoring at or
    * below it. Rank normalization is the robust cross-source calibration
    * (a "0.7" from a verbose source and a terse one mean different
    * things; their 90th percentiles are comparable) — the rank-based
    * sibling of q62's z-score.
    *
    * The textbook percent_rank windows over every row per source —
    * sources are FEW, so those partitions are corpus-sized: the
    * unscalable global-sort class. This computes the BINNED form
    * instead (the q120 trick): quality is already a 4-decimal grid, so
    * per-(source, grid-cell) counts + a cumulative pass over ≤10⁴ cells
    * per source give the exact same ECDF with the window bounded by the
    * GRID, not the data. Parity: grid cells are exact integers (the
    * pre-division r4 numerator), cumulative counts exact, one r4'd
    * division of two BIGINTs per doc.
    */
  def rankNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), col("source"),
        TextOps.qualityCol(col("text")).as("quality"))
      // the r4 numerator as an exact integer grid cell (quality = k/10⁴;
      // the *10⁴ round-trip is ulp-safe because k ≤ 10⁴ ≪ 2⁵²)
      .withColumn("qb", floor(col("quality") * 10000.0 + 0.5).cast("long"))
    val cells = scored.groupBy(col("source"), col("qb"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("qb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.select(col("source"), col("qb"),
      sum(col("c")).over(w).as("cum"))
    val tot = cells.groupBy(col("source")).agg(sum(col("c")).as("n"))
    scored
      .join(cum, Seq("source", "qb"))
      .join(broadcast(tot), "source")
      .select(col("doc_id"), col("source"), col("quality"),
        r4(col("cum").cast("double") / col("n")).as("cdf"))
  }

  val rankNormalizeSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, source, ${TextOps.qualitySqlExpr} AS quality
       |  FROM documents),
       |sb AS (SELECT doc_id, source, quality,
       |              floor(quality * 10000.0 + 0.5)::BIGINT AS qb FROM s),
       |cells AS (SELECT source, qb, count(*) AS c FROM sb GROUP BY 1, 2),
       |cum AS (
       |  SELECT source, qb,
       |         sum(c) OVER (PARTITION BY source ORDER BY qb
       |                      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
       |  FROM cells),
       |tot AS (SELECT source, sum(c)::BIGINT AS n FROM cells GROUP BY 1)
       |SELECT sb.doc_id, sb.source, sb.quality,
       |       ${r4Sql("cum.cum::DOUBLE / tot.n")} AS cdf
       |FROM sb JOIN cum USING (source, qb) JOIN tot USING (source)""".stripMargin

  // ---------------------------------------------- q119 MAD outlier report

  /** Outlier cut in MAD units (|x − median| > MadK·MAD ⇒ outlier) — the
    * conventional "≈3σ" level for the robust scale estimate.
    */
  val MadK = 3.0

  /** q119: median-absolute-deviation outlier report per group — the robust
    * sibling of q62's z-score (mean/stddev are themselves dragged by the
    * outliers they are supposed to find; median/MAD have a 50% breakdown
    * point, which is why data-quality monitors use them on heavy-tailed
    * columns like order value or document length).
    *
    * Scale shape: two group aggregations over the fact (median, then MAD
    * of the residuals) with the one-row-per-group cut tables broadcast
    * back — the q86 winsorize shape, one extra pass because MAD is a
    * quantile OF a quantile residual. Parity: both quantiles are
    * r4-rounded before any comparison (`percentile` ≡ `quantile_cont`),
    * so the outlier predicate compares bit-identical doubles.
    */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val med = orders.groupBy(col("o_orderpriority"))
      .agg(r4(Quantiles.pct(spark, col("o_totalprice"), 0.5)).as("med"))
    val mad = orders.join(broadcast(med), "o_orderpriority")
      .groupBy(col("o_orderpriority"))
      .agg(
        max(col("med")).as("med"), // constant within the group
        r4(Quantiles.pct(spark, abs(col("o_totalprice") - col("med")), 0.5)).as("mad"))
    orders.join(broadcast(mad), "o_orderpriority")
      .groupBy(col("o_orderpriority"))
      .agg(
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum((abs(col("o_totalprice") - col("med")) > col("mad") * MadK)
          .cast("long")).as("n_outliers"))
  }

  val madOutliersSql: String =
    s"""WITH med AS (
       |  SELECT o_orderpriority, ${r4Sql("quantile_cont(o_totalprice, 0.5)")} AS med
       |  FROM orders GROUP BY 1),
       |mad AS (
       |  SELECT o_orderpriority, max(med) AS med,
       |         ${r4Sql("quantile_cont(abs(o_totalprice - med), 0.5)")} AS mad
       |  FROM orders JOIN med USING (o_orderpriority)
       |  GROUP BY 1)
       |SELECT o_orderpriority, max(med) AS med, max(mad) AS mad,
       |       count(*) AS n,
       |       sum((abs(o_totalprice - med) > mad * $MadK)::BIGINT)::BIGINT AS n_outliers
       |FROM orders JOIN mad USING (o_orderpriority)
       |GROUP BY 1""".stripMargin

  /** q86: winsorized statistics — per-group p05/p95 cut points, values
    * clamped into [p05, p95], then mean + clamp count: the outlier-robust
    * aggregation corpus curation uses for per-source length/score stats.
    *
    * Parity: the cut points are r4-rounded BEFORE clamping, so the clamp
    * comparison on both engines sees bit-identical thresholds (Spark
    * `percentile` ≡ DuckDB `quantile_cont`, and interpolation lands exactly
    * on a data value or strictly between two, so no value sits within an
    * ulp of a cut). Scale shape: the cut table is one row per group —
    * broadcast back onto the fact scan; two passes, no extra shuffle
    * beyond the two group-aggregations.
    */
  def winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val cuts = orders.groupBy(col("o_orderpriority"))
      .agg(
        r4(Quantiles.pct(spark, col("o_totalprice"), 0.05)).as("p05"),
        r4(Quantiles.pct(spark, col("o_totalprice"), 0.95)).as("p95"))
    orders.join(broadcast(cuts), "o_orderpriority")
      .select(col("o_orderpriority"), col("p05"), col("p95"),
        greatest(col("p05"), least(col("p95"), col("o_totalprice"))).as("w"),
        (col("o_totalprice") < col("p05") ||
          col("o_totalprice") > col("p95")).cast("long").as("clamped"))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(col("p05")).as("p05"), max(col("p95")).as("p95"),
        r4(avg(col("w"))).as("w_avg"),
        sum(col("clamped")).as("n_clamped"))
  }

  val winsorizeSql: String =
    s"""WITH cuts AS (
       |  SELECT o_orderpriority,
       |         ${r4Sql("quantile_cont(o_totalprice, 0.05)")} AS p05,
       |         ${r4Sql("quantile_cont(o_totalprice, 0.95)")} AS p95
       |  FROM orders GROUP BY 1)
       |SELECT o_orderpriority,
       |       max(p05) AS p05, max(p95) AS p95,
       |       ${r4Sql("avg(greatest(p05, least(p95, o_totalprice)))")} AS w_avg,
       |       sum((o_totalprice < p05 OR o_totalprice > p95)::BIGINT)::BIGINT AS n_clamped
       |FROM orders JOIN cuts USING (o_orderpriority)
       |GROUP BY 1""".stripMargin

  /** q47: pattern predicates — LIKE, NOT LIKE, and a regexp match in one
    * filter (both engines POSIX-compatible for this class).
    */
  def patternFilter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .filter(col("c_name").like("%1%") &&
        !col("c_mktsegment").like("AUTO%") &&
        col("c_name").rlike("[0-9]{2}$"))
      .select("c_custkey", "c_name", "c_mktsegment")

  val patternFilterSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE c_name LIKE '%1%'
      |  AND c_mktsegment NOT LIKE 'AUTO%'
      |  AND regexp_matches(c_name, '[0-9]{2}$')""".stripMargin

  /** q48: deterministic array aggregation — per nation, the sorted distinct
    * market segments, joined to a string (collect_set order is
    * nondeterministic; sort_array fixes it — the only safe way to
    * hash-compare an aggregated array).
    */
  def arrayAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey"))
      .agg(array_join(sort_array(collect_set(col("c_mktsegment"))), ",")
        .as("segments"))

  val arrayAggSql: String =
    """SELECT c_nationkey,
      |       array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments
      |FROM customer GROUP BY 1""".stripMargin

  /** q59: unpivot (wide→long melt) — the inverse of q44's pivot; a narrow
    * expand (4 rows out per row in, no shuffle).
    */
  val MeltCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def unpivotMetrics(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = MeltCols.map(col).toArray,
        variableColumnName = "metric",
        valueColumnName = "value")

  val unpivotMetricsSql: String =
    MeltCols.map { c =>
      s"SELECT l_orderkey, l_linenumber, '$c' AS metric, $c AS value FROM lineitem"
    }.mkString("\nUNION ALL\n")

  /** q60: datetime function suite — trunc/diff/offset/extract in one narrow
    * projection. Cross-engine notes: DuckDB dayofweek is 0=Sunday vs
    * Spark's 1=Sunday (+1 aligns); Spark datediff counts day boundaries on
    * the DATE cast, = DuckDB date_diff('day', …) on the same values; both
    * engines clamp month-offset overflow to month end.
    */
  def datetimeSuite(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_epoch0"),
      add_months(col("o_orderdate"), 2).as("plus_2m"),
      last_day(col("o_orderdate")).as("month_end"),
      dayofweek(col("o_orderdate")).as("dow"),
      quarter(col("o_orderdate")).as("qtr"),
      weekofyear(col("o_orderdate")).as("iso_week"))

  val datetimeSuiteSql: String =
    """SELECT o_orderkey,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::INT AS days_since_epoch0,
      |  (o_orderdate + INTERVAL 2 MONTH)::DATE AS plus_2m,
      |  last_day(o_orderdate::DATE) AS month_end,
      |  (dayofweek(o_orderdate) + 1)::INT AS dow,
      |  quarter(o_orderdate)::INT AS qtr,
      |  weekofyear(o_orderdate)::INT AS iso_week
      |FROM orders""".stripMargin

  /** q62: per-group z-score normalization — the standard feature-scaling op
    * for training pipelines; group stats via one window pass (no
    * collect-and-rejoin), sample stddev on both engines.
    */
  def zscore(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("c_mktsegment"))
    Tables.customer(spark, sfDir).select(
      col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
      r4((col("c_acctbal") - avg(col("c_acctbal")).over(w)) /
        stddev(col("c_acctbal")).over(w)).as("z"))
  }

  val zscoreSql: String =
    s"""SELECT c_custkey, c_mktsegment, c_acctbal,
       |  ${r4Sql("(c_acctbal - avg(c_acctbal) OVER w) / stddev(c_acctbal) OVER w")} AS z
       |FROM customer
       |WINDOW w AS (PARTITION BY c_mktsegment)""".stripMargin

  /** q64: string-function suite — case/pad/slice/replace/split plus
    * levenshtein edit distance (both engines implement the classic DP
    * distance), one narrow projection.
    */
  def stringSuite(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(
      col("c_custkey"),
      upper(col("c_name")).as("up"),
      lower(col("c_mktsegment")).as("lo"),
      substring(col("c_name"), 10, 5).as("mid"),
      lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
      reverse(col("c_name")).as("rev"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
      levenshtein(col("c_mktsegment"), lit("MACHINERY")).as("lev"),
      concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
      element_at(split(col("c_name"), "#"), 1).as("first_part"))

  val stringSuiteSql: String =
    """SELECT c_custkey,
      |  upper(c_name) AS up,
      |  lower(c_mktsegment) AS lo,
      |  substr(c_name, 10, 5) AS mid,
      |  lpad(c_custkey::VARCHAR, 10, '0') AS padded,
      |  reverse(c_name) AS rev,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
      |  levenshtein(c_mktsegment, 'MACHINERY')::INT AS lev,
      |  concat_ws('|', c_mktsegment, c_name) AS joined,
      |  string_split(c_name, '#')[1] AS first_part
      |FROM customer""".stripMargin

  /** q65: explicit GROUPING SETS — the general form behind q13's rollup and
    * q34's cube: per-status, per-priority, and grand-total aggregates in
    * one pass (Spark plans one Expand + one aggregation, not three scans),
    * with grouping_id disambiguating the null-key rows.
    */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.createOrReplaceTempView("orders_gs")
    // 100D not 100.0: Spark SQL numeric literals with a decimal point are
    // DECIMAL, and BIGINT/DECIMAL division yields DECIMAL — the D suffix
    // keeps the whole rounding chain in DOUBLE like the DataFrame-API form
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |       count(*) AS n,
        |       floor(sum(o_totalprice) * 100D + 0.5D) / 100D AS total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       (GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority))::INT AS gid,
      |       count(*) AS n,
      |       floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  // ------------------------------------------------ q146 weighted median

  /** q146: exact weighted median per group — the smallest value whose
    * cumulative weight reaches half the group's total (lower weighted
    * median over integer weights). The robust location estimate when rows
    * carry multiplicity (quantity-weighted price here; token-weighted
    * quality in a corpus): the plain median (q46/q119) answers "the middle
    * ROW", this answers "the middle UNIT".
    *
    * Scale shape: the fact table collapses to one row per DISTINCT
    * (group, value) with summed weights FIRST (hash agg, map-side
    * combinable), the cumulative window then runs over ndv(value) rows per
    * group — the value domain (prices in cents), never the row count (the
    * q134/q139 collapse-before-window discipline) — and one final min-agg
    * picks the crossing value. Weights stay BIGINT end-to-end: the
    * half-total comparison is 2·cum ≥ W in integers, no float crossing.
    * The weight derivation floors explicitly before the BIGINT cast on
    * BOTH engines (Spark cast truncates, DuckDB ::BIGINT rounds — identical
    * only on integral quantities; floor() makes it engine-independent).
    */
  def weightedMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("price_c"),
        floor(col("l_quantity")).cast("long").as("w"))
      .groupBy(col("l_returnflag"), col("price_c"))
      .agg(sum(col("w")).as("cw"))
    val win = Window.partitionBy(col("l_returnflag")).orderBy(col("price_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum", sum(col("cw")).over(win))
      .withColumn("tot", sum(col("cw")).over(Window.partitionBy(col("l_returnflag"))))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(max(col("tot")).as("total_weight"),
        min(col("price_c")).as("wmedian_price_c"))
  }

  val weightedMedianSql: String =
    """WITH cells AS (
      |  SELECT l_returnflag,
      |         floor(l_extendedprice * 100.0 + 0.5)::BIGINT AS price_c,
      |         sum(floor(l_quantity)::BIGINT)::BIGINT AS cw
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, price_c, cw,
      |         sum(cw) OVER (PARTITION BY l_returnflag ORDER BY price_c
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |         sum(cw) OVER (PARTITION BY l_returnflag) AS tot
      |  FROM cells)
      |SELECT l_returnflag, max(tot)::BIGINT AS total_weight,
      |       min(price_c) AS wmedian_price_c
      |FROM c WHERE cum * 2 >= tot GROUP BY 1""".stripMargin
}
