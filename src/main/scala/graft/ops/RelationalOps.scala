package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator inventory (SURVEY.md §2.2–2.5) exercised over the
  * TPC-H-ish testdata so the driver's DuckDB oracle can hash-match each one.
  *
  * Scale notes (the 100 TB contract):
  *  - dimension joins (region/nation/customer at TPC-H proportions) are
  *    explicitly `broadcast()` — no shuffle of the fact side;
  *  - fact-fact joins (orders ⋈ lineitem) are plain equi-joins: Catalyst
  *    picks sort-merge/shuffled-hash and AQE re-plans at runtime;
  *  - aggregates are declarative groupBy/agg → partial (map-side) aggregation
  *    is automatic; no collect-based logic anywhere;
  *  - per-group top-1 uses max(struct(..)) (a partial-aggregable argmax)
  *    rather than a window where possible — a window forces a full shuffle +
  *    sort per partition key, the agg form combines map-side.
  *
  * All floating aggregates are rounded identically in the Spark plan and the
  * oracle SQL; IEEE-754 division/multiplication of identical inputs is
  * bit-stable across engines, only summation order is not, and rounding to a
  * coarse decimal absorbs that.
  */
object RelationalOps {

  /** TPC-H Q1-style pricing summary: filter + groupBy + multi-agg (A1/A3). */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Selective filter + projection; predicate/column pushdown to parquet (P3/P5). */
  def filterProject(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    l.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") > 0.05 && col("l_quantity") < 25)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
  }

  /** Fact-fact equi-join + agg (orders ⋈ lineitem), revenue by priority. */
  def joinRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Broadcast star-join over the dimension chain customer→nation→region. */
  def starJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
  }

  /** Global top-k with deterministic tie-break (W1). */
  def topKOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(10)

  /** Per-group argmax via max(struct(..)) — partial-aggregable, no window
    * shuffle-sort (A3). Tie-break: highest price, then highest orderkey.
    */
  def argmaxPerCustomer(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("best"))
      .select(
        col("o_custkey"),
        col("best.o_orderkey").as("best_order"),
        col("best.o_totalprice").as("best_price"))

  /** Ranking window: top-3 orders per priority class (W1 as a window). */
  def windowTop3(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
  }

  /** UNION ALL of two slices then agg (U1/J3 analog). */
  def unionSlices(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val hi = o.filter(col("o_totalprice") > 400000.0)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
    hi.unionByName(urgent)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
  }

  /** Anti join: customers with no high-value order (P6/U2). */
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** Semi join: customers with ≥1 urgent order. */
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
  }

  /** DISTINCT projection (dedup, order-free — A4 family). */
  def distinctSegments(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select("c_mktsegment", "c_nationkey").distinct()

  /** Conditional aggregation (TPC-H Q12 shape): join + CASE WHEN sums. */
  def caseAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        // when(isHigh, 0).otherwise(1), NOT when(!isHigh, 1).otherwise(0):
        // a NULL priority must land in the low bucket to match SQL
        // CASE … ELSE semantics (NULL condition takes the otherwise branch)
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** ROLLUP with grouping-set id — multi-level agg in one shuffle. */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        col("n"), col("sum_qty"))

  /** Scalar-function chain: date parts, string ops, coalesce (F6–F8). */
  def scalarFunctions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        date_format(col("o_orderdate"), "MM").as("o_month"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        coalesce(col("o_orderstatus"), lit("?")).as("status"),
        upper(col("o_orderstatus")).as("status_up"),
        length(col("o_orderpriority")).as("prio_len"))

  /** q75: the pure-SQL user surface — a multi-CTE `spark.sql` query
    * (join + window + projection) over registered temp views, exactly as an
    * end user would write it against this engine's catalog. The rest of the
    * suite exercises the DataFrame API (and q31 the lateral SQL form); this
    * gate pins that plain ANSI SQL through the session parser produces the
    * same plans and answers.
    */
  def sqlSurface(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_v")
    spark.sql(
      """WITH cust_orders AS (
        |  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
        |         row_number() OVER (PARTITION BY c.c_mktsegment
        |           ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        |  FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey)
        |SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        |FROM cust_orders WHERE rn <= 5""".stripMargin)
  }

  val sqlSurfaceSql: String =
    """WITH cust_orders AS (
      |  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
      |         row_number() OVER (PARTITION BY c.c_mktsegment
      |           ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
      |SELECT c_mktsegment, o_orderkey, o_totalprice, rn::INT AS rn
      |FROM cust_orders WHERE rn <= 5""".stripMargin

  /** Correlated-subquery shape (TPC-H Q17-ish): per-part avg qty via join. */
  def avgQtyFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val perPart = l.groupBy(col("l_partkey").as("pk"))
      .agg(avg("l_quantity").as("avg_qty"))
    l.join(broadcast(perPart), l("l_partkey") === perPart("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_small"), round(sum("l_extendedprice"), 2).as("value_small"))
  }
}
