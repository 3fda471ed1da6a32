package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** The remaining SURVEY.md §2 shapes exercised over the shared testdata so
  * the oracle gate covers them explicitly: the literal LATERAL top-1 join
  * (J1's SQL form), order-aware first-wins dedup (A4), set operations (U2),
  * and cube grouping.
  */
object LateralOps {

  /** q31: correlated LATERAL (ORDER BY … LIMIT 1) — the reference's flagship
    * join shape (find-openings.ts:70-80) in its literal SQL form, over
    * testdata: per high-value order, its heaviest lineitem. Catalyst
    * decorrelates (DecorrelateInnerQuery) → plans as a window/agg, not a
    * per-row re-scan; identical SQL text runs on DuckDB.
    */
  def lateralTop1(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_v")
    spark.sql(lateralSqlText("orders_v", "lineitem_v"))
  }

  def lateralSqlText(orders: String, lineitem: String): String =
    s"""SELECT o.o_orderkey, l.l_linenumber, l.l_quantity
       |FROM $orders o
       |JOIN LATERAL (
       |  SELECT l_linenumber, l_quantity FROM $lineitem
       |  WHERE l_orderkey = o.o_orderkey
       |  ORDER BY l_quantity DESC, l_linenumber ASC LIMIT 1) l
       |ON TRUE
       |WHERE o.o_totalprice > 400000.0""".stripMargin

  /** q32: first-wins dedup with an explicit order (A4: the scraper's
    * keep-first-occurrence semantics) — one customer row per
    * (nation, segment), keeping the lowest custkey.
    */
  def firstWinsDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey").asc)
    Tables.customer(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("c_nationkey", "c_mktsegment", "c_custkey", "c_name")
  }

  /** q33: INTERSECT / EXCEPT set ops (U2 family): nations that have
    * customers but no suppliers, and vice versa, tagged.
    */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val custNations = Tables.customer(spark, sfDir).select(col("c_nationkey").as("nk"))
    val suppNations = Tables.supplier(spark, sfDir).select(col("s_nationkey").as("nk"))
    val onlyCust = custNations.except(suppNations).withColumn("side", lit("cust_only"))
    val onlySupp = suppNations.except(custNations).withColumn("side", lit("supp_only"))
    val both = custNations.intersect(suppNations).withColumn("side", lit("both"))
    onlyCust.unionByName(onlySupp).unionByName(both)
  }

  /** q34: CUBE over two dimensions with grouping id — all 4 grouping sets in
    * one shuffle.
    */
  def cubeAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("o_totalprice")) * 100.0 + 0.5).cast("long").as("total_c"))

  // ---- oracle SQL ----

  val lateralTop1Sql: String = lateralSqlText("orders", "lineitem")

  val firstWinsDedupSql: String =
    """SELECT c_nationkey, c_mktsegment, c_custkey, c_name
      |FROM (SELECT c_nationkey, c_mktsegment, c_custkey, c_name,
      |             row_number() OVER (PARTITION BY c_nationkey, c_mktsegment
      |                                ORDER BY c_custkey ASC) AS rn
      |      FROM customer)
      |WHERE rn = 1""".stripMargin

  val setOpsSql: String =
    """SELECT nk, 'cust_only' AS side FROM
      |  (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nk, 'supp_only' AS side FROM
      |  (SELECT s_nationkey AS nk FROM supplier EXCEPT SELECT c_nationkey FROM customer)
      |UNION ALL
      |SELECT nk, 'both' AS side FROM
      |  (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)""".stripMargin

  val cubeAggSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |       floor(sum(o_totalprice) * 100.0 + 0.5)::BIGINT AS total_c
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin
}
