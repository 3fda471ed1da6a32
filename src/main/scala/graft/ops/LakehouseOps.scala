package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Table-maintenance operators a lakehouse runs ON its tables (as opposed
  * to queries over their contents): slowly-changing-dimension history
  * builds and friends. Sits next to [[AdvancedOps.mergeUpsertOrders]]
  * (MERGE, q50) and [[AdvancedOps.snapshotDiffOrders]] (CDC diff, q69) —
  * q116 is the third leg: turning a SERIES of snapshots into validity
  * intervals (SCD type 2), which is how a dimension keeps history without
  * mutating rows.
  */
object LakehouseOps {

  private def r2(c: Column): Column = floor(c * 100.0 + 0.5) / 100.0
  private def r2Sql(x: String) = s"floor(($x) * 100.0 + 0.5) / 100.0"

  /** Synthetic churn for the three snapshot versions (constants shared
    * with the oracle SQL): v1 bumps every 5th key's price +5%, v2 then
    * cuts every 7th key's −10% — so keys divisible by 35 change twice,
    * by 5 or 7 once, the rest never (interval counts 1/2/3 all appear).
    */
  val Scd2BumpMod = 5
  val Scd2CutMod = 7

  /** q116: SCD type-2 history build — given versioned snapshots of the
    * (o_orderkey, o_totalprice) dimension, collapse consecutive equal
    * values and emit one row per value EPISODE with its validity interval
    * [valid_from, valid_to) and an is_current flag. This is the write-side
    * shape behind every `MERGE … WHEN MATCHED AND changed` dimension load;
    * q50 applies one delta, q69 diffs two snapshots, this derives the full
    * interval history from n of them.
    *
    * Scale shape: one union of the snapshots, then two window passes both
    * partitioned BY KEY (per-key history is a handful of versions, so
    * partitions are tiny and the shuffle is one hash exchange on the
    * dimension key — no global sort anywhere): lag() to keep only
    * change rows, lead() to close each episode's interval. Parity: prices
    * are r2-rounded at construction; interval bounds are exact ints;
    * the open interval's valid_to is NULL on both engines.
    */
  def scd2Orders(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val v0 = base.select(col("o_orderkey"), col("o_totalprice"), lit(0).as("version"))
    val p1 = when(col("o_orderkey") % Scd2BumpMod === 0, r2(col("o_totalprice") * 1.05))
      .otherwise(col("o_totalprice"))
    val v1 = base.select(col("o_orderkey"), p1.as("o_totalprice"), lit(1).as("version"))
    val p2 = when(col("o_orderkey") % Scd2CutMod === 0, r2(p1 * 0.9)).otherwise(p1)
    val v2 = base.select(col("o_orderkey"), p2.as("o_totalprice"), lit(2).as("version"))

    val all = v0.unionByName(v1).unionByName(v2)
    val byKey = Window.partitionBy(col("o_orderkey")).orderBy(col("version"))
    // keep only rows that OPEN an episode (first version, or value changed
    // vs the previous version); <=> is null-safe like the oracle's
    // IS DISTINCT FROM
    val opens = all
      .withColumn("prev", lag(col("o_totalprice"), 1).over(byKey))
      .filter(!(col("o_totalprice") <=> col("prev")))
    opens
      .withColumn("valid_to", lead(col("version"), 1).over(byKey))
      .select(
        col("o_orderkey"), col("o_totalprice"),
        col("version").as("valid_from"),
        col("valid_to").cast("int").as("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  val scd2OrdersSql: String =
    s"""WITH v1p AS (
       |  SELECT o_orderkey,
       |         CASE WHEN o_orderkey % $Scd2BumpMod = 0
       |              THEN ${r2Sql("o_totalprice * 1.05")}
       |              ELSE o_totalprice END AS p1
       |  FROM orders),
       |snaps AS (
       |  SELECT o_orderkey, o_totalprice, 0 AS version FROM orders
       |  UNION ALL
       |  SELECT o_orderkey, p1, 1 FROM v1p
       |  UNION ALL
       |  SELECT o_orderkey,
       |         CASE WHEN o_orderkey % $Scd2CutMod = 0
       |              THEN ${r2Sql("p1 * 0.9")} ELSE p1 END, 2
       |  FROM v1p),
       |opens AS (
       |  SELECT * FROM (
       |    SELECT o_orderkey, o_totalprice, version,
       |           lag(o_totalprice) OVER (PARTITION BY o_orderkey
       |                                   ORDER BY version) AS prev
       |    FROM snaps)
       |  WHERE o_totalprice IS DISTINCT FROM prev)
       |SELECT o_orderkey, o_totalprice,
       |       version::INT AS valid_from,
       |       (lead(version) OVER (PARTITION BY o_orderkey
       |                            ORDER BY version))::INT AS valid_to,
       |       lead(version) OVER (PARTITION BY o_orderkey
       |                           ORDER BY version) IS NULL AS is_current
       |FROM opens""".stripMargin
}
