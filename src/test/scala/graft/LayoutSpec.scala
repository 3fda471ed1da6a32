package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Storage-layout scale proofs: partition pruning on read, bucketed
  * shuffle-free joins, and approximate-aggregate accuracy — the mechanisms
  * that matter at 100 TB but have no DuckDB-oracle form.
  */
class LayoutSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("partition pruning: a filter on the partition column skips partitions") {
    val dir = Files.createTempDirectory("part_prune").toString
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"partition filter not applied:\n$plan")
    val years = pruned.select("o_year").distinct().collect().map(_.getInt(0))
    assert(years.sameElements(Array(1995)))
  }

  test("bucketed tables join without an exchange (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a killed prior run can leave the managed location behind without a
    // catalog entry — CTAS then refuses to reuse it; clear it on disk
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
      col("o_orderkey") === col("l_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("approx_count_distinct within 5% of exact") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val exact = o.select(countDistinct("o_custkey")).head().getLong(0)
    val approx = o.select(approx_count_distinct("o_custkey")).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx percentile brackets the exact median") {
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val approxMedian = l.select(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val sorted = l.select("l_extendedprice").orderBy("l_extendedprice")
      .collect().map(_.getDouble(0))
    val exact = sorted(sorted.length / 2)
    assert(math.abs(approxMedian - exact) / exact < 0.02)
  }
}
