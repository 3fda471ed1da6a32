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

  test("z-order layout bounds BOTH dimensions per file (multi-dim pruning)") {
    // range-partition lineitem 16 ways by (a) l_orderkey alone and (b) the
    // z-order key over (l_orderkey, l_partkey); measure the average
    // per-partition l_partkey span. Single-key clustering leaves the second
    // dimension unbounded (span ≈ full domain → min/max stats prune
    // nothing); z-order must shrink it by a large factor while keeping
    // l_orderkey spans bounded too — that locality is exactly what parquet
    // row-group stats need to prune filters on EITHER column.
    // uniform 16-bit dimensions (z-order interleaving assumes comparable
    // bit widths — production layouts normalize each column to its min/max
    // range first, which uniform [0, 2^16) synthetic keys model directly)
    import graft.ops.ScaleOps
    val df = spark.range(100000).select(
      pmod(hash(col("id")), lit(65536)).cast("long").as("x"),
      pmod(hash(col("id"), lit(1)), lit(65536)).cast("long").as("y"))
    def avgSpan(d: org.apache.spark.sql.DataFrame, c: String): Double = {
      val spans = d.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length
    }
    val byX = df.repartitionByRange(16, col("x"))
    val byZ = df.withColumn("z", ScaleOps.zorder2(col("x"), col("y")))
      .repartitionByRange(16, col("z"))
    val domain = 65536.0
    // single-key layout: the OTHER dimension's span per file ≈ whole domain
    assert(avgSpan(byX, "y") > domain * 0.8)
    assert(avgSpan(byX, "x") < domain * 0.2) // sanity: sorted dim is bounded
    // z-order: BOTH dimensions locally bounded (16 partitions fix the top 4
    // interleaved bits = top 2 bits of each dimension → spans ≈ domain/4)
    assert(avgSpan(byZ, "x") < domain * 0.5, s"x span ${avgSpan(byZ, "x")}")
    assert(avgSpan(byZ, "y") < domain * 0.5, s"y span ${avgSpan(byZ, "y")}")
  }

  test("partitioned sink: record cap respected, file count stays O(cells) under skew") {
    import graft.ops.PartitionedSink
    val dir = Files.createTempDirectory("sink_skew").toString
    // deliberately skewed corpus: one mega cell (40k rows — at 100 TB this
    // is the source-month holding a large corpus fraction) + 9 small cells
    val df = spark.range(40900).select(
      when(col("id") < 40000, lit("mega"))
        .otherwise(concat(lit("s"), col("id") % 9)).as("cell"),
      col("id").as("v"))
    PartitionedSink.write(df, Seq("cell"), dir, maxRecordsPerFile = 5000)

    val byFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"), col("cell"))
      .count().collect()
    // no rows lost
    assert(byFile.map(_.getLong(2)).sum == 40900)
    // the cap: NO file exceeds maxRecordsPerFile — the mega cell cannot
    // serialize into one monolithic file/task output
    byFile.foreach { r =>
      assert(r.getLong(2) <= 5000,
        s"file ${r.getString(0)} holds ${r.getLong(2)} > cap")
    }
    // the mega cell splits into ~rows/cap files (8), not one; slack for
    // AQE additionally task-splitting it
    val megaFiles = byFile.count(_.getString(1) == "mega")
    assert(megaFiles >= 8 && megaFiles <= 24, s"mega cell files: $megaFiles")
    // small cells stay small-file-safe: O(1) files each (AQE coalesces
    // them into shared tasks; each task writes one file per cell it holds)
    val smallFiles = byFile.filter(_.getString(1).startsWith("s"))
    assert(smallFiles.length <= 18,
      s"small cells shattered into ${smallFiles.length} files")
    // ... and overall the layout is O(cells + megaRows/cap), never
    // O(cells × tasks)
    assert(byFile.length <= 42, s"total files: ${byFile.length}")
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
