package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.ScaleOps

/** Seeded randomized equivalence: every ranged prefix op must be
  * row-identical to the partition-less single-window form it replaces, for
  * arbitrary key distributions (negative keys, sparse/dense ranges, empty
  * ranges between occupied ones, NULL values) and arbitrary range widths —
  * including degenerate widths (every cell its own range; all cells in one
  * range) where the stitch arithmetic does all / none of the work.
  *
  * Complements ScaleOpsSpec's hand-built boundary fixtures: those prove
  * the known edges; this sweeps the space with deterministic seeds so a
  * failure is reproducible.
  */
class RangedOpsPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val Widths = Seq(1L, 3L, 17L, 1000000L)

  private def cells(seed: Int): Seq[(Long, Option[Long])] = {
    val rnd = new Random(seed)
    // distinct keys (a cell frame has one row per cell); ~15% NULL values
    rnd.shuffle((-300L to 300L).toList).take(120)
      .map(k => (k, if (rnd.nextInt(100) < 15) None else Some(rnd.nextInt(1000).toLong - 200)))
  }

  test("rangedCumSum ≡ single-window running sum across seeds and widths") {
    for (seed <- 0 until 4; w <- Widths) {
      val df = cells(seed).toDF("k", "v")
      val got = ScaleOps.rangedCumSum(df, "k",
          call_function("div", col("k"), lit(w)), Seq("v" -> "cum"))
        .select("k", "cum").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSet
      val ref = df.withColumn("cum", sum(col("v")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("k", "cum").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSet
      assert(got == ref, s"seed=$seed width=$w diff=${(got diff ref) ++ (ref diff got)}")
    }
  }

  test("rangedPrefixMax ≡ single-window strict-prefix max, both orders") {
    for (seed <- 0 until 4; w <- Widths; desc <- Seq(false, true)) {
      val df = cells(seed).toDF("k", "v")
      val got = ScaleOps.rangedPrefixMax(df, "k",
          call_function("div", col("k"), lit(w)), "v", "pm", desc)
        .select("k", "pm").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSet
      val ord = if (desc) col("k").desc else col("k").asc
      val ref = df.withColumn("pm", max(col("v")).over(Window.orderBy(ord)
          .rowsBetween(Window.unboundedPreceding, -1)))
        .select("k", "pm").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSet
      assert(got == ref, s"seed=$seed width=$w desc=$desc diff=${(got diff ref) ++ (ref diff got)}")
    }
  }

  test("rangedLag ≡ single-window lag(1) across seeds and widths") {
    for (seed <- 0 until 4; w <- Widths) {
      val df = cells(seed).toDF("k", "v")
      val got = ScaleOps.rangedLag(df, "k",
          call_function("div", col("k"), lit(w)), "v", "lg")
        .select("k", "lg").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSet
      val ref = df.withColumn("lg", lag(col("v"), 1).over(Window.orderBy(col("k"))))
        .select("k", "lg").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSet
      assert(got == ref, s"seed=$seed width=$w diff=${(got diff ref) ++ (ref diff got)}")
    }
  }

  test("sessionizeRanged ≡ single-window sessionization across seeds/gaps/widths") {
    for (seed <- 0 until 3; gap <- Seq(1L, 4L, 40L); w <- Seq(1L, 7L, 100L, 1000000L)) {
      val rnd = new Random(seed * 1000 + gap.toInt)
      // few keys (multi-event keys incl. a mega key), duplicate timestamps
      // allowed (tie column disambiguates), clustered so sessions form
      val evs = (0 until 300).map { i =>
        val key = if (rnd.nextInt(10) < 6) 1L else 2L + rnd.nextInt(3)
        (key, rnd.nextInt(500).toLong, i.toLong)
      }
      val df = evs.toDF("k", "ts", "id")
      val got = ScaleOps.sessionizeRanged(df, "k", "ts", "id", gap, w)
        .select("k", "id", "session_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val kw = Window.partitionBy(col("k")).orderBy(col("ts").asc, col("id").asc)
      val ref = df
        .withColumn("prev", lag(col("ts"), 1).over(kw))
        .withColumn("nw",
          when(col("prev").isNull || col("ts") - col("prev") > gap, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("nw"))
          .over(kw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("k", "id", "session_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == ref,
        s"seed=$seed gap=$gap width=$w diff=${(got diff ref) ++ (ref diff got)}")
    }
  }
}
