package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{CorpusOps, FunctionOps, Quantiles}

/** The approx mode of the quantile-broadcast family (q86/q88/q105/q119/
  * q149/q162) has no cross-engine oracle — approx_percentile is a sketch
  * (the q56 precedent). This spec is its gate instead: switch the session
  * conf to approx, run real family members end-to-end, and assert the
  * sketch's rank-error contract (≤ 1/Quantiles.Accuracy) against the exact
  * cut on the same data. The EXACT mode needs no spec here — it is the
  * default and every family member hash-matches the DuckDB oracle through
  * Verify/crosscheck.
  */
class QuantilesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def withApprox[T](body: => T): T = {
    spark.conf.set(Quantiles.ModeKey, "approx")
    try body finally spark.conf.unset(Quantiles.ModeKey)
  }

  test("mode flag flips the aggregate: exact by default, sketch when set") {
    assert(!Quantiles.isApprox(spark))
    withApprox { assert(Quantiles.isApprox(spark)) }
    assert(!Quantiles.isApprox(spark))
  }

  test("approx cut honors the rank-error bound against the exact data") {
    val prices = Tables.orders(spark, sf)
      .select(col("o_totalprice")).collect().map(_.getDouble(0)).sorted
    val n = prices.length
    for (frac <- Seq(0.05, 0.5, 0.95)) {
      val cut = withApprox {
        Tables.orders(spark, sf)
          .agg(Quantiles.pct(spark, col("o_totalprice"), frac).as("c"))
          .collect()(0).getDouble(0)
      }
      // the sketch returns an actual data value, whose rank is an INTERVAL
      // when the value repeats — the target rank frac·n must land within
      // [count(<cut), count(≤cut)] ± (n/Accuracy + 1 discrete-rank slack),
      // so ties at the cut can never fail the contract spuriously
      val lo = prices.count(_ < cut).toDouble
      val hi = prices.count(_ <= cut).toDouble
      val eps = n.toDouble / Quantiles.Accuracy + 1.0
      assert(frac * n >= lo - eps && frac * n <= hi + eps,
        s"approx p$frac cut $cut spans ranks [$lo,$hi] of $n (allowed ±$eps)")
    }
  }

  test("q86 winsorize end-to-end in approx mode: cuts within bounds, schema stable") {
    val exact = FunctionOps.winsorize(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = withApprox { FunctionOps.winsorize(spark, sf) }
    assert(approx.columns.toSeq ===
      Seq("o_orderpriority", "p05", "p95", "w_avg", "n_clamped"))
    approx.collect().foreach { r =>
      val (e05, e95) = exact(r.getString(0))
      // at sf0.001 the per-group n is far below Accuracy, so the sketch is
      // exact up to interpolation: the cut must sit within one data-value
      // neighborhood of the exact cut — bound by 1% of the group's spread
      val spread = math.max(1.0, e95 - e05)
      assert(math.abs(r.getDouble(1) - e05) <= 0.01 * spread,
        s"p05 ${r.getDouble(1)} vs exact $e05 for ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - e95) <= 0.01 * spread,
        s"p95 ${r.getDouble(2)} vs exact $e95 for ${r.getString(0)}")
    }
  }

  test("q105 adaptive quality end-to-end in approx mode: per-lang cut within rank bound") {
    val approxRows = withApprox { CorpusOps.adaptiveQuality(spark, sf) }.collect()
    assert(approxRows.nonEmpty)
    val quals = graft.ops.TextOps.qualityScore(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")), "doc_id")
      .select(col("lang"), col("quality"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    approxRows.foreach { r =>
      val lang = r.getString(0)
      val cut = r.getDouble(2)
      val vs = quals(lang)
      // tie-safe rank interval (see the rank-error test), with r4 rounding
      // slack on both edges
      val lo = vs.count(_ < cut - 5e-5).toDouble
      val hi = vs.count(_ <= cut + 5e-5).toDouble
      val eps = vs.length.toDouble / Quantiles.Accuracy + 1.0
      val target = CorpusOps.AdaptivePct * vs.length
      assert(target >= lo - eps && target <= hi + eps,
        s"approx cutoff $cut for $lang spans ranks [$lo,$hi] of ${vs.length}")
    }
  }
}
