package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, ExtraOps, Ndv}

/** The approx mode of the NDV family (q36 distinct-agg, q76 profile,
  * q112 dup-rate, q114 join-cardinality) — the
  * [[graft.ops.Quantiles]] gate discipline: no
  * cross-engine oracle exists for the HLL++ sketch, so this spec asserts
  * the estimator's error contract against exact distinct counts on the
  * operators' own columns and runs the family end-to-end in approx mode.
  * The EXACT mode needs no spec here — it is the default and every family
  * member hash-matches the DuckDB oracle through Verify/crosscheck.
  */
class NdvSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def withApprox[T](body: => T): T = {
    spark.conf.set(Ndv.ModeKey, "approx")
    try body finally spark.conf.unset(Ndv.ModeKey)
  }

  // HLL++ rsd is a standard deviation, not a hard bound — allow 5 sigma
  // (q56's SketchBoundsSpec precedent)
  private def within(approx: Long, exact: Long): Boolean =
    math.abs(approx - exact) <= math.max(5 * Ndv.Rsd * exact, 1.0)

  test("mode flag flips the aggregate: exact by default, sketch when set") {
    assert(!Ndv.isApprox(spark))
    withApprox { assert(Ndv.isApprox(spark)) }
    assert(!Ndv.isApprox(spark))
  }

  test("q114 join-cardinality in approx mode: ndv within the HLL error bound") {
    // columns: (fk, n_child, ndv_child, n_parent, ndv_parent, est, actual)
    val exact = ExtraOps.joinCardinality(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    val approx = withApprox { ExtraOps.joinCardinality(spark, sf) }.collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (ec, ep) = exact(r.getString(0))
      assert(within(r.getLong(2), ec), s"${r.getString(0)} ndv_child ${r.getLong(2)} vs $ec")
      assert(within(r.getLong(4), ep), s"${r.getString(0)} ndv_parent ${r.getLong(4)} vs $ep")
    }
  }

  test("q112 dup-rate in approx mode: group counts within bound, derived counts clamped") {
    val exact = Dedup.dupRateByForm(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = withApprox { Dedup.dupRateByForm(spark, sf) }
    assert(approx.columns.toSeq == Seq("form", "n_docs", "n_groups", "n_dups"))
    approx.collect().foreach { r =>
      assert(within(r.getLong(2), exact(r.getString(0))),
        s"${r.getString(0)} n_groups ${r.getLong(2)} vs ${exact(r.getString(0))}")
      // the clamp contract: an HLL overestimate must never surface as an
      // impossible report (negative duplicates / more groups than docs)
      assert(r.getLong(2) <= r.getLong(1),
        s"${r.getString(0)} n_groups ${r.getLong(2)} > n_docs ${r.getLong(1)}")
      assert(r.getLong(3) >= 0L,
        s"${r.getString(0)} negative n_dups ${r.getLong(3)}")
    }
  }

  test("q76 profile in approx mode: per-column ndv within bound and clamped") {
    // columns: (column, n_total, n_null, n_distinct, min_d, max_d)
    val exact = ExtraOps.profile(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    withApprox { ExtraOps.profile(spark, sf) }.collect().foreach { r =>
      assert(within(r.getLong(3), exact(r.getString(0))),
        s"${r.getString(0)} ndv ${r.getLong(3)} vs ${exact(r.getString(0))}")
      assert(r.getLong(3) <= r.getLong(1) - r.getLong(2),
        s"${r.getString(0)} ndv ${r.getLong(3)} exceeds non-null count")
    }
  }

  test("q36 distinct-agg in approx mode: per-group ndv within bound, clamped") {
    // columns: (o_orderstatus, n_customers, n_orders)
    val exact = ExtraOps.distinctAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = withApprox { ExtraOps.distinctAgg(spark, sf) }.collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (ec, en) = exact(r.getString(0))
      assert(r.getLong(2) == en, "n_orders must stay exact in both modes")
      assert(within(r.getLong(1), ec),
        s"${r.getString(0)} n_customers ${r.getLong(1)} vs $ec")
      assert(r.getLong(1) <= r.getLong(2),
        s"${r.getString(0)} n_customers ${r.getLong(1)} > n_orders ${r.getLong(2)}")
    }
  }

  test("approx mode plans NO expand-based distinct: one-pass partial aggregation") {
    val plan = withApprox { ExtraOps.profile(spark, sf) }
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx ndv still expands:\n$plan")
    val exactPlan = ExtraOps.profile(spark, sf).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-distinct lost its expand phase — plan assumption stale")
  }
}
