package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SketchOps

/** q177 count-min-sketch audit — the guarantees the oracle hash match
  * cannot express: the one-sided error invariant, the ε·N bound the d×w
  * sizing promises, and that collisions actually occur at gate scale (the
  * audit discriminates — width is sized below the vocabulary on purpose).
  */
class SketchOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = SketchOps.cmsHeavyHitters(spark, sf).collect()

  private lazy val totalTokens: Long =
    Tables.documents(spark, sf)
      .select(explode(ops.Portable.toks(col("text"))).as("t"))
      .count()

  test("CMS never underestimates (one-sided error invariant)") {
    assert(rows.nonEmpty, "no heavy hitters at gate scale")
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_est"))
      assert(est >= exact, s"underestimate for ${r.getAs[String]("term")}: $est < $exact")
      assert(r.getAs[Long]("n_over") == est - exact)
    }
  }

  test("overestimates stay inside the ε·N sizing bound") {
    // the CMS guarantee: with ε = e/w, P[err > ε·N] ≤ e^-d per key; the
    // data is fixed, so assert the bound outright — a miss means the hash
    // family or the cell aggregation is broken, not bad luck
    val epsN = math.E / SketchOps.CmsWidth * totalTokens
    rows.foreach { r =>
      assert(r.getAs[Long]("n_over") <= epsN,
        s"${r.getAs[String]("term")} over=${r.getAs[Long]("n_over")} > εN=$epsN")
    }
  }

  test("width below vocabulary forces visible collisions (audit discriminates)") {
    assert(rows.exists(_.getAs[Long]("n_over") > 0),
      "no collisions observed — the audit cannot discriminate at this width")
  }

  test("heavy-hitter cut is scale-free (φ·N threshold honored)") {
    val minExact = rows.map(_.getAs[Long]("n_exact")).min
    assert(minExact >= (SketchOps.CmsPhi * totalTokens).toLong,
      s"candidate below φ·N: $minExact")
  }
}
