package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationPipeline

class CurationPipelineSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("corpusFunnel: stage counts are monotone and globally consistent") {
    val rows = CurationPipeline.corpusFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val counts = (2 to 7).map(r.getLong) // n_raw .. n_final
      counts.sliding(2).foreach { case Seq(a, b) =>
        assert(a >= b, s"funnel not monotone: ${r.mkString(",")}")
      }
    }
    val totalRaw = rows.map(_.getLong(2)).sum
    val corpus = graft.Tables.documents(spark, sf).count()
    assert(totalRaw == corpus, s"raw total $totalRaw != corpus $corpus")
    // the stages guaranteed to fire at this sf: eval holdout (s0, modulus
    // membership) and the quality threshold (s3, ~median cut). Exact/near
    // dup and decontamination can legitimately be zero-drop on a tiny
    // clean corpus or after earlier stages removed their candidates.
    val Seq(train, _, neardup, quality, fin) =
      (3 to 7).map(i => rows.map(_.getLong(i)).sum)
    assert(train < totalRaw, "eval holdout filtered nothing")
    assert(quality < neardup, "quality threshold filtered nothing")
    assert(fin <= quality && fin < totalRaw)
  }
}
