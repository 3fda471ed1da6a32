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

  test("gateAblation: ablations bound the full conjunction, funnel-consistent") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.CurationPipeline.gateAblation(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).sortBy(_._1)
    assert(rows.map(_._2).toSeq == graft.ops.CurationPipeline.GateNames)
    val funnel = graft.ops.CurationPipeline.corpusFunnel(spark, sf).collect()
    val nRaw = funnel.map(_.getLong(2)).sum
    val nFinal = funnel.map(_.getLong(7)).sum
    rows.foreach { case (i, gate, raw, full, without, rescued, share) =>
      assert(raw == nRaw, s"$gate n_raw")
      // the full conjunction equals the funnel's final stage: the
      // independent-flag product must reproduce the staged monotone chain
      assert(full == nFinal, s"$gate n_full vs funnel final")
      assert(without >= full, s"$gate: dropping a conjunct cannot lose rows")
      assert(rescued == without - full && rescued >= 0, s"$gate rescue")
      def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(share == o4(rescued.toDouble / raw), s"$gate share")
    }
    // the ablation table must attribute SOME unique removals overall on a
    // corpus where the funnel demonstrably filters (totalRaw > final)
    assert(rows.map(_._6).sum > 0, "no gate uniquely removes anything")
  }
}
