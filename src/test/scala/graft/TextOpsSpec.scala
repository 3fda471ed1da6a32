package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

class TextOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bpeTrain: merge weights are non-increasing and merges are distinct") {
    // classic BPE invariant: a merge can only create pairs whose count is
    // bounded by the merged pair's count, and leaves other pairs untouched
    // or reduced — so the chosen weights never increase round-over-round
    val rows = TextOps.bpeTrain(spark, sf).collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (1 to TextOps.BpeTrainRounds))
    val weights = rows.map(_.getLong(2))
    assert(weights.zip(weights.tail).forall { case (a, b) => a >= b },
      s"weights increased: ${weights.mkString(",")}")
    assert(rows.map(_.getString(1)).distinct.length == rows.length,
      "same pair merged twice")
  }

  test("bpeTrain's first merge is q101's top pair") {
    val firstMerge = TextOps.bpeTrain(spark, sf).collect()
      .minBy(_.getInt(0)).getString(1).replace("+", "")
    val topPair = TextOps.bpePairs(spark, sf).collect().head.getString(0)
    assert(firstMerge == topPair,
      s"round-1 merge '$firstMerge' != q101 top pair '$topPair'")
  }

  test("perplexity: finite, positive NLL; single-bigram docs score exactly") {
    val rows = TextOps.perplexity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nll = r.getDouble(2)
      assert(!nll.isNaN && !nll.isInfinite && nll >= 0.0,
        s"doc ${r.getLong(0)}: bad NLL $nll")
    }
  }
}
