package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RetrievalOps

/** q179 RRF fusion — structural properties beyond the oracle hash match. */
class RetrievalOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = RetrievalOps.rrfFusion(spark, sf).collect()

  test("pool ranks are bounded and at least one ranker places every row") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (l, s) = (r.getAs[Int]("r_lex"), r.getAs[Int]("r_sem"))
      assert(l >= 0 && l <= RetrievalOps.RrfPoolK, s"r_lex out of range: $l")
      assert(s >= 0 && s <= RetrievalOps.RrfPoolK, s"r_sem out of range: $s")
      assert(l > 0 || s > 0, "row in neither pool")
    }
  }

  test("fused score is exactly the two reciprocal terms") {
    rows.foreach { r =>
      val (l, s) = (r.getAs[Int]("r_lex"), r.getAs[Int]("r_sem"))
      val expect =
        (if (l > 0) 1.0 / (RetrievalOps.RrfK + l) else 0.0) +
          (if (s > 0) 1.0 / (RetrievalOps.RrfK + s) else 0.0)
      val r4 = math.floor(expect * 10000.0 + 0.5) / 10000.0
      assert(r.getAs[Double]("rrf") == r4,
        s"doc ${r.getAs[Long]("doc_id")}: rrf ${r.getAs[Double]("rrf")} != $r4")
    }
  }

  test("a doc ranked by both pools beats every single-pool doc at equal rank") {
    // the reason RRF is used at all: consensus outranks a single ranker
    val both = rows.filter(r => r.getAs[Int]("r_lex") > 0 && r.getAs[Int]("r_sem") > 0)
    val single = rows.filter(r => r.getAs[Int]("r_lex") == 0 || r.getAs[Int]("r_sem") == 0)
    if (both.nonEmpty && single.nonEmpty) {
      val bestSingle = single.map(_.getAs[Double]("rrf")).max
      val bestBoth = both.map(_.getAs[Double]("rrf")).max
      assert(bestBoth > bestSingle,
        s"consensus doc ($bestBoth) does not outrank best single-pool doc ($bestSingle)")
    }
  }

  test("pool sizes honor the TakeOrdered cut") {
    assert(rows.count(_.getAs[Int]("r_lex") > 0) <= RetrievalOps.RrfPoolK)
    assert(rows.count(_.getAs[Int]("r_sem") > 0) <= RetrievalOps.RrfPoolK)
    // ranks within a pool are distinct and contiguous from 1
    val lexRanks = rows.map(_.getAs[Int]("r_lex")).filter(_ > 0).sorted
    assert(lexRanks.sameElements(1 to lexRanks.length), s"lex ranks not contiguous: ${lexRanks.toSeq}")
    val semRanks = rows.map(_.getAs[Int]("r_sem")).filter(_ > 0).sorted
    assert(semRanks.sameElements(1 to semRanks.length), s"sem ranks not contiguous: ${semRanks.toSeq}")
  }
}
