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
  // ---------------------------------------------------------------- q229

  test("ndcg: three rankers, each bounded by the ideal; truth retrieves itself") {
    val out = RetrievalOps.ndcg(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.map(_._1).sorted.toSeq == Seq("bm25", "rrf", "trunc16"))
    val idcg = out.head._5
    assert(idcg > 0.0)
    out.foreach { case (ranker, k, nGraded, dcg, i, ndcg) =>
      assert(k == RetrievalOps.NdcgK)
      assert(i == idcg, s"$ranker sees a different ideal")
      assert(dcg >= 0.0 && dcg <= i + 1e-9, s"$ranker dcg $dcg exceeds ideal $i")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"$ranker ndcg $ndcg")
      assert(nGraded >= 0 && nGraded <= k, s"$ranker n_graded $nGraded")
    }
    // the truncated-cosine ranker approximates the grading truth, so it
    // must place at least one graded doc in its top-k on any corpus where
    // truncation preserves some signal
    assert(out.find(_._1 == "trunc16").get._3 > 0, "trunc16 retrieves nothing graded")
  }

  test("ndcg: idcg equals the hand-computed ideal over the grade bands") {
    val i = RetrievalOps.ndcg(spark, sf).collect().head.getDouble(4)
    // grades by construction: 5 threes then 15 twos fill the top-10 ideal
    val expect = (1 to RetrievalOps.NdcgK).map { pos =>
      val g = if (pos <= 5) 7.0 else 3.0
      g / (math.log(pos + 1.0) / math.log(2.0))
    }.sum
    assert(math.abs(i - (math.floor(expect * 10000.0 + 0.5) / 10000.0)) < 1e-9,
      s"idcg $i != $expect")
  }
  // ---------------------------------------------------------------- q240

  test("mmrRerank: greedy invariants — distinct picks, argmax start, score algebra") {
    val out = RetrievalOps.mmrRerank(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).sortBy(_._1)
    assert(out.map(_._1).toSeq == (1 to RetrievalOps.MmrK))
    assert(out.map(_._2).distinct.length == out.length, "duplicate pick")
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    // pick 1 is the pure-relevance argmax of the pool
    val pool = RetrievalOps.rrfFusion(spark, sf)
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(RetrievalOps.MmrPoolK).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.head._2 == pool.head._1 && out.head._4 == 0.0)
    // the published mmr equals the score algebra on the published columns
    out.foreach { case (k, _, rel, ms, mmr) =>
      assert(mmr == r4(RetrievalOps.MmrLambda * rel -
        RetrievalOps.MmrOneMinusLambda * ms), s"pick $k score algebra")
    }
    // every pick came from the pool
    val ids = pool.map(_._1).toSet
    assert(out.forall(o => ids.contains(o._2)))
  }

  test("kendallRankers: exact pair-accounting replay off the RRF pools") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.ops.RetrievalOps.kendallRankers(spark, sf).collect()(0)
    val m = graft.ops.RetrievalOps.KendallMissRank
    val pool = graft.ops.RetrievalOps.rrfFusion(spark, sf).collect()
      .map(x => (x.getLong(0),
        if (x.getInt(1) == 0) m else x.getInt(1),
        if (x.getInt(2) == 0) m else x.getInt(2)))
      .sortBy(_._1)
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L; var txy = 0L
    for (i <- pool.indices; j <- (i + 1) until pool.length) {
      val dx = java.lang.Integer.signum(pool(i)._2 - pool(j)._2)
      val dy = java.lang.Integer.signum(pool(i)._3 - pool(j)._3)
      if (dx * dy > 0) c += 1
      else if (dx * dy < 0) d += 1
      else if (dx == 0 && dy == 0) txy += 1
      else if (dx == 0) tx += 1
      else ty += 1
    }
    val n0 = pool.length.toLong * (pool.length - 1) / 2
    assert(r.getLong(0) == n0 && r.getLong(1) == c && r.getLong(2) == d)
    assert(r.getLong(3) == tx && r.getLong(4) == ty && r.getLong(5) == txy)
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val den = math.sqrt((n0 - tx - txy).toDouble * (n0 - ty - txy).toDouble)
    val et = if (den > 0) (c - d).toDouble / den else 0.0
    assert(math.abs(r.getDouble(6) - o4(et)) <= 1e-4, "tau_b")
    assert(r.getDouble(6) >= -1.0 - 1e-9 && r.getDouble(6) <= 1.0 + 1e-9)
  }
}
