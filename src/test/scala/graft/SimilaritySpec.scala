package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** The synthetic embeddings are i.i.d. random vectors — there is no planted
  * neighborhood structure, so absolute ANN recall is not a meaningful gate
  * (for a cos≈0.3 "neighbor", P(same 8-bit hyperplane bucket) ≈ (1-θ/π)^8 is
  * a few percent). What we assert instead: exactness of the brute-force
  * baseline, score-consistency between ANN and brute force, and that the
  * bucket join actually prunes the candidate space.
  */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("brute-force knn: k neighbors per query, scores in [-1,1], descending") {
    val rows = Similarity.knnBrute(spark, sf).collect()
    assert(rows.length == Similarity.NQueries * Similarity.K)
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rs =>
      val scores = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sorted.reverse), "scores not descending")
      assert(scores.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("ann scores agree with brute force for the same (q,n) pair") {
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getAs[Long]("q_id"), r.getAs[Long]("n_id")),
        r.getAs[Double]("score"))).toMap
    val exact = scores(Similarity.knnBrute(spark, sf))
    val approx = scores(Similarity.annLsh(spark, sf))
    val overlap = exact.keySet intersect approx.keySet
    info(s"ANN found ${approx.size} neighbors, recall@3 = " +
      f"${overlap.size.toDouble / exact.size}%.2f")
    overlap.foreach { k => assert(exact(k) == approx(k), s"score mismatch at $k") }
    // every ANN score must be ≤ the exact kth-best for that query
    approx.groupBy(_._1._1).foreach { case (q, ns) =>
      val bestExact = exact.collect { case ((`q`, _), s) => s }.max
      assert(ns.values.max <= bestExact + 1e-9)
    }
  }

  test("multi-probe finds at least as many neighbors as single-probe LSH") {
    val single = Similarity.annLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val multi = graft.ops.AdvancedOps.annMultiProbe(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    // the second probe only ADDS candidates: per query, the multi-probe
    // top-k is at least as good, so the result count can only grow
    assert(multi.size >= single.size,
      s"multi-probe returned fewer pairs (${multi.size} < ${single.size})")
  }

  test("lsh bucketing spreads vectors (no degenerate mega-bucket)") {
    val ann = Similarity.annLsh(spark, sf)
    assert(ann.collect().length <= Similarity.NQueries * Similarity.K)
    // a query scans only its bucket: candidate volume well below N per query
    val plan = ann.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "bucket join must be an equi-join")
  }

  test("near-dup pairs exist at the data-calibrated threshold, a<b, above τ") {
    val rows = Similarity.cosineNearDup(spark, sf).collect()
    assert(rows.nonEmpty, "expected pairs above the calibrated threshold")
    assert(rows.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(rows.forall(r => r.getAs[Double]("score") >= Similarity.NearDupThreshold))
  }

  test("semanticDedup: full keep-list, valid clusters, first-wins greedy rule") {
    val rows = Similarity.semanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(rows.length == n, "keep-list must cover every vector exactly once")
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall { case (_, c, _) => c >= 0 && c < Similarity.SemClusters })
    // the greedy rule can only drop a vector in favor of a SMALLER id, so
    // the smallest id of any cluster is always kept
    rows.groupBy(_._2).foreach { case (c, members) =>
      val lead = members.minBy(_._1)
      assert(lead._3, s"cluster $c: smallest member ${lead._1} was dropped")
    }
    // centroids (vec_id < K) must be assigned to themselves: cos = 1.0 is
    // the r4-maximum, tie-broken to the own (lowest matching) id
    rows.filter(_._1 < Similarity.SemClusters).foreach { case (id, c, _) =>
      assert(c == id, s"centroid $id landed in cluster $c")
    }
  }

  test("semanticDedup K conf: invariants hold at K=32, candidates shrink, " +
    "default reproduces the gate geometry") {
    val n = graft.Tables.embeddings(spark, sf).count()
    val base = Similarity.semanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sortBy(_._1).toSeq
    val candsDefault = Similarity.semanticCandidateCount(spark, sf)
    spark.conf.set(Similarity.SemClustersKey, "32")
    try {
      val k32 = Similarity.semanticDedup(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      // same contract at any K: full cover, valid cluster ids, lead kept
      assert(k32.length == n)
      assert(k32.forall { case (_, c, _) => c >= 0 && c < 32 })
      k32.groupBy(_._2).foreach { case (c, members) =>
        assert(members.minBy(_._1)._3, s"cluster $c lead dropped")
      }
      // more centroids ⇒ smaller blocks ⇒ strictly fewer candidate pairs
      // (the knob the ModeBench sweep measures)
      val cands32 = Similarity.semanticCandidateCount(spark, sf)
      assert(cands32 < candsDefault,
        s"K=32 candidates $cands32 must shrink from default $candsDefault")
      // and the geometry actually changed the blocking
      assert(k32.map(_._2).distinct.length > base.map(_._2).distinct.length)
    } finally spark.conf.unset(Similarity.SemClustersKey)
    // conf unset ⇒ byte-identical to the oracle-mirrored gate result
    val again = Similarity.semanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(again == base)
  }

  // ------------------------------------------------------------------ q138

  test("annRecall: per-query recall equals the set intersection of q25/q26") {
    val truth = Similarity.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val ann = Similarity.annLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val rows = Similarity.annRecall(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == truth.keySet,
      "recall report must cover exactly the brute-force query set")
    rows.foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(1) == truth(q).size, s"q$q: n_true")
      val hit = (truth(q) intersect ann.getOrElse(q, Set.empty)).size
      assert(r.getLong(2) == hit, s"q$q: n_hit")
      val expect = math.floor(hit.toDouble / truth(q).size * 10000.0 + 0.5) / 10000.0
      assert(r.getDouble(3) == expect, s"q$q: recall")
    }
  }

  // ------------------------------------------------------------------ q148

  test("powerIteration: matches a driver-side eigen reference; unit norm; PSD") {
    val d = Similarity.CovDim
    // reference: same r4'd covariance, same fixed-k power iteration
    val cov = Array.ofDim[Double](d, d)
    Similarity.embeddingCovariance(spark, sf).collect().foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      cov(i)(j) = c; cov(j)(i) = c
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to Similarity.PowerIters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val wf = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
    val lambda = (0 until d).map(i => wf(i) * v(i)).sum
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0

    val rows = Similarity.powerIteration(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 until d))
    rows.foreach { case (i, loading, eig) =>
      assert(loading == r4(v(i)), s"dim $i: loading ${loading} vs ${r4(v(i))}")
      assert(eig == r4(lambda), s"dim $i: eigenvalue")
    }
    // the direction is a unit vector and the covariance is PSD
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    assert(lambda >= 0.0, s"top eigenvalue $lambda of a PSD matrix")
    // residual sanity: the iteration moves toward an eigenpair (loose bound
    // — with i.i.d. dims the eigengap is small and 10 fixed iterations are
    // the CONTRACT, not convergence; exactness is the reference match above)
    val resid = math.sqrt((0 until d).map(i => math.pow(wf(i) - lambda * v(i), 2)).sum)
    assert(resid < 0.5 * math.max(lambda, 1e-9), s"power iteration diverged: $resid vs $lambda")
  }

  // ------------------------------------------------------------------ q163

  test("annMrr: reciprocal ranks recompute from q25 top-1 inside q26 lists") {
    val truth1 = Similarity.knnBrute(spark, sf).collect()
      .filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val annRank = Similarity.annLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val rows = Similarity.annMrr(spark, sf).collect()
    val (summary, perQ) = rows.partition(_.getLong(0) == -1L)
    assert(perQ.map(_.getLong(0)).toSet == truth1.keySet)
    var srr = 0L
    perQ.foreach { r =>
      val q = r.getLong(0)
      val rank = annRank.getOrElse((q, truth1(q)), 0)
      assert(r.getInt(1) == rank, s"q$q: rank_of_true")
      val rr = if (rank == 0) 0.0 else 1.0 / rank
      assert(r.getDouble(2) == r4(rr), s"q$q: reciprocal rank")
      srr += math.floor(rr * Similarity.RrScale).toLong
    }
    assert(summary.length == 1)
    assert(summary.head.getDouble(2) ==
      r4(srr.toDouble / Similarity.RrScale / perQ.length), "corpus MRR")
  }

  test("hardNegatives: kinds respect labels, ranks order scores, k bounded") {
    import org.apache.spark.sql.functions.col
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    val rows = Similarity.hardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, kind, n) = (r.getLong(0), r.getString(1), r.getLong(2))
      assert(q < Similarity.NQueries && n != q)
      // 'pos' = same label as the query, 'neg' = different — the
      // contrastive-batch contract
      if (kind == "pos") assert(labels(n) == labels(q), s"q$q pos $n label")
      else assert(kind == "neg" && labels(n) != labels(q), s"q$q neg $n label")
      assert(r.getInt(4) >= 1 && r.getInt(4) <= Similarity.K)
    }
    rows.groupBy(r => (r.getLong(0), r.getString(1))).foreach { case (g, rs) =>
      val byRank = rs.sortBy(_.getInt(4))
      assert(byRank.map(_.getInt(4)).toSeq == (1 to rs.length),
        s"$g: ranks must be dense from 1")
      // scores are non-increasing down the ranking
      byRank.map(_.getDouble(3)).sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"$g: score order")
        case _ =>
      }
    }
    // every query mines BOTH sides of the contrastive batch at this sf
    assert(rows.map(r => (r.getLong(0), r.getString(1))).distinct.length ==
      2 * Similarity.NQueries)
  }

  test("semanticDecontam equals a brute-force reference over the eval set") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val (evals, train) =
      vecs.partition(_._1 % Similarity.SemDecontamModulus == 0)
    assert(evals.nonEmpty, "eval split must be non-empty at this sf")
    val expect = train.flatMap { case (tid, tv) =>
      val hits = evals.map { case (eid, ev) =>
        (eid, dot(tv, ev) / (nrm(tid) * nrm(eid)))
      }.filter(_._2 >= Similarity.SemDecontamTau)
      if (hits.isEmpty) None
      else {
        val (eid, c) = hits.reduce[(Long, Double)] { case (a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
        }
        Some((tid, eid, math.floor(c * 1e4 + 0.5) / 1e4))
      }
    }.toSet
    val got = Similarity.semanticDecontam(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect,
      s"flag set mismatch: got ${got.size}, expect ${expect.size}")
  }

  test("kcenterCoreset equals a driver-side greedy farthest-point reference") {
    val got = Similarity.kcenterCoreset(spark, sf)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // independent reference on the collected vectors (same arithmetic order)
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val n2 = vecs.map { case (id, v) => id -> dot(v, v) }.toMap
    val byId = vecs.toMap
    var center = vecs.head._1
    val expect = Seq.newBuilder[(Int, Long, Double)]
    expect += ((1, center, 0.0))
    val dmin = scala.collection.mutable.Map[Long, Double]()
    for (r <- 2 to Similarity.KCenterK) {
      for ((id, v) <- vecs) {
        val d = (n2(id) - 2.0 * dot(v, byId(center))) + n2(center)
        dmin(id) = dmin.get(id).fold(d)(math.min(_, d))
      }
      val (pick, pd) = vecs.iterator.map { case (id, _) => (id, dmin(id)) }
        .reduce[(Long, Double)] { case (a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
        }
      expect += ((r, pick, math.floor(pd * 1e4 + 0.5) / 1e4))
      center = pick
    }
    assert(got.toSeq == expect.result(), s"got ${got.toSeq}")
    // coverage radius is non-increasing after the first real pick
    got.drop(1).map(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, "radius must shrink")
      case _ =>
    }
  }

  test("matryoshkaRecall: full dim is perfect, prefix recalls recompute by brute force") {
    import graft.ops.Similarity
    val rows = Similarity.matryoshkaRecall(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Similarity.MatryoshkaDims.sorted)
    val full = rows.last
    assert(full._1 == Similarity.Dim && full._4 == 1.0,
      "the full-dimension row must self-check at recall 1.0")
    rows.foreach { case (d, nq, nh, rec) =>
      assert(nq > 0 && nh >= 0 && nh <= nq * Similarity.K, s"dim $d counts")
      val expect = math.floor(nh.toDouble / (nq * Similarity.K) * 1e4 + 0.5) / 1e4
      assert(rec == expect, s"dim $d: recall $rec != $expect")
    }
    // driver-side brute replay at one prefix width (16): recompute the
    // truth and prefix top-K orderings and the overlap count exactly
    val vecs = graft.Tables.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    def topk(d: Int): Map[Long, Set[Long]] = {
      def cos(a: Array[Float], b: Array[Float]) = {
        var i = 0; var dp = 0.0; var na = 0.0; var nb = 0.0
        while (i < d) { dp += a(i).toDouble * b(i).toDouble
          na += a(i).toDouble * a(i).toDouble
          nb += b(i).toDouble * b(i).toDouble; i += 1 }
        dp / (math.sqrt(na) * math.sqrt(nb))
      }
      (0L until Similarity.NQueries.toLong).map { q =>
        val qs = vecs(q)
        val ranked = vecs.toSeq.filter(_._1 != q)
          .map { case (id, v) =>
            (id, math.floor(cos(qs, v) * 1e4 + 0.5) / 1e4) }
          .sortBy { case (id, s) => (-s, id) }
          .take(Similarity.K).map(_._1).toSet
        q -> ranked
      }.toMap
    }
    val truth = topk(Similarity.Dim)
    val p16 = topk(16)
    val expectHits = truth.map { case (q, t) => (t intersect p16(q)).size }.sum
    assert(rows.find(_._1 == 16).get._3 == expectHits.toLong,
      "prefix-16 hit count must match the driver-side brute replay")
  }

  test("filteredAnn: audit counts consistent; truth is label-filtered") {
    val rows = Similarity.filteredAnn(spark, sf).collect()
    assert(rows.length == Similarity.NQueries)
    rows.foreach { r =>
      val (nc, nt, nh) = (r.getAs[Long]("n_cand"), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_hit"))
      assert(nt <= Similarity.K)
      assert(nh <= nt, "hits cannot exceed the exact truth size")
      assert(nh <= nc, "hits cannot exceed the probed candidate pool")
      assert(r.getAs[Double]("recall") <= 1.0 + 1e-9)
    }
    // the filter must bite: probed∩filtered candidates are a strict subset
    // of the unfiltered probe stream for at least one query (labels split
    // the corpus, so a label-blind count would be larger)
    val labels = graft.Tables.embeddings(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("label")).count().collect()
    assert(labels.length > 1, "fixture must carry >1 label for the filter test")
  }

  test("ivfDelta: every vector lands in exactly one list; hot flag matches mean") {
    val rows = Similarity.ivfDelta(spark, sf).collect()
    assert(rows.length == graft.ops.ExtraOps.IvfCentroids)
    val total = graft.Tables.embeddings(spark, sf).count()
    val sumBase = rows.map(_.getAs[Long]("n_base")).sum
    val sumNew = rows.map(_.getAs[Long]("n_new")).sum
    assert(sumBase + sumNew == total,
      "assignment must partition base ∪ delta exactly")
    val mean = rows.map(_.getAs[Long]("n_total")).sum.toDouble / rows.length
    rows.foreach { r =>
      val expectHot = if (r.getAs[Long]("n_total") > 2.0 * mean) 1 else 0
      assert(r.getAs[Int]("hot") == expectHot, s"hot flag at c_id ${r.get(0)}")
    }
  }

  test("sourceMmd: exact integer-grid replay of the linear-kernel MMD") {
    val rows = Similarity.sourceMmd(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    val srcOf = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val embs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) e").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .filter(t => srcOf.contains(t._1))
    val cs = Similarity.CovScale
    val ms = Similarity.MmdScale
    val dim = embs.head._2.length
    // exact replay: quantized component sums, then the same two-division +
    // re-quantize arithmetic
    val bySrc = embs.groupBy(t => srcOf(t._1))
    val qsum = bySrc.view.mapValues { vs =>
      (vs.length.toLong,
        Array.tabulate(dim)(k =>
          vs.map(v => math.floor(v._2(k) * cs + 0.5).toLong).sum))
    }.toMap
    val nn = qsum.values.map(_._1).sum
    val ts = Array.tabulate(dim)(k => qsum.values.map(_._2(k)).sum)
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    rows.foreach { case (s, n, mmd2, cn) =>
      val (en, es) = qsum(s)
      assert(n == en, s"$s n")
      var d2 = BigInt(0); var c2 = BigInt(0)
      for (k <- 0 until dim) {
        val m = es(k).toDouble / (en.toDouble * cs.toDouble)
        val t = ts(k).toDouble / (nn.toDouble * cs.toDouble)
        val di = math.floor((m - t) * ms + 0.5).toLong
        val ci = math.floor(m * ms + 0.5).toLong
        d2 += BigInt(di) * di; c2 += BigInt(ci) * ci
      }
      val sc2 = ms.toDouble * ms.toDouble
      assert(mmd2 == o4(d2.toDouble / sc2), s"$s mmd2")
      assert(cn == o4(math.sqrt(c2.toDouble / sc2)), s"$s centroid_norm")
      assert(mmd2 >= 0.0 && cn >= 0.0)
    }
  }

  test("rocchio: full driver-side replay of both retrieval rounds") {
    val rows = Similarity.rocchio(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.length == Similarity.NQueries)
    val emb = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) e").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    val cs = Similarity.CovScale
    val k = Similarity.K
    def topk(qid: Long, qv: Array[Double], n: Int): Seq[(Long, Double)] =
      emb.filter(_._1 != qid)
        .map { case (id, e) => (id, o4(dot(qv, e) / (nrm(qv) * nrm(e)))) }
        .sortBy { case (id, s) => (-s, id) }.take(n).toSeq
    rows.foreach { case (qid, nOv, bMean, fMean, gain) =>
      val qv = emb.find(_._1 == qid).get._2
      val r1 = topk(qid, qv, math.max(Similarity.RocchioFb, k))
      val fb = r1.take(Similarity.RocchioFb).map(t => emb.find(_._1 == t._1).get._2)
      val cent = Array.tabulate(qv.length)(i =>
        fb.map(v => math.floor(v(i) * cs + 0.5).toLong).sum.toDouble /
          (fb.length.toDouble * cs.toDouble))
      val qp = Array.tabulate(qv.length)(i =>
        Similarity.RocchioAlpha * qv(i) + Similarity.RocchioBeta * cent(i))
      val r2 = topk(qid, qp, k)
      val base = r1.take(k)
      assert(nOv == base.map(_._1).toSet.intersect(r2.map(_._1).toSet).size,
        s"q$qid overlap")
      def mean(xs: Seq[Double]) =
        o4(xs.map(x => math.floor(x * 1e4 + 0.5).toLong).sum.toDouble /
          (xs.length * 1e4))
      assert(bMean == mean(base.map(_._2)), s"q$qid base_mean")
      assert(fMean == mean(r2.map(_._2)), s"q$qid fb_mean")
      assert(math.abs(gain - (fMean - bMean)) <= 2e-4, s"q$qid gain")
    }
  }

  test("mapAtK: exact driver-side AP replay per query") {
    val rows = Similarity.mapAtK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length == Similarity.NQueries)
    val emb = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) e", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    val k = Similarity.MapK
    val sc = Similarity.MapScale
    rows.foreach { case (qid, nRel, nRelTop, ap) =>
      val (_, qv, ql) = emb.find(_._1 == qid).get
      val ranked = emb.filter(_._1 != qid)
        .map { case (id, e, l) =>
          (id, o4(dot(qv, e) / (nrm(qv) * nrm(e))), l == ql) }
        .sortBy { case (id, s, _) => (-s, id) }
      assert(nRel == ranked.count(_._3).toLong, s"q$qid n_rel")
      val top = ranked.take(k)
      assert(nRelTop == top.count(_._3).toLong, s"q$qid n_rel_topk")
      var cum = 0L
      var sp = 0L
      top.zipWithIndex.foreach { case ((_, _, rel), i) =>
        if (rel) { cum += 1; sp += math.floor(cum.toDouble / (i + 1) * sc + 0.5).toLong }
      }
      val eap = if (nRel == 0) 0.0
        else sp.toDouble / (math.min(nRel, k.toLong).toDouble * sc)
      assert(ap == o4(eap), s"q$qid ap $ap != ${o4(eap)}")
      assert(ap >= 0.0 && ap <= 1.0 + 1e-9)
    }
  }

  test("lexicalSemanticCorr: exact moment replay over the q22 pair set") {
    val r = Similarity.lexicalSemanticCorr(spark, sf).collect()(0)
    val pairs = graft.ops.Dedup.minhashLsh(spark, sf).collect()
      .map(p => (p.getLong(0), p.getLong(1), p.getDouble(2)))
    val emb = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) e").collect()
      .map(x => x.getLong(0) -> x.getSeq[Double](1).toArray).toMap
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val pts = pairs.map { case (a, b, j) =>
      val (ea, eb) = (emb(a), emb(b))
      val cos = o4(dot(ea, eb) / (math.sqrt(dot(ea, ea)) * math.sqrt(dot(eb, eb))))
      (math.floor(j * 1e4 + 0.5).toLong, math.floor(cos * 1e4 + 0.5).toLong)
    }
    assert(r.getLong(0) == pts.length, "n_pairs")
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    assert(r.getDouble(1) == o4(sx / (n * 1e4)), "mean_jaccard")
    assert(r.getDouble(2) == o4(sy / (n * 1e4)), "mean_cosine")
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val syy = pts.map(p => BigInt(p._2) * p._2).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val vx = n * sxx.toDouble - sx.toDouble * sx.toDouble
    val vy = n * syy.toDouble - sy.toDouble * sy.toDouble
    val ep = if (vx * vy > 0)
      (n * sxy.toDouble - sx.toDouble * sy.toDouble) / math.sqrt(vx * vy)
    else 0.0
    assert(r.getDouble(3) == o4(ep), s"pearson ${r.getDouble(3)} != ${o4(ep)}")
    assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
  }

  test("binaryQuantRecall: driver replay of sign-pack, Hamming ranks, recall") {
    val rows = Similarity.binaryQuantRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.length == Similarity.NQueries)
    val emb = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) e").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def pack(e: Array[Double]): Long = {
      var s = 0L; var i = 0
      while (i < e.length) { if (e(i) > 0.0) s |= (1L << i); i += 1 }; s
    }
    val k = Similarity.K
    rows.foreach { case (qid, nHit, recall) =>
      val qv = emb.find(_._1 == qid).get._2
      val qs = pack(qv)
      val exact = emb.filter(_._1 != qid)
        .map { case (id, e) =>
          (id, o4(dot(qv, e) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(e, e))))) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
      val bq = emb.filter(_._1 != qid)
        .map { case (id, e) =>
          (id, java.lang.Long.bitCount(qs ^ pack(e))) }
        .sortBy { case (id, h) => (h, id) }.take(k).map(_._1).toSet
      assert(nHit == exact.intersect(bq).size, s"q$qid hits")
      assert(recall == o4(nHit.toDouble / k), s"q$qid recall")
    }
  }

  test("ivfSweep: recall and candidate volume monotone in nprobe, replayed") {
    val rows = Similarity.ivfSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))
    val probes = Similarity.IvfSweepProbes
    assert(rows.length == Similarity.NQueries * probes.length)
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val emb = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) e").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]) =
      o4(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    val cents = emb.filter(_._1 < graft.ops.ExtraOps.IvfCentroids)
    val assign = emb.map { case (id, e) =>
      id -> cents.map { case (c, cv) => (c, cos(e, cv)) }
        .minBy { case (c, s) => (-s, c) }._1
    }.toMap
    val k = Similarity.K
    rows.groupBy(_._1).foreach { case (qid, qr) =>
      val qv = emb.find(_._1 == qid).get._2
      val probeRank = cents.map { case (c, cv) => (c, cos(qv, cv)) }
        .sortBy { case (c, s) => (-s, c) }.map(_._1)
      val exact = emb.filter(_._1 != qid)
        .map { case (id, e) => (id, cos(qv, e)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
      val sorted = qr.sortBy(_._2)
      sorted.foreach { case (_, np, nCand, nHit, recall) =>
        val lists = probeRank.take(np).toSet
        val cands = emb.filter(t => t._1 != qid && lists(assign(t._1)))
        assert(nCand == cands.length, s"q$qid np=$np n_cand")
        val approx = cands.map { case (id, e) => (id, cos(qv, e)) }
          .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
        assert(nHit == exact.intersect(approx).size, s"q$qid np=$np hits")
        assert(recall == o4(nHit.toDouble / k), s"q$qid np=$np recall")
      }
      // the dial's contract: more probes never lose recall or candidates
      assert(sorted.map(_._3).sliding(2).forall(w => w(0) <= w(1)))
      assert(sorted.map(_._4).sliding(2).forall(w => w(0) <= w(1)))
    }
  }

  test("bqRerank: recall monotone in rescore depth, full replay") {
    val rows = Similarity.bqRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))
    val depths = Similarity.BqRerankDepths
    assert(rows.length == Similarity.NQueries * depths.length)
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val emb = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) e").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]) =
      o4(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    def pack(e: Array[Double]): Long = {
      var s = 0L; var i = 0
      while (i < e.length) { if (e(i) > 0.0) s |= (1L << i); i += 1 }; s
    }
    val k = Similarity.K
    rows.groupBy(_._1).foreach { case (qid, qr) =>
      val qv = emb.find(_._1 == qid).get._2
      val qs = pack(qv)
      val byHam = emb.filter(_._1 != qid)
        .map { case (id, e) => (id, java.lang.Long.bitCount(qs ^ pack(e)), e) }
        .sortBy { case (id, h, _) => (h, id) }
      val exact = emb.filter(_._1 != qid)
        .map { case (id, e) => (id, cos(qv, e)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
      val sorted = qr.sortBy(_._2)
      sorted.foreach { case (_, depth, nRescored, nHit, recall) =>
        val cand = byHam.take(depth)
        assert(nRescored == cand.length, s"q$qid d=$depth n_rescored")
        val approx = cand.map { case (id, _, e) => (id, cos(qv, e)) }
          .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
        assert(nHit == exact.intersect(approx).size, s"q$qid d=$depth hits")
        assert(recall == o4(nHit.toDouble / k), s"q$qid d=$depth recall")
      }
      assert(sorted.map(_._4).sliding(2).forall(w => w(0) <= w(1)),
        s"q$qid: recall must be monotone in depth")
    }
  }

  test("int8Recall: full replay of the reconstructed-cosine ranking") {
    val rows = Similarity.int8Recall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.length == Similarity.NQueries)
    val emb = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) e").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    def scaleOf(e: Array[Double]) = o4(e.map(math.abs).max)
    def codes(e: Array[Double]): Array[Double] = {
      val s = scaleOf(e)
      e.map { x =>
        if (s == 0.0) 0.0
        else math.max(-127L, math.min(127L,
          math.floor(x / s * 127 + 0.5).toLong)).toDouble
      }
    }
    val k = Similarity.K
    rows.foreach { case (qid, nHit, recall) =>
      val qv = emb.find(_._1 == qid).get._2
      val qc = codes(qv); val qs = scaleOf(qv)
      val exact = emb.filter(_._1 != qid)
        .map { case (id, e) => (id, o4(dot(qv, e) / (nrm(qv) * nrm(e)))) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
      val approx = emb.filter(_._1 != qid)
        .map { case (id, e) =>
          (id, o4(dot(qc, codes(e)) * qs * scaleOf(e) /
            (127.0 * 127.0 * nrm(qv) * nrm(e)))) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
      assert(nHit == exact.intersect(approx).size, s"q$qid hits")
      assert(recall == o4(nHit.toDouble / k), s"q$qid recall")
      // 8 bits per dim should rarely miss: int8 recall dominates the
      // 1-bit floor measured by q261 in aggregate
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }
}
