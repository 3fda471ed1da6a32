package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.AdvancedOps

class AdvancedOpsSpec extends AnyFunSuite with SparkTestBase {

  test("mergeUpsert: matched rows update, unmatched insert, untouched pass through") {
    val s = spark
    import s.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "price")
    val source = Seq((2L, 99.0), (9L, 42.0)).toDF("sid", "sprice")
    val merged = AdvancedOps.mergeUpsert(
      target, source, "id", "sid",
      updateSet = Map("price" -> source("sprice")),
      insertRow = Seq(source("sid").as("id"), lit("new").as("name"),
        source("sprice").as("price")))
      .orderBy("id").collect()
    assert(merged.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0), (9L, "new", 42.0)))
  }

  test("mergeUpsert rejects duplicate source keys (SQL MERGE cardinality rule)") {
    val s = spark
    import s.implicits._
    val target = Seq((1L, 10.0)).toDF("id", "price")
    val dupSource = Seq((1L, 99.0), (1L, 88.0)).toDF("sid", "sprice")
    val e = intercept[IllegalArgumentException] {
      AdvancedOps.mergeUpsert(
        target, dupSource, "id", "sid",
        updateSet = Map("price" -> dupSource("sprice")),
        insertRow = Seq(dupSource("sid").as("id"), dupSource("sprice").as("price")))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("snapshotDiff classifies I/U/D and drops unchanged rows") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, null.asInstanceOf[String]))
      .toDF("id", "v")
    val neu = Seq((1L, "a"), (2L, "B"), (4L, "d"), (5L, null.asInstanceOf[String]))
      .toDF("id", "v")
    val diff = AdvancedOps.snapshotDiff(old, neu, "id", Seq("v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    // 1 unchanged and 5 null==null dropped; update / delete / insert kept
    assert(diff.toSeq == Seq(
      (2L, "U", "b", "B"), (3L, "D", "c", null), (4L, "I", null, "d")))
  }

  test("asofJoin: equal-timestamp purchase matches (inclusive), later does not") {
    // sf0.001 gate data already oracles this end-to-end; here assert the
    // inclusive-boundary property directly on the operator output
    val out = AdvancedOps.asofJoin(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(4)).foreach { r =>
      assert(r.getLong(4) <= r.getLong(2),
        s"purchase_ts after click_ts: $r")
    }
  }

  test("rangeJoin window boundaries: [ts-5min, ts) half-open") {
    val out = AdvancedOps.rangeJoin(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // every click appears exactly once (left semantics, no bucket dup)
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }

  test("kmeansAssign: every vector assigned to one of K clusters") {
    val out = AdvancedOps.kmeansAssign(spark, "/root/testdata/sf0.001")
      .select("cluster").distinct().collect().map(_.getLong(0))
    assert(out.forall(c => c >= 0 && c < AdvancedOps.KmeansK))
    assert(out.length > 1, "k-means collapsed to a single cluster")
  }

  test("bestRepKeepList: same clusters as q63, keeper is the quality argmax") {
    val sf = "/root/testdata/sf0.001"
    val rows = AdvancedOps.bestRepKeepList(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    val minId = AdvancedOps.dedupKeepList(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == minId.size, "keep-lists must cover the same corpus")
    // identical partition into clusters (only the elected member differs):
    // grouping docs by representative yields the same set of doc-sets
    val a = rows.groupBy(_._3).values.map(_.map(_._1).toSet).toSet
    val b = minId.toSeq.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(a == b, "q132 re-election changed cluster membership")
    rows.groupBy(_._3).foreach { case (rep, members) =>
      assert(members.count(_._4) == 1, s"cluster $rep: exactly one keeper")
      val keeper = members.find(_._4).get
      assert(keeper._1 == rep, s"cluster $rep: keep flag marks the rep")
      // argmax rule: max quality, ties to the smaller doc_id
      val best = members.minBy { case (id, q, _, _) => (-q, id) }
      assert(keeper._1 == best._1, s"cluster $rep: wrong election")
    }
  }

  test("softDedupWeights: weights sum to 1 per cluster, singletons weigh 1.0") {
    val sf = "/root/testdata/sf0.001"
    val rows = AdvancedOps.softDedupWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs && rows.map(_._1).distinct.length == nDocs,
      "one weighted row per document")
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.forall(_._3 == members.length),
        s"cluster $rep: size column != member count")
      // each cluster contributes one document's worth of weight (up to the
      // r4 grid: r4(1/n)·n deviates by < n·1e-4)
      val w = members.map(_._5).sum
      assert(math.abs(w - 1.0) <= members.length * 1e-4,
        s"cluster $rep: Σweight $w")
    }
    rows.filter(_._3 == 1L).foreach { case (_, _, _, nTok, w, eff) =>
      assert(w == 1.0 && eff == nTok.toDouble)
    }
  }

  test("topicDiversity: exact entropy replay, eff_clusters in [1, n_clusters]") {
    val sf = "/root/testdata/sf0.001"
    val rows = AdvancedOps.topicDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4)))
    // every document lands in exactly one (source, cluster) cell
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs, "n_docs must partition the corpus")
    assert(rows.map(_._1).distinct.length == rows.length, "one row per source")
    // driver-side replay of the integer-scaled Shannon entropy per source
    val assigned = AdvancedOps.kmeansAssign(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val src = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val scale = AdvancedOps.TopicEntropyScale
    def o(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val cells = src.groupBy { case (id, s) => (s, assigned(id)) }
      .toSeq.map { case ((s, _), docs) => (s, docs.length.toLong) }
      .groupBy(_._1)
    rows.foreach { case (s, nDocs, nClusters, entropy, eff) =>
      val ns = cells(s).map(_._2).toSeq
      assert(nClusters == ns.length && nDocs == ns.sum)
      val sti = ns.map(n => n * math.floor(math.log(n.toDouble) * scale + 0.5).toLong).sum
      val h = math.log(nDocs.toDouble) - sti.toDouble / (nDocs.toDouble * scale)
      assert(entropy == o(h), s"source $s: entropy $entropy != replay ${o(h)}")
      assert(eff == o(math.exp(h)), s"source $s: eff_clusters off replay")
      // effective-species bounds: 1 <= exp(H) <= realized cluster count
      assert(eff >= 1.0 - 1e-4 && eff <= nClusters + 1e-4,
        s"source $s: eff $eff outside [1, $nClusters]")
    }
  }

  test("silhouette: brute-force replay of the centroid-silhouette per cluster") {
    val sf = "/root/testdata/sf0.001"
    val rows = AdvancedOps.silhouette(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val emb = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val assigned = AdvancedOps.kmeansAssign(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_._2).sum == emb.size, "n must partition the vectors")
    // post-hoc centroids: r4'd component means of the final clusters
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val cents = assigned.groupBy(_._2).map { case (c, members) =>
      val vs = members.keys.toSeq.map(emb)
      c -> Array.tabulate(vs.head.length)(i => o4(vs.map(_(i)).sum / vs.size))
    }
    def d(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); s += x * x; i += 1 }
      math.sqrt(math.max(s, 0.0))
    }
    val sc = AdvancedOps.SilhouetteScale
    val expect = assigned.toSeq.map { case (id, c) =>
      val a = d(emb(id), cents(c))
      val b = cents.collect { case (c2, cv) if c2 != c => d(emb(id), cv) }
        .minOption.getOrElse(a)
      val s = if (math.max(a, b) > 0.0) (b - a) / math.max(a, b) else 0.0
      (c, math.floor(a * sc + 0.5).toLong, math.floor(b * sc + 0.5).toLong,
        math.floor(s * sc + 0.5).toLong)
    }.groupBy(_._1)
    rows.foreach { case (c, n, ma, mb, ms) =>
      val g = expect(c)
      assert(n == g.length, s"cluster $c size")
      // the published means are exact functions of the integer-grid sums —
      // the replay may differ only where its unfused JVM arithmetic lands a
      // term on the other side of a grid boundary (allow n ulps of grid)
      assert(math.abs(ma - o4(g.map(_._2).sum.toDouble / (n * sc))) <= n * 1e-9)
      assert(math.abs(mb - o4(g.map(_._3).sum.toDouble / (n * sc))) <= n * 1e-9)
      assert(math.abs(ms - o4(g.map(_._4).sum.toDouble / (n * sc))) <= n * 1e-9)
      assert(ms >= -1.0 - 1e-4 && ms <= 1.0 + 1e-4, s"cluster $c: mean_sil $ms")
    }
  }

  test("dupFlow: exact replay from the q63 keep-list, drops fully accounted") {
    val sf = "/root/testdata/sf0.001"
    val rows = AdvancedOps.dupFlow(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val srcOf = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dropped = AdvancedOps.dedupKeepList(spark, sf)
      .filter("NOT keep").select("doc_id", "representative").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = dropped.groupBy(d => (srcOf(d._1), srcOf(d._2)))
      .map { case (k, v) => k -> v.length.toLong }
    assert(rows.length == expect.size, "one row per realized flow edge")
    assert(rows.map(_._3).sum == dropped.length.toLong,
      "flow counts must account for every dropped doc")
    rows.foreach { case (s, rs, n, w) =>
      assert(expect((s, rs)) == n, s"flow $s->$rs")
      assert(w == (if (s == rs) 1 else 0), s"within flag $s->$rs")
    }
  }

  test("mannWhitney: brute-force pairwise U replay per source") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.ExtraOps.mannWhitney(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val srcOf = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qi = graft.ops.TextOps.qualityScore(spark, sf)
      .selectExpr("doc_id", "cast(floor(quality * 10000.0 + 0.5) as long) qi")
      .collect().map(r => (srcOf(r.getLong(0)), r.getLong(1)))
    val nn = qi.length
    def o4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    // corpus-wide tie term over the grid cells
    val ties = qi.groupBy(_._2).values
      .map(g => BigInt(g.size).pow(3) - g.size).sum
    assert(rows.map(_._2).sum == nn, "n must partition the corpus")
    rows.foreach { case (s, n1, u, auc, z) =>
      val a = qi.filter(_._1 == s).map(_._2)
      val b = qi.filter(_._1 != s).map(_._2)
      assert(n1 == a.length, s"$s n")
      // brute-force 2U as an exact integer: 2 per win, 1 per tie
      val u2 = a.iterator.map(x =>
        2L * b.count(_ < x) + b.count(_ == x)).sum
      assert(u == o4(u2 / 2.0), s"$s u $u != ${o4(u2 / 2.0)}")
      val n2 = b.length.toDouble
      assert(auc == o4(if (n2 > 0) (u2 / 2.0) / (n1 * n2) else 0.0), s"$s auc")
      val mu = n1 * n2 / 2.0
      val sig2 = (n1 * n2 / 12.0) *
        ((nn + 1.0) - ties.toDouble / (nn.toDouble * (nn - 1.0)))
      val ez = if (sig2 > 0) (u2 / 2.0 - mu) / math.sqrt(sig2) else 0.0
      assert(math.abs(z - o4(ez)) <= 2e-4, s"$s z $z != ${o4(ez)}")
      assert(auc >= 0.0 && auc <= 1.0)
    }
  }

  test("clusterPowerlaw: OLS replay over the exact size histogram") {
    val sf = "/root/testdata/sf0.001"
    val r = AdvancedOps.clusterPowerlaw(spark, sf).collect()(0)
    val sizes = AdvancedOps.dedupClusters(spark, sf)
      .groupBy("component").count().collect()
      .map(_.getLong(1)).filter(_ >= 2)
    assert(r.getLong(0) == sizes.length, "n_clusters")
    assert(r.getLong(1) == sizes.sum, "n_dup_docs")
    assert(r.getLong(2) == sizes.max, "max_size")
    val hist = sizes.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    assert(r.getInt(3) == hist.length, "n_sizes")
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(r.getDouble(4) == o4(sizes.max.toDouble / sizes.sum.toDouble))
    val xs = hist.map(h => math.log(h._1.toDouble))
    val ys = hist.map(h => math.log(h._2.toDouble))
    val kk = hist.length.toDouble
    val den = kk * xs.map(x => x * x).sum - xs.sum * xs.sum
    val slope = if (den == 0.0) 0.0
      else (kk * xs.zip(ys).map(t => t._1 * t._2).sum - xs.sum * ys.sum) / den
    val icept = if (den == 0.0) 0.0 else (ys.sum - slope * xs.sum) / kk
    // the engine folds the same terms in the same index order; allow one
    // grid cell for associativity differences in the driver replay
    assert(math.abs(r.getDouble(5) - o4(slope)) <= 1e-4, "slope")
    assert(math.abs(r.getDouble(6) - o4(icept)) <= 1e-4, "intercept")
    // a dup-size histogram is decreasing in every web-like corpus: the
    // count of size-2 clusters dominates → negative slope unless degenerate
    if (hist.length > 1) assert(r.getDouble(5) < 0.0, "expected heavy tail")
  }

  test("lshPlan: exact S-curve area replay per geometry, argmin flagged") {
    import graft.ops.Dedup
    val rows = Dedup.lshPlan(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getInt(5))).sortBy(_._2)
    assert(rows.length == 5)
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val n = Dedup.LshPlanGrid
    val sc = Dedup.LshPlanScale
    val tau = Dedup.MinhashVerifyThreshold
    val replay = rows.map { case (b, r, ts, fp, fn, _) =>
      assert(b * r == graft.functions.PortableHash.MinhashK, "b·r = K")
      assert(ts == o4(math.pow(1.0 / b, 1.0 / r)), s"($b,$r) t_star")
      var sfp = 0L; var sfn = 0L
      for (i <- 0 until n) {
        val s = (i + 0.5) / n
        val p = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
        if (s < tau) sfp += math.floor(p * sc + 0.5).toLong
        else sfn += math.floor((1.0 - p) * sc + 0.5).toLong
      }
      assert(fp == o4(sfp.toDouble / (n.toDouble * sc)), s"($b,$r) fp_area")
      assert(fn == o4(sfn.toDouble / (n.toDouble * sc)), s"($b,$r) fn_area")
      (b, sfp + sfn)
    }
    // t* increases with rows per band (steeper curve, higher threshold)
    assert(rows.map(_._3).sliding(2).forall(w => w(0) <= w(1)), "t* monotone")
    val bestB = replay.minBy { case (b, tot) => (tot, b) }._1
    assert(rows.count(_._6 == 1) == 1 && rows.find(_._6 == 1).get._1 == bestB,
      "argmin geometry flagged")
  }

  test("dedupQualityUplift: per-source before/after replay off the keep-list") {
    val sf = "/root/testdata/sf0.001"
    val rows = AdvancedOps.dedupQualityUplift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val srcOf = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qi = graft.ops.TextOps.qualityScore(spark, sf)
      .selectExpr("doc_id", "cast(floor(quality * 10000.0 + 0.5) as long) qi")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keep = AdvancedOps.dedupKeepList(spark, sf)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(rows.map(_._2).sum == srcOf.size, "n_before partitions the corpus")
    rows.foreach { case (s, nb, na, mb, ma, d) =>
      val ids = srcOf.collect { case (id, src) if src == s => id }.toSeq
      assert(nb == ids.length && na == ids.count(keep), s"$s counts")
      val emb0 = o4(ids.map(qi).sum.toDouble / (nb * 1e4))
      val ema = if (na == 0) 0.0
        else o4(ids.filter(keep).map(qi).sum.toDouble / (na * 1e4))
      assert(mb == emb0 && ma == ema, s"$s means")
      assert(math.abs(d - o4(
        (if (na == 0) 0.0 else ids.filter(keep).map(qi).sum.toDouble / (na * 1e4))
          - ids.map(qi).sum.toDouble / (nb * 1e4))) <= 1e-4, s"$s delta")
    }
  }

  test("wassersteinShift: brute-force earth-mover replay per source") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.ExtraOps.wassersteinShift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val srcOf = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qi = graft.ops.TextOps.qualityScore(spark, sf)
      .selectExpr("doc_id", "cast(floor(quality * 10000.0 + 0.5) as long) qi")
      .collect().map(r => (srcOf(r.getLong(0)), r.getLong(1)))
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(rows.map(_._2).sum == qi.length, "n partitions the corpus")
    rows.foreach { case (s, n, w1) =>
      val a = qi.filter(_._1 == s).map(_._2)
      val b = qi.filter(_._1 != s).map(_._2)
      assert(n == a.length, s"$s n")
      // brute ∫|Fa−Fb| over the unit grid, in score units
      var acc = BigInt(0)
      for (x <- 0L to 10000L) {
        val ca = a.count(_ <= x).toLong; val cb = b.count(_ <= x).toLong
        acc += (BigInt(ca) * b.length - BigInt(cb) * a.length).abs
      }
      val ew = acc.toDouble / (a.length.toDouble * b.length.toDouble * 1e4)
      assert(w1 == o4(ew), s"$s w1 $w1 != ${o4(ew)}")
      assert(w1 >= 0.0 && w1 <= 1.0 + 1e-9)
    }
  }

  test("mutualInfo: exact entropy-cell replay, MI bounds hold") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.ops.ExtraOps.mutualInfo(spark, sf).collect()(0)
    val d = graft.Tables.documents(spark, sf)
      .select("source", "lang").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val sc = graft.ops.ExtraOps.MiScale
    val n = d.length
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def hOf(groups: Map[_, Int]): Double = {
      val s = groups.values
        .map(c => c.toLong * math.floor(math.log(c.toDouble) * sc + 0.5).toLong)
        .sum
      math.log(n.toDouble) - s.toDouble / (n.toDouble * sc)
    }
    val hs = hOf(d.groupBy(_._1).view.mapValues(_.length).toMap)
    val hl = hOf(d.groupBy(_._2).view.mapValues(_.length).toMap)
    val hj = hOf(d.groupBy(identity).view.mapValues(_.length).toMap)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == o4(hs), "h_source")
    assert(r.getDouble(2) == o4(hl), "h_lang")
    assert(r.getDouble(3) == o4(hj), "h_joint")
    val mi = hs + hl - hj
    assert(math.abs(r.getDouble(4) - o4(mi)) <= 1e-4, "mi")
    // information-theory bounds: 0 ≤ MI ≤ min(H(S), H(L)); joint ≤ sum
    assert(r.getDouble(4) >= -1e-4 && r.getDouble(4) <=
      math.min(hs, hl) + 1e-4)
    assert(r.getDouble(3) <= hs + hl + 1e-4 &&
      r.getDouble(3) + 1e-4 >= math.max(hs, hl))
    assert(r.getDouble(5) >= -1e-4 && r.getDouble(5) <= 1.0 + 1e-4, "nmi")
  }

  test("clusterPurity: exact majority/entropy replay per cluster") {
    val sf = "/root/testdata/sf0.001"
    val rows = AdvancedOps.clusterPurity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5)))
    val labelOf = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val assigned = AdvancedOps.kmeansAssign(spark, sf).collect()
      .map(r => (r.getLong(1), labelOf(r.getLong(0))))
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val sc = AdvancedOps.TopicEntropyScale
    assert(rows.map(_._2).sum == assigned.length, "n partitions the vectors")
    rows.foreach { case (c, n, nLabels, top, purity, ent) =>
      val cells = assigned.filter(_._1 == c).groupBy(_._2)
        .map { case (l, v) => (l, v.length.toLong) }.toSeq
      assert(n == cells.map(_._2).sum && nLabels == cells.length, s"c$c sizes")
      val (el, en) = cells.minBy { case (l, m) => (-m, l) }
      assert(top == el, s"c$c top label")
      assert(purity == o4(en.toDouble / n), s"c$c purity")
      val sti = cells.map { case (_, m) =>
        m * math.floor(math.log(m.toDouble) * sc + 0.5).toLong }.sum
      val eh = math.log(n.toDouble) - sti.toDouble / (n.toDouble * sc)
      assert(ent == o4(eh), s"c$c entropy")
      assert(purity >= 1.0 / nLabels - 1e-4 && purity <= 1.0 + 1e-9)
    }
  }

  test("lshLoad: classing/mass replay off the engine's bucket sizes, q22 bound") {
    import graft.ops.Dedup
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = Dedup.lshLoad(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    // bucket sizes from the same banding exprs the op (and q22) use —
    // cross-engine parity is the oracle's job; this pins the accounting
    val nBands = 4
    val rpb = graft.functions.PortableHash.MinhashK / nBands
    val sh = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(graft.functions.chess.shingleHashes(col("text")))
          .as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"),
        graft.functions.chess.minhashSigs(col("shingles")).as("sigs"))
    val szs = sh
      .select(posexplode(array((0 until nBands).map { j =>
        concat_ws("_", (0 until rpb).map(r =>
          element_at(col("sigs"), j * rpb + r + 1)): _*)
      }: _*)).as(Seq("band_idx", "band_key")))
      .groupBy("band_idx", "band_key").count()
      .collect().map(_.getLong(2))
    def cls(sz: Long): Long =
      Dedup.LshLoadClasses.find(sz <= _).getOrElse(Long.MaxValue)
    val expect = szs.groupBy(s =>
        (cls(s), if (s >= 2 && s <= Dedup.MaxPostings) 1 else 0))
      .map { case (k, v) =>
        k -> (v.length.toLong, v.map(s => BigInt(s) * (s - 1)).sum) }
    val tot = expect.values.map(_._2).sum
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(rows.length == expect.size, "one row per (class, admitted) cell")
    rows.foreach { case (c, adm, nb, pm, share) =>
      val (en, em2) = expect((c, adm))
      assert(nb == en, s"($c,$adm) n_buckets")
      assert(pm == em2.toDouble / 2.0, s"($c,$adm) pair_mass")
      assert(share == o4(if (tot == 0) 0.0 else em2.toDouble / tot.toDouble),
        s"($c,$adm) mass_share")
    }
    // every q22 candidate pair lives in >= 1 admitted bucket
    val admittedMass = rows.filter(_._2 == 1).map(_._4).sum
    val nPairs = Dedup.minhashLsh(spark, sf).count()
    assert(admittedMass >= nPairs.toDouble, "admitted mass bounds q22 pairs")
  }
}
