package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{FunctionOps, GraphOps}

class GraphOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("pagerank: mass conservation, positivity, bipartite node space") {
    val rows = GraphOps.pagerank(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    // integer truncation only loses mass (≤ deg per node per round), never
    // creates it
    assert(total <= GraphOps.RankScale, s"rank mass grew: $total")
    assert(total >= (GraphOps.RankScale * 0.95).toLong,
      s"rank mass lost beyond truncation noise: $total")
    assert(rows.forall(_.getLong(1) > 0), "non-positive rank")
    val parities = rows.map(_.getLong(0) % 2).toSet
    assert(parities == Set(0L, 1L), "expected customer AND supplier nodes")
  }

  test("pagerank is deterministic across runs (integer fixed-point)") {
    val a = GraphOps.pagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.pagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("adaptiveSupport: invariant on proportional growth, scales on densification") {
    // the TPC-H shape: baskets and catalog grow together → threshold pinned
    for (k <- Seq(1L, 10L, 1000L, 1000000L))
      assert(GraphOps.adaptiveSupport(1500 * k, 200 * k) == GraphOps.TriMinSupport)
    // densification: baskets grow over a fixed catalog → threshold ∝ density.
    // At B/P = 7.5·d the rule is ceil(2·7.5·d/14) = ceil(15d/14)
    assert(GraphOps.adaptiveSupport(15000, 2000) == 2)      // d=1
    assert(GraphOps.adaptiveSupport(150000, 2000) == 11)    // d=10 → ceil(150/14)
    assert(GraphOps.adaptiveSupport(1500000, 2000) == 108)  // d=100 → ceil(1500/14)
    // the valve holds the admitted support mass: threshold/density is
    // bounded within [1, 2]× of TriMinSupport for d ≥ 1
    for (d <- 1 to 50) {
      val ms = GraphOps.adaptiveSupport(15000L * d, 2000L)
      assert(ms >= GraphOps.TriMinSupport)
      assert(ms <= 2L * GraphOps.TriMinSupport * d, s"d=$d ms=$ms")
      assert(ms * 14 >= 15L * d, s"d=$d ms=$ms admits inflated one-offs")
    }
  }

  test("triangles matches an in-memory brute force on the same graph") {
    val got = GraphOps.triangles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // brute force: same edge rule (distinct per-order part pairs, support
    // >= TriMinSupport), then count triangles by scanning all edge triples
    val pp = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pp.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity) // NB: Map.collect over tuple results would rebuild
      // a Map and collapse edges sharing `a` — filter + keySet keeps pairs
      .filter { case (_, occ) => occ.size >= GraphOps.TriMinSupport }
      .keySet
    val adj = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    val triCount = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, bs) <- adj; b <- bs
      c <- adj.getOrElse(b, Set.empty) if edges.contains((a, c))
    } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
    val want = triCount.toSeq.sortBy { case (n, c) => (-c, n) }
      .take(GraphOps.TriTopK)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }

  test("assocRules matches an in-memory support/confidence/lift recount") {
    val got = GraphOps.assocRules(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))

    val pp = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = pp.map(_._1).distinct.length
    val item = pp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairSupp = pp.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity)
      .filter(_._2.size >= GraphOps.TriMinSupport)
      .map { case (e, occ) => e -> occ.size.toLong }
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val want = pairSupp.toSeq.flatMap { case ((a, b), s) =>
      Seq((a, b, s), (b, a, s))
    }.map { case (ante, cons, s) =>
      (ante, cons, s, item(ante), item(cons),
        r4(s.toDouble / item(ante)),
        r4((s * baskets).toDouble / (item(ante) * item(cons))))
    }.sortBy { case (a, c, _, _, _, _, l) => (-l, a, c) }
      .take(GraphOps.RulesTopK)
    assert(got.toSeq == want, s"got ${got.toSeq.take(3)}...\nwant ${want.take(3)}...")
  }

  // ------------------------------------------------------------------ q153

  test("treeDepth: pointer doubling equals the closed-form halving depth") {
    val rows = GraphOps.treeDepth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, depth, root) =>
      // walk the parent chain directly
      var (cur, d) = (k, 0L)
      while (cur > 1) { cur /= 2; d += 1 }
      assert(depth == d, s"node $k: depth $depth != $d")
      assert(root == cur, s"node $k: root $root != $cur")
    }
    // the probe's runaway cap must hold with margin on this key domain
    assert(rows.map(_._2).max < (1L << GraphOps.TreeMaxRounds),
      "max depth exceeds what the capped doubling rounds can resolve")
  }

  // ------------------------------------------------------------------ q154

  test("kcore: survivors form a fixpoint and match sequential peeling") {
    // same edge rule as q117's brute force: distinct per-order part pairs
    // with support >= TriMinSupport
    val pp = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pp.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity)
      .filter { case (_, occ) => occ.size >= GraphOps.TriMinSupport }
      .keySet.toArray
    // sequential peeling to TRUE fixpoint
    var es = edges.toSet
    var changed = true
    while (changed) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= GraphOps.KCoreK).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != es.size
      es = next
    }
    val expect = es.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = GraphOps.kcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect,
      s"probe-terminated peeling (cap ${GraphOps.KCoreMaxRounds}) did not " +
        s"reach the fixpoint: got ${got.size} nodes, want ${expect.size}")
    // k-core property: every survivor keeps >= k neighbors in the core
    got.values.foreach(d => assert(d >= GraphOps.KCoreK))
  }

  /** Deterministic constructed graph with hubs, cliques and chains —
    * enough asymmetry that rounds 2+ genuinely move labels.
    */
  private def constructedEdges(hubDegree: Int) = {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val star = (1 to hubDegree).flatMap(i =>
      Seq((1000L, 2000L + i), (2000L + i, 1000L)))
    val chain = (0 until 6).flatMap(i =>
      Seq((3000L + i, 3001L + i), (3001L + i, 3000L + i)))
    (clique(Seq(1L, 2, 3, 4)) ++ clique(Seq(10L, 11, 12, 13)) ++
      Seq((4L, 10L), (10L, 4L), (4L, 1000L), (1000L, 4L)) ++
      star ++ chain).distinct
  }

  test("labelProp: broadcast kernel and shuffled fallback are row-identical (r11)") {
    val s = spark
    import s.implicits._
    val edges = constructedEdges(hubDegree = 40).toDF("src", "dst")
    // default budget → broadcast kernel
    val viaBroadcast = GraphOps.labelPropEdges(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // zero budget → the shuffled join + two-level-agg rounds
    spark.conf.set(GraphOps.LpaBroadcastBudgetKey, "0")
    val viaShuffle =
      try GraphOps.labelPropEdges(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset(GraphOps.LpaBroadcastBudgetKey)
    assert(viaBroadcast == viaShuffle,
      s"kernel/fallback divergence: ${viaBroadcast.toSeq.sorted} vs " +
        s"${viaShuffle.toSeq.sorted}")
    // sanity: the hub star must have converged on one community
    val starLabels = (1 to 40).map(i => viaBroadcast(2000L + i)).toSet
    assert(starLabels.size == 1, s"star split: $starLabels")
  }

  test("labelProp: hub voter sharding (deg >> shard) matches unsharded labels (r11)") {
    val s = spark
    import s.implicits._
    // hub degree 40 with shard size 4 → the hub's voters span 10 array
    // rows that the kernel must merge back into ONE argmax
    val edges = constructedEdges(hubDegree = 40).toDF("src", "dst")
    val unsharded = GraphOps.labelPropEdges(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set(GraphOps.LpaShardSizeKey, "4")
    val sharded =
      try GraphOps.labelPropEdges(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset(GraphOps.LpaShardSizeKey)
    assert(sharded == unsharded,
      s"sharded kernel diverged: ${sharded.toSeq.sorted} vs " +
        s"${unsharded.toSeq.sorted}")
  }

  test("labelProp: two cliques with one bridge resolve to two communities") {
    val s = spark
    import s.implicits._
    // cliques {1,2,3,4} and {10,11,12,13}, bridge 4–10
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val edgePairs = clique(Seq(1L, 2, 3, 4)) ++ clique(Seq(10L, 11, 12, 13)) ++
      Seq((4L, 10L), (10L, 4L))
    val edges = edgePairs.toDF("src", "dst")
    val got = GraphOps.labelPropEdges(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2, 3, 4, 10, 11, 12, 13))
    // each clique converges on one label, and the two differ
    val c1 = Set(1L, 2, 3, 4).map(got)
    val c2 = Set(10L, 11, 12, 13).map(got)
    assert(c1.size == 1, s"clique 1 split: $got")
    assert(c2.size == 1, s"clique 2 split: $got")
    assert(c1 != c2, s"cliques merged: $got")
    // every community label is a member node (labels only propagate)
    got.values.foreach(l => assert(got.keySet.contains(l)))
  }

  test("LpaBytesPerNode is conservative for REAL label maps at every " +
      "capacity boundary (r12)") {
    // the broadcast gate sizes the label map as |nodes|×LpaBytesPerNode
    // BEFORE building it — weigh actual LongMaps with SizeEstimator
    // across power-of-2 capacity boundaries (worst case: n just past a
    // boundary doubles the backing arrays) and assert the constant
    // bounds every one. A small fixed slack covers object headers.
    import org.apache.spark.util.SizeEstimator
    // 4,000,000 = the sf25 graph's node count — the largest measured
    // deployment of the broadcast kernel (footprint depends only on n)
    val sizes =
      Seq(100000, 1 << 17, (1 << 17) + 1, (1 << 18) - 1, 1 << 18, 4000000)
    sizes.foreach { n =>
      val rows = Array.tabulate(n)(i => (i.toLong, (i % 97).toLong))
      val measured = SizeEstimator.estimate(GraphOps.buildLabelMap(rows))
      info(f"n=$n%8d measured=$measured%11d B perNode=${
        measured.toDouble / n}%6.2f (gate ${GraphOps.LpaBytesPerNode})")
      assert(measured <= n * GraphOps.LpaBytesPerNode + 4096,
        f"label map weighs ${measured.toDouble / n}%.2f B/node at n=$n, " +
          s"above the ${GraphOps.LpaBytesPerNode} B/node gate estimate")
    }
  }
}
