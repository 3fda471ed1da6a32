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

}
