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

  test("quotaSample: exactly min(quota, group size) rows per language") {
    import org.apache.spark.sql.functions.col
    val sizes = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = graft.ops.SamplingOps.quotaSample(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == sizes.keySet)
    kept.foreach { case (lang, n) =>
      assert(n == math.min(graft.ops.SamplingOps.QuotaK.toLong, sizes(lang)),
        s"$lang: kept $n of ${sizes(lang)}")
    }
    // map-side bounded: the plan is aggregation-shaped, not a window sort
    val plan = graft.ops.SamplingOps.quotaSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "quota sampling must not plan a window")
  }

  test("winsorize: mean lands inside the cut interval, clamp rate ≈ 10%") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val counts = orders.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    FunctionOps.winsorize(spark, sf).collect().foreach { r =>
      val (prio, p05, p95) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val wAvg = r.getDouble(3)
      assert(p05 <= wAvg && wAvg <= p95, s"$prio: mean $wAvg outside cuts")
      // ~5% clamp on each tail; allow slack for small groups + ties
      assert(r.getLong(4) <= math.ceil(counts(prio) * 0.15).toLong,
        s"$prio: clamped ${r.getLong(4)} of ${counts(prio)}")
    }
  }
}
