package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{FunctionOps, SamplingOps}

class SamplingOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("quotaSample: exactly min(quota, group size) rows per language") {
    val sizes = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SamplingOps.quotaSample(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == sizes.keySet)
    kept.foreach { case (lang, n) =>
      assert(n == math.min(SamplingOps.QuotaK.toLong, sizes(lang)),
        s"$lang: kept $n of ${sizes(lang)}")
    }
    // map-side bounded: the plan is aggregation-shaped, not a window sort
    val plan = SamplingOps.quotaSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "quota sampling must not plan a window")
  }

  test("packSequences: packs are contiguous, conserve docs, and respect capacity") {
    import org.apache.spark.sql.functions._
    val packs = SamplingOps.packSequences(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables.documents(spark, sf)
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxDocTok = docs
      .select(size(graft.ops.Portable.toks(col("text"))).cast("long").as("n"))
      .agg(max(col("n"))).head().getLong(0)
    packs.groupBy(_._1).foreach { case (source, ps) =>
      val ids = ps.map(_._2).sorted
      assert(ids.head == 0 && ids.zip(ids.tail).forall { case (a, b) => b == a + 1 },
        s"$source: pack ids not contiguous: ${ids.take(10).mkString(",")}")
      assert(ps.map(_._3).sum == perSource(source),
        s"$source: packing lost/duplicated documents")
      // a pack holds the docs whose START offset falls inside it, so its
      // token total is < PackLen + the last doc's own length
      ps.foreach { case (_, id, _, tok) =>
        assert(tok < SamplingOps.PackLen + maxDocTok,
          s"$source pack $id: $tok tokens exceeds capacity bound")
      }
    }
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
