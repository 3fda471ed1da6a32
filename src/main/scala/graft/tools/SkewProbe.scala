package graft.tools

import graft.ops.{PackingOps, ScaleOps}

/** Standalone mega-source crossover probe for the quota strategy
  * triangle at sizes too large for ModeBench's inline `quota_skew`
  * sweep (which runs [[PackingOps.skewedScoredFrame]] at 5M rows every
  * ModeBench invocation): `runMain graft.tools.SkewProbe [nRows]`.
  * BASELINE/README quote its 50M/100M walls; the frame is the SAME
  * generator as the sweep's, so the points are comparable.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val spark = graft.functions.chess.session("skewprobe", "local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    def skewed = PackingOps.skewedScoredFrame(spark, n)
    for ((name, mk) <- Seq(
      "window" -> (() => PackingOps.sourceQuotaDf(skewed)),
      "grid" -> (() => PackingOps.rangedSourceQuotaDf(skewed)),
      "heap" -> (() => ScaleOps.topKPerGroup(skewed,
        "source", "quality", "doc_id", PackingOps.QuotaK)))) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      println(f"$name%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
