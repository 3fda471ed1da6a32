package graft.tools
import org.apache.spark.sql.functions._
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val spark = graft.functions.chess.session("skewprobe", "local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    def skewed = spark.range(n).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(5L)) =!= 0L, lit("mega"))
        .otherwise(concat(lit("s"), pmod(col("id"), lit(64L)))).as("source"),
      (pmod(col("id") * 2654435761L, lit(10000L)).cast("double") / 10000.0)
        .as("quality"))
    for ((name, mk) <- Seq(
      "window" -> (() => graft.ops.PackingOps.sourceQuotaDf(skewed)),
      "grid" -> (() => graft.ops.PackingOps.rangedSourceQuotaDf(skewed)),
      "heap" -> (() => graft.ops.ScaleOps.topKPerGroup(skewed, "source", "quality", "doc_id", 20)))) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      println(f"$name%-8s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
