package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, materializing full results through the `noop` sink
  * (count() would let Catalyst prune projections and under-measure), and
  * prints ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // a crashed query must not read as a speedup: mark it -1 in the per-query
    // map, list it in failed[], and exit nonzero
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // apples-to-apples vs the frozen round-1 baseline (48 queries): the
    // suite keeps growing, so also report the subtotal of q01-q48
    val baseline48 = results.collect {
      case (k, v, true)
          if k.drop(1).takeWhile(_.isDigit).toIntOption.exists(_ <= 48) => v
    }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"baseline48":$baseline48,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
