package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe: what does an N-task trivial stage cost on this box?
  * Times `spark.range(0, n, 1, n).selectExpr("sum(id)")` (n tasks, ~no
  * data) and a 2-stage shuffle variant, at several widths, 5 reps each.
  * Usage: runMain graft.tools.TaskOverheadProbe
  */
object TaskOverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    for (w <- Seq(1, 4, 8, 16, 32); rep <- 1 to 5) {
      val t0 = System.nanoTime()
      spark.range(0, 100L * w, 1, w).selectExpr("sum(id)").collect()
      val oneStage = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime()
      spark.range(0, 100L * w, 1, w).selectExpr("id % 7 as k", "id")
        .groupBy("k").count().collect()
      val twoStage = (System.nanoTime() - t1) / 1e6
      println(f"WIDTH $w%2d rep $rep: 1stage=${oneStage}%7.1f ms  2stage(shuffle)=${twoStage}%7.1f ms")
    }
    spark.stop()
  }
}
