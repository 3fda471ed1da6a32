package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Optimization-round measurement harness (guide §1): for each named query
  * (or all), dump the `.explain("formatted")` plan to a file and — when
  * `run` is requested — execute it cold+warm through the noop sink with a
  * listener counting jobs / stages / tasks and summing task time, so the
  * wall-vs-schedule split reads directly off the output.
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> <planOutDir> [suffix]
  *          [run=q135,q273|run=all] [q01,q02 restrict]
  * Plans are written as <planOutDir>/<query>_<suffix>.txt (suffix defaults
  * to "before"). Never touches bench_full.json.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args.lift(2).getOrElse("before")
    val runSet: Option[Set[String]] = args.lift(3).collect {
      case s if s.startsWith("run=") => s.drop(4).split(",").toSet
    }
    val restrict: Option[Set[String]] = args.lift(4).map(_.split(",").toSet)
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
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val taskMs = new AtomicLong
    val stageDetail = sys.env.get("GRAFT_PROFILE_STAGES").isDefined
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (stageDetail) {
          val si = s.stageInfo
          val m = si.taskMetrics
          println(f"  STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"run=${m.executorRunTime}%7d cpu=${m.executorCpuTime / 1000000}%7d " +
            f"gc=${m.jvmGCTime}%5d deser=${m.executorDeserializeTime}%6d " +
            f"fetchwait=${m.shuffleReadMetrics.fetchWaitTime}%5d " +
            si.name.take(70))
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    new java.io.File(outDir).mkdirs()
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        restrict.forall(s => s.contains(n.takeWhile(_ != '_')) || s.contains(n)) }
    qs.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
        try w.println(plan) finally w.close()
        val exchanges = plan.linesIterator.count(_.contains("Exchange"))
        val doRun = runSet.exists(s =>
          s.contains("all") || s.contains(name) || s.contains(name.takeWhile(_ != '_')))
        if (doRun) {
          org.apache.spark.graft.ListenerBusBridge.drain(spark.sparkContext)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val cold = (System.nanoTime() - t0) / 1e9
          org.apache.spark.graft.ListenerBusBridge.drain(spark.sparkContext)
          val (j0, s0, k0, m0) = (jobs.get, stages.get, tasks.get, taskMs.get)
          val t1 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val warm = (System.nanoTime() - t1) / 1e9
          org.apache.spark.graft.ListenerBusBridge.drain(spark.sparkContext)
          println(f"PROFILE $name%-28s cold=$cold%6.2f warm=$warm%6.2f " +
            f"jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d " +
            f"tasks=${tasks.get - k0}%5d taskms=${taskMs.get - m0}%7d xchg=$exchanges%2d")
        } else println(f"PLAN    $name%-28s xchg=$exchanges%2d")
      } catch { case e: Throwable =>
        println(s"FAIL    $name ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
