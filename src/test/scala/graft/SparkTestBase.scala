package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local session for Spark-touching specs (one JVM-wide session —
  * getOrCreate reuses it across suites, keeping `sbt test` fast).
  */
trait SparkTestBase { self: Suite =>
  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  lazy val session: SparkSession = {
    // core (non-SQL) conf — must be on the SparkConf BEFORE the context
    // starts, and SparkConf loads spark.* system properties: lets the
    // ContextCleaner delete reliable-checkpoint files once their RDD is
    // garbage-collected (the CheckpointingSpec lifecycle proof; inert
    // for every other suite — nothing else GCs checkpointed frames)
    System.setProperty(
      "spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    val s = graft.functions.chess.session("graft-test", "local[4]")
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
