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
    val s = graft.functions.chess.session("graft-test", "local[4]")
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
