package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet, one file per table. At 100 TB these would be
  * multi-file partitioned datasets; nothing here assumes a single file — the
  * paths are directories/globs as far as Spark is concerned.
  */
object Tables {
  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS) which Spark only reads
    * with the legacy flag, surfacing it as epoch-nanos LongType. We keep it
    * as integer nanos end-to-end: arithmetic on int64 is exactly
    * reproducible across engines (the DuckDB oracle uses epoch_ns), and it
    * avoids a lossy cast in the scan.
    */
  val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") spark.conf.set(NanosFlag, "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
