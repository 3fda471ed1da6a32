package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet, one file per table. At 100 TB these would be
  * multi-file partitioned datasets; nothing here assumes a single file — the
  * paths are directories/globs as far as Spark is concerned.
  */
object Tables {
  /** `events.ts` surfaces as int64 EPOCH-NANOS LongType regardless of the
    * physical parquet type: arithmetic on int64 is exactly reproducible
    * across engines (the DuckDB oracles use `epoch_us(ts::TIMESTAMP) *
    * 1000`), and it avoids a lossy cast in every downstream op. Two
    * physical encodings exist in the wild here: INT64 TIMESTAMP(NANOS)
    * (pre-r6 testdata; needs the legacy flag to read at all, already
    * nanos) and TIMESTAMP(MICROS) without timezone (r6 testdata; Spark
    * reads TIMESTAMP_NTZ — converted to nanos via `unix_micros · 1000`,
    * interpreting the naive value in the session timezone, which every
    * entry point pins to UTC exactly like DuckDB's naive `epoch_us`).
    * Values are µs-truncated either way, so the two encodings yield
    * byte-identical nanos.
    */
  val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set(NanosFlag, "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == LongType) df
      else df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    } else spark.read.parquet(s"$sfDir/$name.parquet")
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
