package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dataset-splitting and sampling operators for training-data pipelines —
  * all driven by the portable md5-hex32 hash so assignment is a pure
  * function of the row (reproducible across engines, runs, and cluster
  * sizes; no RNG state, no ordering dependence).
  */
object SamplingOps {

  private def h32(c: Column): Column = Portable.h32(c)
  private def h32Sql(x: String) = Portable.h32Sql(x)

  val TrainPct = 80
  val ValPct = 10 // test = rest

  /** q39: deterministic train/val/test split — bucket = hash(doc_id) mod
    * 100. A narrow map: no shuffle, no RNG, stable under repartitioning.
    */
  def trainSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = pmod(h32(concat(lit("split_"), col("doc_id"))), lit(100))
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      when(bucket < TrainPct, "train")
        .when(bucket < TrainPct + ValPct, "val")
        .otherwise("test").as("split"))
  }

  val trainSplitSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN ${h32Sql("'split_' || doc_id")} % 100 < $TrainPct THEN 'train'
       |       WHEN ${h32Sql("'split_' || doc_id")} % 100 < ${TrainPct + ValPct} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin

  /** q40: stratified downsample — keep ~50% of each language stratum,
    * chosen by row hash (deterministic "coin flip" per row, stratified
    * reporting). Demonstrates class-balanced corpus construction.
    */
  val KeepPct = 50

  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val keep = pmod(h32(concat(lit("samp_"), col("doc_id"))), lit(100)) < KeepPct
    Tables.documents(spark, sfDir)
      .filter(keep)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
  }

  val stratifiedSampleSql: String =
    s"""SELECT lang, count(*) AS n_kept
       |FROM documents
       |WHERE ${h32Sql("'samp_' || doc_id")} % 100 < $KeepPct
       |GROUP BY 1""".stripMargin
}
