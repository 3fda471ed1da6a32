package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{CurationPipeline, Dedup}

/** The corpus SINK: materialize the curated training corpus the report
  * operators only describe. Every stage is a proven gate component —
  * this object just composes them write-side, the way the chess pipeline
  * composes ingest → enrich → publish:
  *
  *  1. document-level funnel (q100's [[CurationPipeline.survivorFlags]]):
  *     train split, exact-dedup keeper, near-dup keeper, quality gate,
  *     benchmark decontamination — keep the `s4` survivors;
  *  2. span-level hygiene (q171's cut pass) over the SURVIVOR corpus:
  *     remove every repeated passage the survivor set still carries
  *     (document-level dedup cannot see cross-document boilerplate);
  *     documents cut to empty are dropped, counted in the stats;
  *  3. partitioned parquet publish (`source=<s>/` layout — the
  *     catalog-sized partition key; lang stays a column: 1000 sources ×
  *     20 langs as directories would shatter the layout into small
  *     files) with one `repartition` per source for bounded file counts
  *     (the S8 discipline).
  *
  * Returns the 1-row build manifest (raw/survivor/written counts, token
  * accounting) — the numbers a dataset card (q149) starts from. Runs
  * `runMain graft.pipeline.CorpusBuildMain <sfDir> <outDir>`.
  *
  * Scale shape: survivor selection is the funnel's own audited plan; the
  * span cut adds q171's narrow join; the write is one shuffle keyed by
  * source. Nothing here introduces a new exchange class.
  */
object CorpusBuild {

  def run(spark: SparkSession, sfDir: String, outDir: String): DataFrame = {
    val flags = CurationPipeline.survivorFlags(spark, sfDir)
    val nRaw = flags.count()
    val survivors = flags.filter(col("s4"))
      .select(col("doc_id"), col("source"), col("lang"))
    val docs = graft.Tables.documents(spark, sfDir)
      .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi")
    // span-level cut over the survivor corpus only: intervals computed on
    // what will actually ship, so passages repeated solely between a
    // survivor and an already-dropped duplicate do not trigger cuts
    val cleaned = Dedup.cutPassagesDf(docs)
    val out = cleaned
      .filter(col("n_tokens_kept") > 0)
      .join(survivors, Seq("doc_id"))
      .select(col("doc_id"), col("clean_text").as("text"), col("lang"),
        col("source"), length(col("clean_text")).as("n_chars"),
        col("n_tokens_kept"), col("n_tokens_cut"))
    out
      .repartition(col("source"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("source")
      .parquet(outDir)

    // manifest from the WRITTEN files (read-back, not the lazy plan) so
    // the stats row can never disagree with the artifact on disk
    val written = spark.read.parquet(outDir)
    val agg = written.agg(
      count(lit(1)).as("n_written"),
      sum(col("n_tokens_kept")).as("tokens_kept"),
      sum(col("n_tokens_cut")).as("tokens_cut")).head()
    val nSurvivors = survivors.count()
    import spark.implicits._
    Seq((nRaw, nSurvivors, agg.getLong(0), nSurvivors - agg.getLong(0),
      agg.getLong(1), agg.getLong(2)))
      .toDF("n_raw", "n_survivors", "n_written", "n_cut_to_empty",
        "tokens_kept", "tokens_cut")
  }
}

object CorpusBuildMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CorpusBuildMain <sfDir> <outDir>")
    val spark = graft.functions.chess.session("graft-corpus-build",
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("WARN")
    CorpusBuild.run(spark, args(0), args(1)).show(truncate = false)
    spark.stop()
  }
}
