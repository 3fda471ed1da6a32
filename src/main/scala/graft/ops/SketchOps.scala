package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableHash

/** Fixed-size frequency sketches over the `documents` token stream.
  *
  * q56 ships the engine-native estimators (HLL++/percentile sketches,
  * rows-only by design); this file adds the sketch the streaming/telemetry
  * side of a training-data pipeline actually maintains by hand — a
  * count-min sketch (Cormode & Muthukrishnan 2005) — in a form the DuckDB
  * oracle can replay EXACTLY, because the hash family is the repo's
  * portable md5-derived one rather than an engine-private hash. That makes
  * this the first sketch gate query with a full hash-match oracle: the
  * sketch content, the estimates, and the per-key error are all
  * deterministic functions of the corpus.
  *
  * Scale shape (the whole point of a CMS at 100 TB): the sketch is a
  * [[CmsDepth]]×[[CmsWidth]] integer grid built by ONE map-side-combinable
  * hash aggregation over the token stream — the shuffle carries at most
  * d·w partial cells per task regardless of corpus size, and the grid is
  * the only state a streaming ingest would checkpoint. The exact counts
  * computed next to it here are the AUDIT side (the q150 estimator-error
  * discipline): at production scale you keep the grid and drop the exact
  * pass, and this operator is the measurement that tells you what that
  * trade costs — per heavy key, the overestimate the grid would have
  * reported.
  *
  * Width is deliberately set BELOW the corpus vocabulary (~31 distinct
  * terms at every SF; width 16) so collisions — and therefore nonzero
  * overestimates — actually occur at gate scale and the audit
  * discriminates; a production deployment sizes w ≈ e/ε for target error
  * ε·N and keeps the identical plan (the knob is data, not code).
  */
object SketchOps {

  /** Sketch depth (independent hash rows) — pairwise-independent family
    * a·h+b mod P reusing the MinHash parameter schedule
    * ([[PortableHash.HashParams]]), so both engines derive identical cells.
    */
  val CmsDepth = 4

  /** Sketch width (buckets per row). */
  val CmsWidth = 16

  /** Heavy-hitter threshold φ: keys with exact count ≥ φ·N are audited —
    * scale-free, so the candidate set is meaningful at every SF.
    */
  val CmsPhi = 0.01

  private val P = PortableHash.P
  private val Params: Seq[(Long, Long)] = PortableHash.HashParams.take(CmsDepth)

  /** Bucket of hash-value column `h` in sketch row `i` (identical formula
    * interpolated into the oracle SQL; width defaults to the gate constant,
    * parameterized for the ModeBench sizing sweep).
    */
  private def bucketCol(h: Column, i: Int, width: Int = CmsWidth): Column = {
    val (a, b) = Params(i)
    (h * a + b) % P % width
  }

  /** Driver-side twin of [[bucketCol]] — shared with the streaming grid
    * maintenance (graft.streaming) so batch and stream derive identical
    * cells from one formula.
    */
  def bucketOf(h: Long, i: Int): Long = {
    val (a, b) = Params(i)
    ((h * a + b) % P) % CmsWidth
  }

  /** The d-cell expansion of one term hash (streaming ingest path). */
  def cellsOf(h: Long): Seq[(Int, Long)] =
    Params.indices.map(i => (i, bucketOf(h, i)))

  /** q177: count-min-sketch heavy-hitter audit — per heavy term (exact
    * count ≥ φ·N), the exact count, the CMS estimate (min over depth rows
    * of the term's cell counts), and the overestimate. `n_est ≥ n_exact`
    * always (the CMS one-sided-error guarantee); SketchOpsSpec asserts the
    * invariant and the ε·N error bound on top of the oracle hash match.
    */
  def cmsHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    cmsAudit(spark, sfDir, CmsWidth)

  /** Lower-cased whitespace terms of the documents corpus. */
  private def termsOf(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(Portable.toks(col("text"))).as("tok"))
      .select(lower(col("tok")).as("term"))

  /** The batch-built grid (d, bucket, cnt) — ONE map-side-combinable hash
    * aggregation; also the reference the streaming maintenance
    * (graft.streaming CMS cells) is spec-compared against.
    */
  def sketchCells(spark: SparkSession, sfDir: String): DataFrame =
    sketchCellsAt(spark, sfDir, CmsWidth)

  private def sketchCellsAt(spark: SparkSession, sfDir: String, width: Int): DataFrame = {
    val hashed = termsOf(spark, sfDir)
      .select(col("term"), Portable.h32(col("term")).as("h"))
    hashed.select(posexplode(
      array(Params.indices.map(i => bucketCol(col("h"), i, width)): _*)).as(Seq("d", "bucket")))
      .groupBy(col("d"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** The audit at an arbitrary width — the gate query runs it at
    * [[CmsWidth]]; ModeBench sweeps widths to publish the measured
    * error-vs-memory curve behind the "size w ≈ e/ε" sizing rule.
    */
  def cmsAudit(spark: SparkSession, sfDir: String, width: Int): DataFrame = {
    val toks = termsOf(spark, sfDir)
    val hashed = toks.select(col("term"), Portable.h32(col("term")).as("h"))

    // the sketch: one hash aggregation over d cells per token; ≤ d·w rows
    val sketch = sketchCellsAt(spark, sfDir, width)

    // the audit side: exact counts + corpus total (dropped at production
    // scale — the grid above is the retained state)
    val exact = hashed.groupBy(col("term"))
      .agg(count(lit(1)).as("n_exact"), first(col("h")).as("h"))
    val total = toks.agg(count(lit(1)).as("total"))
    val cand = exact.crossJoin(broadcast(total))
      .filter(col("n_exact").cast("double") >= col("total").cast("double") * CmsPhi)

    // estimate = min over depth rows; the sketch is ≤ d·w rows → broadcast
    cand.select(col("term"), col("n_exact"), posexplode(
        array(Params.indices.map(i => bucketCol(col("h"), i, width)): _*)).as(Seq("d", "bucket")))
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy(col("term"))
      .agg(first(col("n_exact")).as("n_exact"), min(col("cnt")).as("n_est"))
      .select(col("term"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("n_over"))
  }

  val cmsHeavyHittersSql: String = {
    val h32 = Portable.h32Sql("term")
    def bucketSql(h: String, i: Int): String = {
      val (a, b) = Params(i)
      s"((($h) * $a + $b) % $P) % $CmsWidth"
    }
    val cellRows = Params.indices.map { i =>
      s"SELECT ${i}::INT AS d, ${bucketSql("h", i)} AS bucket FROM h"
    }.mkString("\n       UNION ALL ")
    val candRows = Params.indices.map { i =>
      s"SELECT term, n_exact, ${i}::INT AS d, ${bucketSql("h", i)} AS bucket FROM cand"
    }.mkString("\n       UNION ALL ")
    s"""WITH toks AS (
       |  SELECT lower(unnest(${Portable.toksSql})) AS term FROM documents),
       |h AS (SELECT term, $h32 AS h FROM toks),
       |cells AS (
       |  $cellRows),
       |sketch AS (SELECT d, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
       |exact AS (
       |  SELECT term, any_value(h) AS h, count(*) AS n_exact FROM h GROUP BY 1),
       |tot AS (SELECT count(*) AS total FROM toks),
       |cand AS (
       |  SELECT term, h, n_exact FROM exact, tot
       |  WHERE n_exact::DOUBLE >= total::DOUBLE * $CmsPhi),
       |cb AS (
       |  $candRows),
       |est AS (
       |  SELECT cb.term, cb.n_exact, min(s.cnt) AS n_est
       |  FROM cb JOIN sketch s USING (d, bucket) GROUP BY 1, 2)
       |SELECT term, n_exact::BIGINT AS n_exact, n_est::BIGINT AS n_est,
       |       (n_est - n_exact)::BIGINT AS n_over
       |FROM est""".stripMargin
  }
}
