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

  /** Training-sequence capacity for q83 (tokens per packed sequence). */
  val PackLen = 256L

  /** q83: sequence packing — assign documents to fixed-capacity training
    * sequences ("packs") by running token offset: a document goes to the
    * pack its start offset falls in (`pack_id = start_offset div PackLen`),
    * the standard contiguous-packing layout an LLM data loader consumes.
    * Output: per (source, pack) document count and token total.
    *
    * Scale shape: the running sum is a window partitioned by `source`, so
    * packing parallelizes across sources/shards — the 100 TB layout packs
    * within hash-bucketed shards (each a few GB), never a single global
    * ordered window; this op IS that per-shard kernel (`source` = the
    * shard key). Exact integer math end-to-end: `cum` is a BIGINT running
    * sum and `div` is integral division, so pack boundaries are
    * bit-identical on any engine at any magnitude (no double rounding).
    */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(Portable.toks(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tok) div $PackLen"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"))
  }

  val packSequencesSql: String =
    s"""WITH t AS (SELECT source, doc_id,
       |             len(${Portable.toksSql})::BIGINT AS n_tok
       |           FROM documents),
       |c AS (SELECT source, n_tok,
       |        sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM t)
       |SELECT source, ((cum - n_tok) // $PackLen)::BIGINT AS pack_id,
       |       count(*) AS n_docs, sum(n_tok)::BIGINT AS tok_total
       |FROM c GROUP BY 1, 2""".stripMargin

  /** q84: temperature-style source mixing — per-source keep rate
    * ∝ n^(α−1) with α = ½, i.e. `rate_s = min(1, C/√n_s)`: small sources
    * are kept whole, large sources are downsampled toward √n — the
    * standard corpus-mixing move that stops one giant crawl from drowning
    * the curated sources. Deliberately per-source math (no cross-source
    * normalization): a sum of irrationals over an unordered group would be
    * summation-order-dependent and flake parity at the accept boundary;
    * `C/√n` keeps every quantity a deterministic function of one group.
    *
    * The accept test is integer-exact: threshold = rate in ppm (floor-
    * rounded once), accept when `h32(doc) mod 1e6 < threshold` — the same
    * portable-hash coin as q39/q40, reproducible across engines and
    * cluster layouts. Rates (tiny, one row per source) broadcast onto the
    * fact scan; the only fact shuffle is the final per-source count.
    */
  val MixC = 30.0

  def temperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val th = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("thresh_ppm",
        floor(least(lit(1.0), lit(MixC) / sqrt(col("n_docs").cast("double")))
          * 1000000.0 + 0.5).cast("long"))
    val kept = docs
      .select(col("source"),
        pmod(h32(concat(lit("mix_"), col("doc_id"))), lit(1000000L)).as("u"))
      .join(broadcast(th.select(col("source"), col("thresh_ppm"))), "source")
      .filter(col("u") < col("thresh_ppm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
    th.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("thresh_ppm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** q90: exact per-group quota sampling — EXACTLY min(quota, |group|)
    * documents per language, selected by the portable hash coin (so the
    * subset is a pure function of the data — reproducible across engines,
    * runs, and partitionings). Rate-based sampling (q40/q84) only hits a
    * quota in expectation; balanced-subset curation (eval sets, per-lang
    * fine-tuning mixes) needs the exact count. Reuses the bounded
    * [[ScaleOps.TopKAggregator]]: map-side partials keep ≤ quota rows per
    * group per partition, so the shuffle moves O(groups × quota), never
    * the corpus — the window row_number() form the oracle uses would
    * shuffle+sort every row.
    */
  val QuotaK = 50

  def quotaSample(spark: SparkSession, sfDir: String): DataFrame = {
    val u = pmod(h32(concat(lit("quota_"), col("doc_id"))), lit(1000000L))
    val scored = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        // TopKAggregator keeps the LARGEST (score, then smaller id):
        // negate the coin so "largest" = smallest u — equivalent to the
        // oracle's ORDER BY u ASC, doc_id ASC
        (-u).cast("double").as("neg_u"))
    ScaleOps.topKPerGroup(scored, "lang", "neg_u", "doc_id", QuotaK)
      .select(col("lang"), col("doc_id"), col("rank"))
  }

  val quotaSampleSql: String =
    s"""SELECT lang, doc_id, rank::INT AS rank FROM (
       |  SELECT lang, doc_id,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY ${h32Sql("'quota_' || doc_id")} % 1000000 ASC,
       |                    doc_id ASC) AS rank
       |  FROM documents)
       |WHERE rank <= $QuotaK""".stripMargin

  // ------------------------------------------ q110 weighted sampling (A-ES)

  /** Per-source sample size for the weighted draw. */
  val WSampleK = 25

  /** q110: weighted sampling without replacement — per source, draw
    * [[WSampleK]] documents with inclusion probability ∝ token count, via
    * the Efraimidis–Spirakis exponential-sort: key = ln(u)/w with u a
    * deterministic per-row uniform from the portable hash coin, take the K
    * largest keys. The standard corpus-construction draw when "sample 1%
    * of tokens, not 1% of documents" is the requirement (long documents
    * carry more of the training signal).
    *
    * Determinism/parity: u is an exact integer in (0, 1e6] scaled once, w
    * an exact token count, and the key is r4-rounded before comparison on
    * BOTH engines with doc_id as the total tie-break — identical doubles,
    * identical order. Scale shape: reuses the bounded
    * [[ScaleOps.TopKAggregator]] — map-side partials keep ≤ K rows per
    * source per partition, shuffle O(sources × K), never the corpus (the
    * oracle's window form would sort every row).
    */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val u = (pmod(h32(concat(lit("wsamp_"), col("doc_id"))), lit(1000000L)) + 1L)
      .cast("double") / 1000000.0
    val w = greatest(size(Portable.toks(col("text"))), lit(1)).cast("double")
    val scored = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        Portable.r4(log(u) / w).as("es_key"))
    ScaleOps.topKPerGroup(scored, "source", "es_key", "doc_id", WSampleK)
      .select(col("source"), col("doc_id"), col("es_key"), col("rank"))
  }

  val weightedSampleSql: String = {
    val u = s"((${h32Sql("'wsamp_' || doc_id")} % 1000000 + 1)::DOUBLE / 1000000.0)"
    val w = s"greatest(len(${Portable.toksSql}), 1)::DOUBLE"
    s"""SELECT source, doc_id, es_key, rank::INT AS rank FROM (
       |  SELECT source, doc_id,
       |         ${Portable.r4Sql(s"ln($u) / $w")} AS es_key,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY ${Portable.r4Sql(s"ln($u) / $w")} DESC,
       |                    doc_id ASC) AS rank
       |  FROM documents)
       |WHERE rank <= $WSampleK""".stripMargin
  }

  val temperatureMixSql: String =
    s"""WITH th AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |         floor(least(1.0, $MixC / sqrt(count(*)::DOUBLE))
       |               * 1000000.0 + 0.5)::BIGINT AS thresh_ppm
       |  FROM documents GROUP BY 1),
       |kept AS (
       |  SELECT d.source, count(*)::BIGINT AS n_kept
       |  FROM documents d JOIN th USING (source)
       |  WHERE ${h32Sql("'mix_' || doc_id")} % 1000000 < thresh_ppm
       |  GROUP BY 1)
       |SELECT source, n_docs, thresh_ppm, coalesce(n_kept, 0) AS n_kept
       |FROM th LEFT JOIN kept USING (source)""".stripMargin
}
