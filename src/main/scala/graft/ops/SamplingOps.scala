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

  /** The q39 split expression over a doc_id column (shared by q131's
    * audit so it audits the ACTUAL splitter, not a copy).
    */
  private[ops] def splitCol(docId: Column): Column = {
    val bucket = pmod(h32(concat(lit("split_"), docId)), lit(100))
    when(bucket < TrainPct, "train")
      .when(bucket < TrainPct + ValPct, "val")
      .otherwise("test")
  }
  private[ops] def splitColSql: String = splitColSqlFor("doc_id")
  private[ops] def splitColSqlFor(idCol: String): String =
    s"""CASE WHEN ${h32Sql(s"'split_' || $idCol")} % 100 < $TrainPct THEN 'train'
       |     WHEN ${h32Sql(s"'split_' || $idCol")} % 100 < ${TrainPct + ValPct} THEN 'val'
       |     ELSE 'test' END""".stripMargin

  // ------------------------------------------------ q131 split balance

  /** Fixed-point scale for the chi-square terms (the q109/q124 regime). */
  val ChiScale = 1000000000L

  /** q131: split-balance audit — per split, the chi-square goodness-of-fit
    * statistic of its language composition against the corpus-wide
    * proportions. A hash splitter (q39) is unbiased in expectation, but
    * any given corpus can land a skewed fold — this is the check a
    * pipeline runs BEFORE training to catch a val set that
    * under-represents a language. Complements q120/q124: those compare
    * two samples on a numeric column; this tests one categorical
    * composition against its expectation.
    *
    * Parity: observed counts and margins are exact integers; expected =
    * n_split·n_lang/N and each (obs−exp)²/exp term are identical doubles
    * on both engines, floor-scaled to integer [[ChiScale]]ths before the
    * per-split sum (never an unordered float sum). Convention shared
    * with the oracle: terms exist only for OBSERVED (split, lang) cells
    * — a lang completely absent from a split omits its exp term, mildly
    * understating chi² (both engines agree; a zero-filled grid would
    * need a |splits|×|langs| spine join for the same audit signal).
    * Scale shape: one hash agg to the (split, lang) grid + two margin
    * aggs broadcast back — grid size = |splits|·|langs| at any corpus
    * size.
    */
  def splitBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val obs = Tables.documents(spark, sfDir)
      .select(splitCol(col("doc_id")).as("split"), col("lang"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("obs"))
    val bySplit = obs.groupBy(col("split")).agg(sum(col("obs")).as("n_split"))
    val byLang = obs.groupBy(col("lang")).agg(sum(col("obs")).as("n_lang"))
    val total = obs.agg(sum(col("obs")).as("n")).crossJoin(
      byLang.agg(count(lit(1)).as("n_langs")))
    val exp = col("n_split").cast("double") * col("n_lang") / col("n")
    val term = (col("obs") - exp) * (col("obs") - exp) / exp
    obs
      .join(broadcast(bySplit), "split")
      .join(broadcast(byLang), "lang")
      .crossJoin(broadcast(total))
      .select(col("split"), col("n_split"), col("n_langs"),
        floor(term * ChiScale + 0.5).cast("long").as("ti"))
      .groupBy(col("split"))
      .agg(
        max(col("n_split")).as("n_docs"),
        (max(col("n_langs")) - 1).cast("int").as("df"),
        Portable.r4(sum(col("ti")).cast("double") / ChiScale).as("chi2"))
  }

  val splitBalanceSql: String =
    s"""WITH s AS (SELECT doc_id, ($splitColSql) AS split, lang FROM documents),
       |obs AS (SELECT split, lang, count(*) AS obs FROM s GROUP BY 1, 2),
       |m1 AS (SELECT split, sum(obs)::BIGINT AS n_split FROM obs GROUP BY 1),
       |m2 AS (SELECT lang, sum(obs)::BIGINT AS n_lang FROM obs GROUP BY 1),
       |t AS (SELECT (SELECT sum(obs) FROM obs)::BIGINT AS n,
       |             (SELECT count(*) FROM m2) AS n_langs),
       |terms AS (
       |  SELECT o.split, m1.n_split, t.n_langs,
       |         floor((o.obs - m1.n_split::DOUBLE * m2.n_lang / t.n)
       |               * (o.obs - m1.n_split::DOUBLE * m2.n_lang / t.n)
       |               / (m1.n_split::DOUBLE * m2.n_lang / t.n)
       |               * $ChiScale + 0.5)::BIGINT AS ti
       |  FROM obs o JOIN m1 USING (split) JOIN m2 USING (lang) CROSS JOIN t)
       |SELECT split, max(n_split) AS n_docs,
       |       (max(n_langs) - 1)::INT AS df,
       |       ${Portable.r4Sql(s"sum(ti)::DOUBLE / $ChiScale")} AS chi2
       |FROM terms GROUP BY 1""".stripMargin

  // --------------------------------------------- q133 mixture schedule

  /** Token budget for the scheduled mixture and the fixed-point scale for
    * the sqrt weights.
    */
  val MixBudgetTokens = 10000000L
  val MixWeightScale = 1000000L

  /** q133: data-mixture schedule — given per-source token inventories and
    * a total training budget, allocate target tokens per source under a
    * square-root (temperature 0.5) weighting and derive what the loader
    * needs: the sampling rate (target/inventory) and the epoch count
    * (passes over the source, >1 = repetition) per source. This is the
    * arithmetic behind every LLM mixture table ("source X: 2.1 epochs"):
    * sub-linear weighting upweights small/rare sources without letting
    * the largest source swamp the budget — q84 applies such weights by
    * sampling; this PLANS the token-exact schedule.
    *
    * Parity: sqrt is IEEE-correctly-rounded (safe cross-engine, unlike
    * pow), each weight is floor-scaled to integer [[MixWeightScale]]ths,
    * and the allocation `budget·wᵢ/Σw` is pure BIGINT arithmetic — the
    * whole schedule is integer-exact except the final r4 rate. Scale
    * shape: one token-count agg (narrow map + hash agg), then all
    * arithmetic on the |sources|-row table; the 1-row Σw broadcast is the
    * q54/q114 scalar class.
    */
  def mixtureSchedule(spark: SparkSession, sfDir: String): DataFrame = {
    val inv = Tables.documents(spark, sfDir)
      .select(col("source"), size(Portable.toks(col("text"))).cast("long").as("t"))
      .groupBy(col("source"))
      .agg(sum(col("t")).as("n_tokens"))
      .withColumn("w",
        floor(sqrt(col("n_tokens").cast("double")) * MixWeightScale + 0.5)
          .cast("long"))
    val tot = inv.agg(sum(col("w")).as("sw"))
    inv.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        expr(s"($MixBudgetTokens * w) div sw").as("target_tokens"))
      .select(col("source"), col("n_tokens"), col("target_tokens"),
        expr("(target_tokens + n_tokens - 1) div n_tokens").as("epochs"),
        Portable.r4(col("target_tokens").cast("double") / col("n_tokens"))
          .as("rate"))
  }

  val mixtureScheduleSql: String =
    s"""WITH inv AS (
       |  SELECT source, sum(len(${Portable.toksSql}))::BIGINT AS n_tokens
       |  FROM documents GROUP BY 1),
       |w AS (SELECT source, n_tokens,
       |             floor(sqrt(n_tokens::DOUBLE) * $MixWeightScale + 0.5)::BIGINT AS w
       |      FROM inv),
       |t AS (SELECT sum(w)::BIGINT AS sw FROM w),
       |alloc AS (
       |  SELECT source, n_tokens, ($MixBudgetTokens * w) // t.sw AS target_tokens
       |  FROM w CROSS JOIN t)
       |SELECT source, n_tokens, target_tokens,
       |       (target_tokens + n_tokens - 1) // n_tokens AS epochs,
       |       ${Portable.r4Sql("target_tokens::DOUBLE / n_tokens")} AS rate
       |FROM alloc""".stripMargin

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

  // ------------------------------------------------ q158 split leakage

  /** q158: near-duplicate split leakage — the q22 verified near-dup pairs
    * classified by which q39 splits their two members landed in, over the
    * full split-pair frame. Off-diagonal cells ARE evaluation leakage: a
    * test document with a train near-duplicate is memorization measured
    * as generalization. q81 checks exact/shingle contamination against an
    * EXTERNAL eval set; this audits the pipeline's OWN split against its
    * OWN near-dup graph — the check every leaderboard-bound dataset needs
    * (hash-random splits like q39's guarantee nothing about near-dups,
    * which is exactly what the audit shows).
    *
    * Scale shape: the q22 pipeline dominates; the audit adds two
    * broadcast-sized joins of the verified pair set against the split
    * projection and one 6-row rollup over the literal frame.
    */
  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    val splits = Tables.documents(spark, sfDir)
      .select(col("doc_id"), splitCol(col("doc_id")).as("split"))
    val pairs = Dedup.minhashLsh(spark, sfDir)
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .select(
        least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
    val names = Seq("test", "train", "val")
    val frame = names.flatMap(a => names.filter(_ >= a).map(b => (a, b)))
    val frameDf = splits.sparkSession
      .createDataFrame(frame).toDF("split_a", "split_b")
    frameDf.join(pairs, Seq("split_a", "split_b"), "left")
      .select(col("split_a"), col("split_b"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        (col("split_a") =!= col("split_b")).cast("int").as("is_leak"))
  }

  val splitLeakageSql: String = {
    val names = Seq("test", "train", "val")
    val frame = names.flatMap(a => names.filter(_ >= a).map(b => s"('$a', '$b')"))
      .mkString(", ")
    s"""WITH s AS (SELECT doc_id, ($splitColSql) AS split FROM documents),
       |p AS (
       |  SELECT least(a.split, b.split) AS split_a,
       |         greatest(a.split, b.split) AS split_b,
       |         count(*) AS n_pairs
       |  FROM (${graft.ops.Dedup.minhashLshSql}) m
       |  JOIN s a ON a.doc_id = m.doc_a
       |  JOIN s b ON b.doc_id = m.doc_b
       |  GROUP BY 1, 2),
       |frame AS (SELECT * FROM (VALUES $frame) v(split_a, split_b))
       |SELECT f.split_a, f.split_b,
       |       coalesce(p.n_pairs, 0)::BIGINT AS n_pairs,
       |       (f.split_a <> f.split_b)::INT AS is_leak
       |FROM frame f LEFT JOIN p USING (split_a, split_b)""".stripMargin
  }

  // ------------------------------------------------ q192 bootstrap CI

  /** Bootstrap replicate count (a constant: error of the SE estimate
    * shrinks as 1/√B and 32 is the classic cheap-but-stable choice; the
    * replicate dimension multiplies the scan, not the shuffle).
    */
  val BootReplicates = 32

  /** Cumulative Poisson(1) CDF at k = 0..4 — Scala-computed literals
    * inlined into BOTH plans so the weight thresholds are bit-identical
    * doubles on both engines; P(X > 5) ≈ 6·10⁻⁴ truncates to w = 5.
    */
  val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563)

  /** q192: Poisson-bootstrap confidence interval for a corpus metric —
    * the error bars every dataset-card number (q149, q17 means, q143
    * drift scores) should carry but almost never does. Classic bootstrap
    * resampling (sample n rows with replacement, B times) is impossible
    * to coordinate across a 100 TB cluster; the POISSON bootstrap
    * (Chamandy et al., "Estimating uncertainty for massive data
    * streams") replaces it with an independent per-(row, replicate)
    * Poisson(1) weight — embarrassingly parallel, one pass, and here
    * fully DETERMINISTIC: the weight is the inverse-CDF of the portable
    * per-(doc, replicate) hash mapped to [0,1), so both engines (and any
    * re-run, at any partitioning) draw the identical resample. Metric
    * under audit: mean document quality (the q17 kernel).
    *
    * Scale shape: one narrow scan explodes each doc into B=:
    * [[BootReplicates]] (replicate, weight) terms — a ×B map with NO new
    * exchange class: the aggregation keys on the replicate id, so
    * map-side partials collapse every partition to B rows and the
    * shuffle moves B rows per task. Replicate sums stay exact BIGINT
    * (×10⁴-quantized scores × weights ≤ 5); the B replicate means fold
    * IN REPLICATE ORDER inside one collected B-element array (pool
    * discipline — no partition-less window), and sqrt/1.96 arithmetic
    * happens once, r4'd.
    */
  def bootstrapCi(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{aggregate => fold}
    val b = BootReplicates
    val q4 = floor(TextOps.qualityCol(col("text")) * 10000.0 + 0.5)
      .cast("long")
    val u = h32(concat(col("doc_id").cast("string"), lit("_b"), col("rep")))
      .cast("double") / 4294967296.0
    val w = PoissonCdf.zipWithIndex.foldRight(lit(5L): Column) {
      case ((cdf, k), rest) => when(u < cdf, k.toLong).otherwise(rest)
    }
    val terms = Tables.documents(spark, sfDir)
      .select(col("doc_id"), q4.as("q4"))
      .select(col("doc_id"), col("q4"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .select(col("rep"), w.as("w"), col("q4"))
    val reps = terms.groupBy(col("rep"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("q4")).as("swq"))
      .select(col("rep"),
        (col("swq").cast("double") / col("sw").cast("double") / 10000.0)
          .as("m"))
    val pool = reps
      .agg(sort_array(collect_list(struct(col("rep"), col("m")))).as("ms"))
      .select(transform(col("ms"), e => e.getField("m")).as("ms"))
    val point = Tables.documents(spark, sfDir)
      .agg((sum(q4).cast("double") / count(lit(1)).cast("double") / 10000.0)
        .as("point_mean"), count(lit(1)).as("n_docs"))
    val mean = fold(col("ms"), lit(0.0), (a, e) => a + e) / b
    pool.crossJoin(broadcast(point))
      .select(col("n_docs"), lit(b.toLong).as("b"),
        col("point_mean"), mean.as("boot_mean"),
        sqrt(fold(col("ms"), lit(0.0),
          (a, e) => a + (e - mean) * (e - mean)) / (b - 1)).as("se"))
      .select(col("n_docs"), col("b"),
        Portable.r4(col("point_mean")).as("point_mean"),
        Portable.r4(col("boot_mean")).as("boot_mean"),
        Portable.r4(col("se")).as("boot_se"),
        Portable.r4(col("boot_mean") - lit(1.96) * col("se")).as("ci_lo"),
        Portable.r4(col("boot_mean") + lit(1.96) * col("se")).as("ci_hi"))
  }

  val bootstrapCiSql: String = {
    val b = BootReplicates
    val q4 = s"floor((${graft.ops.TextOps.qualitySqlExpr}) * 10000.0 + 0.5)::BIGINT"
    val u = s"${h32Sql("doc_id::VARCHAR || '_b' || rep::VARCHAR")}::DOUBLE / 4294967296.0"
    val w = PoissonCdf.zipWithIndex.foldRight("5") { case ((cdf, k), rest) =>
      s"CASE WHEN u < $cdf THEN $k ELSE $rest END"
    }
    s"""WITH terms AS (
       |  SELECT rep, ($w)::BIGINT AS w, q4 FROM (
       |    SELECT d.doc_id, $q4 AS q4, r.rep, $u AS u
       |    FROM documents d,
       |         (SELECT unnest(range(0, $b)) AS rep) r)),
       |reps AS (
       |  SELECT rep, sum(w)::BIGINT AS sw, sum(w * q4)::BIGINT AS swq
       |  FROM terms GROUP BY 1),
       |pool AS (
       |  SELECT list(swq::DOUBLE / sw::DOUBLE / 10000.0 ORDER BY rep) AS ms
       |  FROM reps),
       |pt AS (
       |  SELECT sum($q4)::DOUBLE / count(*)::DOUBLE / 10000.0 AS point_mean,
       |         count(*)::BIGINT AS n_docs
       |  FROM documents d),
       |s AS (
       |  SELECT n_docs, point_mean,
       |         list_sum(ms) / $b AS boot_mean,
       |         sqrt(list_sum(list_transform(ms,
       |           e -> (e - list_sum(ms) / $b) * (e - list_sum(ms) / $b)))
       |           / ($b - 1)) AS se
       |  FROM pool, pt)
       |SELECT n_docs, $b::BIGINT AS b,
       |       ${Portable.r4Sql("point_mean")} AS point_mean,
       |       ${Portable.r4Sql("boot_mean")} AS boot_mean,
       |       ${Portable.r4Sql("se")} AS boot_se,
       |       ${Portable.r4Sql("boot_mean - 1.96 * se")} AS ci_lo,
       |       ${Portable.r4Sql("boot_mean + 1.96 * se")} AS ci_hi
       |FROM s""".stripMargin
  }

  // ------------------------------------------------ q186 cluster split

  /** q186: near-dup-aware split assignment — the FIX q158's audit
    * motivates: q39 hashes each doc_id independently, so the two members
    * of a near-duplicate pair land in different splits with probability
    * ≈ 2·train·(1−train), and the off-diagonal leakage q158 measures is
    * guaranteed at corpus scale. This operator hashes the document's
    * near-dup CLUSTER representative instead (q57's connected-component
    * label; singletons represent themselves), so an entire duplicate
    * cluster moves to one split as a unit and train/eval near-dup leakage
    * is structurally zero — the split discipline every leaderboard-bound
    * dataset should ship with (and what the audit then proves, see
    * SamplingOpsSpec).
    *
    * Scale shape: the memoized q57 component stack dominates (and is
    * shared with q57/q63/q132 in-session); the assignment itself is one
    * LEFT equi-join of the corpus id projection against the component
    * labels (both sides hash-partitioned on doc_id) plus the same
    * narrow hash-bucket map as q39. Deterministic: assignment is a pure
    * function of the representative id, stable across engines, runs and
    * partitionings.
    */
  def clusterSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val cc = AdvancedOps.dedupClusters(spark, sfDir)
      .select(col("doc_id"), col("component"))
    graft.Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("representative"))
      .select(col("doc_id"), col("representative"),
        splitCol(col("representative")).as("split"))
  }

  val clusterSplitSql: String =
    s"""WITH cc AS (${AdvancedOps.dedupClustersSql.replace("\n", "\n  ")}),
       |rep AS (
       |  SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS representative
       |  FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id)
       |SELECT doc_id, representative,
       |       ${splitColSqlFor("representative").replace("\n", "\n       ")} AS split
       |FROM rep""".stripMargin

  // ------------------------------------------------ q198 DSIR importance

  /** Hashed-unigram feature buckets and the integer scale for per-bucket
    * log-ratios (the KL/PSI discipline: the ln runs once per BUCKET — a
    * fixed 4096-entry table — and every per-document sum is over exact
    * integers).
    */
  val DsirBuckets = 4096
  val DsirScale = 1000000L

  /** q198: DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") — score every raw
    * document by the log-likelihood ratio of its hashed-unigram features
    * under a TARGET unigram model vs the RAW corpus model, with add-1
    * smoothing. The target distribution here is the corpus's own
    * Gopher-pass subset (q137 keep = 1): "make the whole crawl look like
    * the clean slice" — the exact recipe DSIR runs with Wikipedia/books
    * as the target. High logw = target-like; the weights feed
    * importance-weighted sampling (q110) to build the selected corpus.
    *
    * Scale shape: one token explode → pmod-bucket map; bucket counts are
    * two map-side-combinable aggs onto a FIXED 4096-row table; the scoring
    * join is a broadcast of that table back onto the token stream followed
    * by one per-doc integer sum. Nothing scales except the token scan —
    * the model itself is constant-size, which is the entire point of
    * hashed features at 100 TB.
    *
    * Parity: each bucket's log-ratio ln(((ct+1)·(Nr+B)) / ((cr+1)·(Nt+B)))
    * is computed once per bucket on exact counts, floor-quantized to the
    * [[DsirScale]] grid (the q143/q124 class of accepted 1-ulp ln
    * boundaries — ~4096 values total); document weights are then exact
    * BIGINT sums, divided and r4'd only at the output.
    */
  def dsirWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val b = DsirBuckets
    val toks = Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), explode(Portable.toks(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(h32(concat(lit("dsir_"), col("tok"))), lit(b.toLong)).as("bk"))
    val targetIds = CorpusOps.gopherRules(spark, sfDir)
      .filter(col("keep") === 1).select(col("doc_id"))
    // ONE pass builds both models: flag each token row by target
    // membership (left join on the doc spine) and take conditional sums —
    // the q207 discipline; the naive two-aggregation form re-tokenizes
    // and re-explodes the whole corpus a second time
    val stats = toks
      .join(targetIds.withColumn("t", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("bk"))
      .agg(count(lit(1)).as("cr"),
        sum(coalesce(col("t"), lit(0L))).as("ct"))
    val totals = stats.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val model = stats.crossJoin(broadcast(totals))
      .select(col("bk"),
        floor(log(
          ((col("ct") + 1L).cast("double") * (col("nr") + b).cast("double")) /
            ((col("cr") + 1L).cast("double") * (col("nt") + b).cast("double"))) *
          DsirScale.toDouble + 0.5).cast("long").as("v"))
    val weights = toks.join(broadcast(model), Seq("bk"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("v")).as("w"))
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(weights, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        Portable.r4(coalesce(col("w"), lit(0L)).cast("double") /
          DsirScale.toDouble).as("logw"),
        when(coalesce(col("n_tok"), lit(0L)) > 0L,
          Portable.r4(col("w").cast("double") / DsirScale.toDouble /
            col("n_tok").cast("double"))).otherwise(lit(0.0))
          .as("logw_per_tok"))
  }

  val dsirWeightsSql: String = {
    val b = DsirBuckets
    s"""WITH toks AS (
       |  SELECT doc_id, ${h32Sql("'dsir_' || tok")} % $b AS bk
       |  FROM (SELECT doc_id, unnest(${Portable.toksSql}) AS tok
       |        FROM documents)),
       |target AS (SELECT doc_id FROM (${CorpusOps.gopherRulesSql
         .replace("\n", "\n  ")}) WHERE keep = 1),
       |raw AS (SELECT bk, count(*)::BIGINT AS cr FROM toks GROUP BY 1),
       |tgt AS (SELECT bk, count(*)::BIGINT AS ct FROM toks
       |        WHERE doc_id IN (SELECT doc_id FROM target) GROUP BY 1),
       |stats AS (
       |  SELECT r.bk, r.cr, coalesce(t.ct, 0)::BIGINT AS ct
       |  FROM raw r LEFT JOIN tgt t USING (bk)),
       |totals AS (SELECT sum(cr)::BIGINT AS nr, sum(ct)::BIGINT AS nt
       |           FROM stats),
       |model AS (
       |  SELECT bk,
       |         floor(ln(((ct + 1)::DOUBLE * (nr + $b)::DOUBLE) /
       |                  ((cr + 1)::DOUBLE * (nt + $b)::DOUBLE)) *
       |               $DsirScale.0 + 0.5)::BIGINT AS v
       |  FROM stats, totals),
       |w AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_tok, sum(v)::BIGINT AS w
       |  FROM toks JOIN model USING (bk) GROUP BY 1)
       |SELECT d.doc_id,
       |       coalesce(w.n_tok, 0)::BIGINT AS n_tok,
       |       ${Portable.r4Sql(s"coalesce(w.w, 0)::DOUBLE / $DsirScale.0")}
       |         AS logw,
       |       CASE WHEN coalesce(w.n_tok, 0) > 0
       |            THEN ${Portable.r4Sql(
             s"w.w::DOUBLE / $DsirScale.0 / w.n_tok::DOUBLE")}
       |            ELSE 0.0 END AS logw_per_tok
       |FROM documents d LEFT JOIN w USING (doc_id)""".stripMargin
  }

  // ------------------------------------------------ q199 UniMax budgets

  /** UniMax knobs: per-language epoch ceiling and the training budget as a
    * multiple of the corpus token count (shared by plan and oracle).
    */
  val UnimaxEpochCap = 4
  val UnimaxBudgetFactor = 2

  /** q199: UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining") — split a total training-token budget
    * across languages as UNIFORMLY as possible subject to a per-language
    * epoch cap: quota_l = min(cap_l, W) with cap_l = epochs·n_l and the
    * waterline W solving Σ quota = B. The principled answer to
    * temperature sampling's (q84) over-epoching of tail languages: no
    * language repeats more than [[UnimaxEpochCap]] times, and whatever
    * budget the capped tail cannot absorb flows to the head evenly.
    *
    * Scale shape: the corpus collapses to one per-language token count
    * (one map-side-combinable agg); everything after runs on the
    * LANGUAGE DIMENSION (≤ hundreds of rows at any corpus size). The
    * waterline uses the sorted-prefix closed form — candidate
    * W_i = (B − S_i)/(L − i) for i capped languages, the unique valid
    * candidate selected by the bracketing caps — computed with
    * dimension² self-joins instead of a partition-less window (the q157
    * grid discipline applied to a 20-row frame; no global-sort operator
    * enters any plan).
    *
    * Parity: counts/caps/prefix sums are exact BIGINTs; W is one integer
    * division per candidate in identical textual order; quota/epochs are
    * r4'd at the output.
    */
  def unimaxBudget(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(col("lang"), size(Portable.toks(col("text"))).cast("long").as("nt"))
      .groupBy(col("lang")).agg(sum(col("nt")).as("n"))
    unimaxBudgetDf(counts)
  }

  /** Core allocation over a `(lang, n)` token-count frame (unit-testable
    * with constructed skew).
    */
  def unimaxBudgetDf(counts: DataFrame): DataFrame = {
    val caps = counts
      .select(col("lang"), col("n"), (col("n") * UnimaxEpochCap.toLong).as("c"))
    val tot = caps.agg(count(lit(1)).as("ll"),
      (sum(col("n")) * UnimaxBudgetFactor.toLong).as("b"))
    // rank / prefix-cap-sum / predecessor cap via a dimension² self-join
    // on the (c, lang) total order — left join so rank-0 rows survive
    val b2 = caps.select(col("lang").as("lang2"), col("c").as("c2"))
    val before = col("c2") < col("c") ||
      (col("c2") === col("c") && col("lang2") < col("lang"))
    val ranked = caps.join(b2, before, "left")
      .groupBy(col("lang"), col("n"), col("c"))
      .agg(count(col("lang2")).as("i"),
        coalesce(sum(col("c2")), lit(0L)).as("s_before"),
        coalesce(max(col("c2")), lit(0L)).as("prev_c"))
    val cand = ranked.crossJoin(broadcast(tot))
      .withColumn("wi",
        (col("b") - col("s_before")).cast("double") /
          (col("ll") - col("i")).cast("double"))
    val wline = cand
      .filter(col("prev_c").cast("double") <= col("wi") &&
        col("wi") <= col("c").cast("double"))
      .agg(min(col("wi")).as("w"))
    cand.crossJoin(broadcast(wline))
      .select(col("lang"), col("n").as("n_tokens"), col("c").as("cap"),
        Portable.r4(least(col("c").cast("double"),
          coalesce(col("w"), col("c").cast("double")))).as("quota"),
        // n = 0 (a language whose documents are all empty) would make
        // epochs a 0.0/0.0 whose NULL/NaN result is engine-dependent —
        // pin the corner to 0.0 on both engines
        Portable.r4(when(col("n") > 0L,
          least(col("c").cast("double"),
            coalesce(col("w"), col("c").cast("double"))) /
            col("n").cast("double")).otherwise(0.0)).as("epochs"),
        when(col("w").isNull || col("c").cast("double") <= col("w"), 1)
          .otherwise(0).as("capped"))
  }

  // ------------------------------------------ q217 budget-fill selection

  /** q217: budget-constrained quality selection — fill each language's
    * q199 UniMax token quota with its BEST documents: rank docs within a
    * language by (q17 quality DESC, doc_id), admit while the token mass
    * of strictly-better documents is under the quota, and mark the one
    * straddling document whose admission overflows it. This is the step
    * that turns the two planning artifacts into an actionable corpus
    * list: q199 says how many tokens each language GETS, q212 ranks
    * WITHIN a source — this spends each language's budget on measured
    * quality (greedy knapsack by score, the standard budgeted-selection
    * move) instead of sampling it blindly.
    *
    * Scale shape: the q213 grid discipline with token sums — (lang,
    * r4-grid quality) CELL token masses, strict-prefix offsets over the
    * grid-bounded cell frame, docs rejooin ONLY for budget-intersecting
    * cells, within-cell prefix window bounded by one cell's tie mass;
    * quotas are the language-dimension q199 frame, broadcast. No
    * partition-less window, no per-language corpus sort.
    *
    * Parity: token prefix sums exact BIGINT; quota is q199's r4'd
    * double — the admit comparison promotes the exact integer to double
    * identically on both engines; the oracle replays the WINDOW form of
    * the same ordering, so the hash match proves grid ≡ window row
    * identity (the q213 discipline).
    */
  def budgetFill(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        TextOps.qualityCol(col("text")).as("quality"),
        size(Portable.toks(col("text"))).cast("long").as("nt"))
    val quotas = unimaxBudget(spark, sfDir).select(col("lang"), col("quota"))
    val cells = scored.groupBy(col("lang"), col("quality"))
      .agg(sum(col("nt")).as("ct"))
    val cellW = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cells
      .withColumn("cell_off", coalesce(sum(col("ct")).over(cellW), lit(0L)))
      .join(broadcast(quotas), "lang")
      .filter(col("cell_off").cast("double") < col("quota"))
      .select(col("lang"), col("quality"), col("cell_off"), col("quota"))
    val inCellW = Window.partitionBy(col("lang"), col("quality"))
      .orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    scored.join(offsets, Seq("lang", "quality"))
      .withColumn("cum_before",
        col("cell_off") + coalesce(sum(col("nt")).over(inCellW), lit(0L)))
      .filter(col("cum_before").cast("double") < col("quota"))
      .select(col("doc_id"), col("lang"), col("quality"),
        col("nt").as("n_tokens"), col("cum_before"),
        ((col("cum_before") + col("nt")).cast("double") > col("quota"))
          .cast("int").as("partial"))
  }

  // lazy: textually precedes unimaxBudgetSql's initializer, which it embeds
  lazy val budgetFillSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang, ${TextOps.qualitySqlExpr} AS quality,
       |         len(${Portable.toksSql})::BIGINT AS nt
       |  FROM documents),
       |quotas AS (SELECT lang, quota FROM ($unimaxBudgetSql)),
       |o AS (
       |  SELECT doc_id, lang, quality, nt,
       |         coalesce(sum(nt) OVER (
       |           PARTITION BY lang ORDER BY quality DESC, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           ::BIGINT AS cum_before
       |  FROM scored)
       |SELECT doc_id, lang, quality, nt AS n_tokens, cum_before,
       |       ((cum_before + nt)::DOUBLE > quota)::INT AS partial
       |FROM o JOIN quotas USING (lang)
       |WHERE cum_before::DOUBLE < quota""".stripMargin

  val unimaxBudgetSql: String = {
    val e = UnimaxEpochCap
    val f = UnimaxBudgetFactor
    s"""WITH counts AS (
       |  SELECT lang, sum(len(${Portable.toksSql}))::BIGINT AS n
       |  FROM documents GROUP BY 1),
       |caps AS (SELECT lang, n, (n * $e)::BIGINT AS c FROM counts),
       |tot AS (SELECT count(*)::BIGINT AS ll, (sum(n) * $f)::BIGINT AS b
       |        FROM caps),
       |ranked AS (
       |  SELECT a.lang, a.n, a.c,
       |         count(b.lang2)::BIGINT AS i,
       |         coalesce(sum(b.c2), 0)::BIGINT AS s_before,
       |         coalesce(max(b.c2), 0)::BIGINT AS prev_c
       |  FROM caps a LEFT JOIN
       |       (SELECT lang AS lang2, c AS c2 FROM caps) b
       |    ON b.c2 < a.c OR (b.c2 = a.c AND b.lang2 < a.lang)
       |  GROUP BY 1, 2, 3),
       |cand AS (
       |  SELECT r.*, (t.b - r.s_before)::DOUBLE / (t.ll - r.i)::DOUBLE AS wi
       |  FROM ranked r, tot t),
       |wline AS (
       |  SELECT min(wi) AS w FROM cand
       |  WHERE prev_c::DOUBLE <= wi AND wi <= c::DOUBLE)
       |SELECT lang, n AS n_tokens, c AS cap,
       |       ${Portable.r4Sql("least(c::DOUBLE, coalesce(w, c::DOUBLE))")}
       |         AS quota,
       |       ${Portable.r4Sql(
             "CASE WHEN n > 0 THEN least(c::DOUBLE, coalesce(w, c::DOUBLE))" +
               " / n::DOUBLE ELSE 0.0 END")}
       |         AS epochs,
       |       CASE WHEN w IS NULL OR c::DOUBLE <= w THEN 1 ELSE 0 END
       |         AS capped
       |FROM cand, wline""".stripMargin
  }

  // ------------------------------------------ q243 stratified eval holdout

  /** Eval-set size the holdout allocates across (lang × source) strata. */
  val EvalHoldoutN = 200L

  /** q243: stratified eval-holdout allocation by the largest-remainder
    * method (Hamilton apportionment) — build an eval set whose
    * (lang × source) composition matches the corpus EXACTLY, not just in
    * expectation: the hash splitters (q39/q40) are unbiased but any
    * given corpus lands a skewed fold (q131 measures exactly that drift
    * post-hoc); an eval set is built ONCE and read forever, so its
    * composition should be apportioned, not sampled. Each stratum's
    * exact quota is n·N/total; every stratum gets ⌊quota⌋, and the
    * remaining seats go to the largest remainders (ties by lang,
    * source). The classic Hamilton guarantee: every allocation is
    * within 1 of its exact quota, and seats sum to N exactly — both
    * spec-pinned.
    *
    * Parity is EXACT-INTEGER throughout — the quota split uses integer
    * div/mod (n·N div total, n·N mod total), so there is not a single
    * double in the plan until nothing (no r4 needed; the rem column IS
    * the tie-break key both engines sort).
    *
    * Scale shape: one hash agg to the catalog-sized stratum grid, one
    * broadcast total, and the remainder ranking runs inside ONE
    * collected array (the rankPool discipline on a |langs|·|sources|
    * frame — no partition-less window on the Spark side).
    */
  def evalHoldout(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum(col("n")).as("total"))
    val g = cells.crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("n"),
        expr(s"(n * $EvalHoldoutN) div total").as("base"),
        expr(s"(n * $EvalHoldoutN) % total").as("rem"))
    // ONE corpus pass: the deficit folds out of the same collected array
    // that ranks the remainders (a second g.agg would re-scan documents)
    g.agg(sort_array(collect_list(struct((col("rem") * -1L).as("nr"),
        col("lang"), col("source"), col("n"), col("base"), col("rem"))))
        .as("cs"))
      .select(col("cs"),
        (lit(EvalHoldoutN) -
          expr("aggregate(cs, 0L, (a, x) -> a + x.base)")).as("deficit"))
      .select(posexplode(col("cs")).as(Seq("pos", "c")), col("deficit"))
      .select(col("c.lang").as("lang"), col("c.source").as("source"),
        col("c.n").as("n_docs"), col("c.base").as("base"),
        col("c.rem").as("rem"),
        (col("c.base") + (col("pos") < col("deficit")).cast("long"))
          .as("alloc"))
  }

  val evalHoldoutSql: String =
    s"""WITH cells AS (
       |  SELECT lang, source, count(*)::BIGINT AS n
       |  FROM documents GROUP BY 1, 2),
       |t AS (SELECT sum(n)::BIGINT AS total FROM cells),
       |g AS (
       |  SELECT lang, source, n,
       |         (n * $EvalHoldoutN) // total AS base,
       |         (n * $EvalHoldoutN) % total AS rem
       |  FROM cells, t),
       |r AS (
       |  SELECT lang, source, n, base, rem,
       |         row_number() OVER (ORDER BY rem DESC, lang ASC, source ASC)
       |           - 1 AS pos
       |  FROM g),
       |d AS (SELECT ($EvalHoldoutN - sum(base))::BIGINT AS deficit FROM g)
       |SELECT lang, source, n AS n_docs, base::BIGINT AS base,
       |       rem::BIGINT AS rem,
       |       (base + (pos < d.deficit)::INT)::BIGINT AS alloc
       |FROM r, d""".stripMargin

  // --------------------------------------------- q228 DoReMi reweighting

  /** Multiplicative-weights step size of the domain-reweighting update
    * (η in Xie et al. 2023's Group DRO update). One constant in both
    * plans; the ModeBench sweep measures how the mixture sharpens with η.
    */
  val DoremiEta = 1.0

  /** q228: DoReMi-style domain reweighting (Xie et al. 2023) — reweight
    * the per-source training mixture by EXCESS LOSS: domains a small
    * proxy model finds harder than the reference gets more training
    * mass, w_s ∝ u_s · exp(η · excess_s), starting from the baseline
    * token shares u_s. The full algorithm re-trains the proxy between
    * updates; the statically-computable step published here is one exact
    * multiplicative-weights round with the repo's model-free loss proxy —
    * the q103 bigram-LM per-document NLL — whose per-source mean stands
    * in for the proxy loss and whose corpus mean is the reference
    * (excess_s = max(0, L_s − L̄), the clamp as in the paper's
    * per-domain excess). Output: one catalog-sized row per source with
    * the baseline token share, excess loss, the normalized DoReMi
    * weight, and the boost ratio w_s/u_s a budget owner reads directly.
    *
    * Scale shape: everything heavy is the q103 scoring pass (hash aggs +
    * vocab-keyed equi-joins); from there the frame is catalog-sized —
    * per-source means, one broadcast corpus-mean scalar, one broadcast
    * normalization scalar. No windows; the normalization sum runs over
    * |sources| doubles (tiny, and only published after r4).
    *
    * Parity: NLLs are the q103 values (ln of exact integer ratios);
    * exp/ln 1-ulp libm skew and float-sum association noise are orders
    * of magnitude inside the r4 grid, the q103 precedent.
    */
  def doremiWeights(spark: SparkSession, sfDir: String): DataFrame =
    doremiWeightsAt(spark, sfDir, DoremiEta)

  /** The q228 frame at any step size — the ModeBench sweep surface (η
    * sharpens the mixture: η→0 reproduces the baseline shares, large η
    * concentrates mass on the highest-excess domain).
    */
  def doremiWeightsAt(spark: SparkSession, sfDir: String,
      eta: Double): DataFrame = {
    // three consumers walk this lineage (per-source means, the corpus
    // mean, the z normalization) — cache the scored frame so the q103
    // scoring pass runs once, not thrice (the q105/bbitMinhash soft-pin
    // discipline; the ModeBench eta sweep calls this three more times)
    val scored = TextOps.perplexity(spark, sfDir)
      .join(Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("source"),
            size(Portable.toks(col("text"))).cast("long").as("nt")),
        "doc_id")
      .cache()
    val bySrc = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tok"),
        avg(col("nll")).as("l_s"))
    val corpus = scored.agg(avg(col("nll")).as("l_bar"))
      .crossJoin(bySrc.agg(sum(col("tok")).as("tok_all")))
    val weighted = bySrc.crossJoin(broadcast(corpus))
      .select(col("source"), col("n_docs"),
        (col("tok").cast("double") / col("tok_all").cast("double")).as("u"),
        greatest(lit(0.0), col("l_s") - col("l_bar")).as("excess"))
      .withColumn("w_raw", col("u") * exp(lit(eta) * col("excess")))
    weighted
      .crossJoin(broadcast(weighted.agg(sum(col("w_raw")).as("z"))))
      .select(col("source"), col("n_docs"),
        Portable.r4(col("u")).as("tok_share"),
        Portable.r4(col("excess")).as("excess"),
        Portable.r4(col("w_raw") / col("z")).as("weight"),
        Portable.r4(col("w_raw") / col("z") / col("u")).as("boost"))
  }

  val doremiWeightsSql: String =
    s"""WITH p AS (${TextOps.perplexitySql.replace("\n", "\n  ")}),
       |s AS (
       |  SELECT p.doc_id, d.source, len(${Portable.toksSql})::BIGINT AS nt,
       |         p.nll
       |  FROM p JOIN documents d USING (doc_id)),
       |bysrc AS (
       |  SELECT source, count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS tok,
       |         avg(nll) AS l_s
       |  FROM s GROUP BY 1),
       |corpus AS (
       |  SELECT (SELECT avg(nll) FROM s) AS l_bar,
       |         (SELECT sum(tok) FROM bysrc)::BIGINT AS tok_all),
       |w AS (
       |  SELECT source, n_docs,
       |         tok::DOUBLE / tok_all::DOUBLE AS u,
       |         greatest(0.0, l_s - l_bar) AS excess,
       |         tok::DOUBLE / tok_all::DOUBLE
       |           * exp($DoremiEta * greatest(0.0, l_s - l_bar)) AS w_raw
       |  FROM bysrc, corpus),
       |z AS (SELECT sum(w_raw) AS z FROM w)
       |SELECT source, n_docs, ${Portable.r4Sql("u")} AS tok_share,
       |       ${Portable.r4Sql("excess")} AS excess,
       |       ${Portable.r4Sql("w_raw / z")} AS weight,
       |       ${Portable.r4Sql("w_raw / z / u")} AS boost
       |FROM w, z""".stripMargin

  // --------------------------------------- q252 data-constrained scaling

  /** Muennighoff et al. 2023 (data-constrained scaling) decay constant —
    * repeated epochs lose value as if only R*·(1−e^(−R/R*)) extra epochs
    * of fresh data had been seen; R* ≈ 15.4 is the paper's fitted value —
    * and the planner's total budget as a multiple of the corpus's unique
    * tokens.
    */
  val ScalingRStar = 15.4
  val ScalingBudgetFactor = 4L

  /** q252: data-constrained scaling planner — given a total token budget
    * of [[ScalingBudgetFactor]]× the corpus's unique tokens split EQUALLY
    * across sources (the rebalancing a mixture owner actually considers),
    * report per source: its unique-token supply (exact-dedup survivors,
    * the q20 keep rule — repetition should not count as supply), the
    * allotted budget, the epochs that implies, and the EFFECTIVE tokens
    * under the Muennighoff decay D_eff = U + U·R*·(1−e^(−(epochs−1)/R*)).
    * The table a data-constrained run reads to see which sources turn
    * budget into signal (epochs ≈ 1, efficiency ≈ 1) and which burn it on
    * repetition (small U, epochs ≫ 1, efficiency → R*·U/B). Completes the
    * mixture family: q199 allocates by supply (UniMax), q228 by learning
    * signal (DoReMi), q252 prices the repetition cost of any allocation.
    *
    * Scale shape: q20's exact-dedup hash agg (skew-proof content keys) +
    * a doc_id join back for the keeper rows + ONE hash agg to |sources|
    * rows; the planner arithmetic runs on the aggregate frame only.
    *
    * Parity: U/budget are exact integers (integer division via `div`/`//`
    * on both engines); epochs/eff/efficiency are per-row scalars on
    * |sources| rows, r4'd; the U=0 (all-empty source) and budget ≤ U (no
    * repetition) corners are pinned on both engines.
    */
  def scalingPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(Portable.toks(col("text"))).cast("long").as("ntok"),
        Dedup.exactFpCol(col("text")).as("fp"))
    val keep = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    val u = docs.join(keep, docs("doc_id") === keep("keep_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("ntok")).as("u_tokens"))
    val tot = u.agg(sum(col("u_tokens")).as("t"),
      count(lit(1)).as("n_sources"))
    val planned = u.crossJoin(broadcast(tot))
      .withColumn("budget",
        expr(s"($ScalingBudgetFactor * t) div n_sources"))
    val r = ScalingRStar
    val uD = col("u_tokens").cast("double")
    val bD = col("budget").cast("double")
    val eff = when(col("u_tokens") === 0L, 0.0)
      .when(col("budget") <= col("u_tokens"), bD)
      .otherwise(uD + uD * r * (lit(1.0) - exp(-(bD / uD - 1.0) / r)))
    planned.select(col("source"), col("n_kept"), col("u_tokens"), col("budget"),
      Portable.r4(when(col("u_tokens") === 0L, 0.0).otherwise(bD / uD))
        .as("epochs"),
      Portable.r4(eff).as("eff_tokens"),
      Portable.r4(when(col("budget") === 0L, 0.0).otherwise(eff / bD))
        .as("efficiency"))
  }

  val scalingPlanSql: String = {
    val r = ScalingRStar
    val f = ScalingBudgetFactor
    val eff = s"""CASE WHEN u_tokens = 0 THEN 0.0
                 |            WHEN budget <= u_tokens THEN budget::DOUBLE
                 |            ELSE u_tokens::DOUBLE + u_tokens::DOUBLE * $r *
                 |                 (1.0 - exp(-(budget::DOUBLE / u_tokens::DOUBLE - 1.0) / $r))
                 |       END""".stripMargin
    s"""WITH f AS (
       |  SELECT doc_id, source, len(${Portable.toksSql})::BIGINT AS ntok,
       |         ${Dedup.exactFpSql} AS fp
       |  FROM documents),
       |k AS (SELECT min(doc_id) AS keep_id FROM f GROUP BY fp),
       |u AS (SELECT f.source, count(*)::BIGINT AS n_kept,
       |             sum(f.ntok)::BIGINT AS u_tokens
       |      FROM f JOIN k ON f.doc_id = k.keep_id GROUP BY 1),
       |tot AS (SELECT sum(u_tokens)::BIGINT AS t, count(*)::BIGINT AS n_sources
       |        FROM u),
       |p AS (SELECT u.*, ($f * tot.t) // tot.n_sources AS budget
       |      FROM u CROSS JOIN tot)
       |SELECT source, n_kept, u_tokens, budget,
       |       ${Portable.r4Sql(
          "CASE WHEN u_tokens = 0 THEN 0.0 ELSE budget::DOUBLE / u_tokens::DOUBLE END")}
       |         AS epochs,
       |       ${Portable.r4Sql(eff)} AS eff_tokens,
       |       ${Portable.r4Sql(
          s"CASE WHEN budget = 0 THEN 0.0 ELSE ($eff) / budget::DOUBLE END")}
       |         AS efficiency
       |FROM p""".stripMargin
  }
}
