package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpointing.LineageSyntax
import graft.Tables

/** q100: the end-to-end corpus-curation funnel — the composition the whole
  * LLM-data operator suite exists for, as ONE gate query: raw corpus →
  * drop eval docs → exact dedup (q20 fingerprint) → near-dup clusters keep
  * one representative (q24/q57/q63 stack) → quality threshold (q17 score)
  * → decontamination (q81 eval-shingle overlap) → per-(source, lang)
  * survivor counts at every stage.
  *
  * Every stage reuses the EXACT operator kernel its standalone gate query
  * proves (shared Scala constants + shared generated SQL fragments), so the
  * funnel's cross-engine parity is inherited, not re-derived. Stage flags
  * are cumulative booleans summed in one aggregation — the output is
  * |sources|×|langs| rows however large the corpus is.
  *
  * Scale shape: one scan computes fingerprint + quality + eval flag
  * (narrow); the joins are the component stack's own equi-joins plus a
  * broadcast of the (fixed-size) contamination hits; the near-dup labels
  * come from the memoized q57 computation — composing the pipeline does
  * not re-run it.
  */
object CurationPipeline {

  // `final` so the literal constant-inlines at call sites: q272's SQL twin
  // in TextOps reads it at object-initialization time, and a non-inlined
  // reference would close a TextOps → CurationPipeline → AdvancedOps →
  // Similarity → ExtraOps → TextOps clinit cycle (NoClassDefFoundError)
  final val QualityMin = 0.7

  def corpusFunnel(spark: SparkSession, sfDir: String): DataFrame =
    survivorFlags(spark, sfDir)
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_raw"),
        sum(col("s0").cast("long")).as("n_train"),
        sum(col("s1").cast("long")).as("n_exact"),
        sum(col("s2").cast("long")).as("n_neardup"),
        sum(col("s3").cast("long")).as("n_quality"),
        sum(col("s4").cast("long")).as("n_final"))

  /** Per-document funnel flags `(doc_id, source, lang, s0…s4)` — the
    * shared core of the q100 REPORT (which aggregates them) and the
    * [[graft.pipeline.CorpusBuild]] SINK (which keeps the `s4`
    * survivors). s0 = train split, s1 = exact-dedup keeper, s2 = near-dup
    * keeper, s3 = quality gate, s4 = not benchmark-contaminated — each
    * stage a conjunction with the previous, so the funnel is monotone by
    * construction.
    */
  def survivorFlags(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir).select(
      col("doc_id"), col("source"), col("lang"),
      (pmod(col("doc_id"), lit(Dedup.EvalSetModulus.toLong)) === 0L).as("is_eval"),
      Dedup.exactFpCol(col("text")).as("fp"),
      TextOps.qualityCol(col("text")).as("quality"))
      // the rep election and the final join both consume this projection;
      // fingerprint (md5) and quality (stopword HOF) are the funnel's two
      // expensive scalar kernels — localCheckpoint (eager) shares ONE
      // scan+compute between the consumers AND truncates the lineage both
      // downstream plans would otherwise re-carry (the q149/q57 storage
      // discipline, applied here after r5 flagged the cache() soft pin as
      // the one inconsistent site; blocks are narrow — one short row per
      // document — and live until session end like every checkpoint in
      // the iterative family)
      .lineageCheckpoint()
    // representative election runs AFTER the eval holdout (the documented
    // stage order): electing over the full corpus would let an eval doc be
    // a group's keeper and silently misattribute the drop to exact dedup.
    // LEFT join: an all-eval fingerprint group has no rep row (keep_id
    // null ⇒ s1 false), but its raw rows still count in n_raw.
    val reps = base.filter(!col("is_eval"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    // the near-dup keep-list is the corpus-wide memoized q57/q63 election —
    // deliberately independent of the earlier stages: a cluster whose
    // representative was itself filtered contributes no survivor
    // (conservative dedup, the semantics independent pipeline stages give)
    val near = AdvancedOps.dedupKeepList(spark, sfDir)
      .select(col("doc_id"), col("keep").as("near_keep"))
    val contaminated = Dedup.contamination(spark, sfDir)
      .select(col("doc_id"), lit(true).as("contaminated"))

    val s0 = !col("is_eval")
    val s1 = s0 && col("doc_id") === col("keep_id")
    val s2 = s1 && col("near_keep")
    val s3 = s2 && col("quality") >= QualityMin
    val s4 = s3 && col("contaminated").isNull
    base
      .join(reps, Seq("fp"), "left")
      .join(near, "doc_id")
      .join(broadcast(contaminated), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("lang"),
        s0.as("s0"), s1.as("s1"), s2.as("s2"), s3.as("s3"), s4.as("s4"))
  }

  val corpusFunnelSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, source, lang,
       |         (doc_id % ${Dedup.EvalSetModulus} = 0) AS is_eval,
       |         ${Dedup.exactFpSql} AS fp,
       |         ${TextOps.qualitySqlExpr} AS quality
       |  FROM documents),
       |reps AS (SELECT fp, min(doc_id) AS keep_id FROM base
       |         WHERE NOT is_eval GROUP BY 1),
       |near AS (${AdvancedOps.dedupKeepListSql.replace("\n", "\n  ")}),
       |cont AS (${Dedup.contaminationSql.replace("\n", "\n  ")}),
       |flags AS (
       |  SELECT b.source, b.lang,
       |         NOT b.is_eval AS s0,
       |         NOT b.is_eval AND b.doc_id = r.keep_id AS s1,
       |         NOT b.is_eval AND b.doc_id = r.keep_id AND n.keep AS s2,
       |         NOT b.is_eval AND b.doc_id = r.keep_id AND n.keep
       |           AND b.quality >= $QualityMin AS s3,
       |         NOT b.is_eval AND b.doc_id = r.keep_id AND n.keep
       |           AND b.quality >= $QualityMin AND c.doc_id IS NULL AS s4
       |  FROM base b
       |  LEFT JOIN reps r USING (fp)
       |  JOIN near n USING (doc_id)
       |  LEFT JOIN cont c USING (doc_id))
       |SELECT source, lang, count(*) AS n_raw,
       |       sum(s0::INT)::BIGINT AS n_train,
       |       sum(s1::INT)::BIGINT AS n_exact,
       |       sum(s2::INT)::BIGINT AS n_neardup,
       |       sum(s3::INT)::BIGINT AS n_quality,
       |       sum(s4::INT)::BIGINT AS n_final
       |FROM flags GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------ q270 gate ablation

  /** Gate names of the q270 ablation, in funnel-stage order. */
  val GateNames: Seq[String] =
    Seq("eval_holdout", "exact_dedup", "near_dedup", "quality", "decontam")

  /** q270: gate-ablation table over the q100 funnel — for each of the
    * five gates, how many documents the OTHER four would keep (i.e. how
    * many this gate uniquely removes from the final corpus), next to the
    * full-conjunction survivor count. The funnel (q100) reports stage
    * attrition in STAGE ORDER, which attributes every overlap to the
    * earliest gate; ablation is the order-free attribution — a gate whose
    * removal rescues almost nothing is redundant with the rest (drop the
    * expensive one, cf. q267's agreement reading), while a large rescue
    * count marks the gate that uniquely shapes the corpus. Gate
    * CONDITIONS are held fixed as shipped (each ablation drops one
    * conjunct, not the stage definitions — the standard ablation
    * convention).
    *
    * Scale shape: the survivorFlags joins (memoized CC, broadcast
    * contamination) + ONE aggregation producing the full count and all
    * five ablation counts in a single pass; the 5-row table is
    * driver-sized.
    *
    * Parity: all counts exact integers over exact flag conjunctions
    * (r4-grid quality vs an exact literal); shares r4'd once.
    */
  def gateAblation(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      (pmod(col("doc_id"), lit(Dedup.EvalSetModulus.toLong)) === 0L)
        .as("is_eval"),
      Dedup.exactFpCol(col("text")).as("fp"),
      TextOps.qualityCol(col("text")).as("quality"))
    val reps = base.filter(!col("is_eval"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    val near = AdvancedOps.dedupKeepList(spark, sfDir)
      .select(col("doc_id"), col("keep").as("near_keep"))
    val contaminated = Dedup.contamination(spark, sfDir)
      .select(col("doc_id"), lit(true).as("contaminated"))
    val g = Seq(
      !col("is_eval"),
      coalesce(col("doc_id") === col("keep_id"), lit(false)),
      col("near_keep"),
      col("quality") >= QualityMin,
      col("contaminated").isNull)
    val flags = base
      .join(reps, Seq("fp"), "left")
      .join(near, "doc_id")
      .join(broadcast(contaminated), Seq("doc_id"), "left")
    val full = g.reduce(_ && _)
    val sums =
      Seq(count(lit(1)).as("n_raw"),
        sum(full.cast("long")).as("n_full")) ++
      g.indices.map { i =>
        val without = g.indices.filter(_ != i).map(g).reduce(_ && _)
        sum(without.cast("long")).as(s"a$i")
      }
    val agg = flags.agg(sums.head, sums.tail: _*)
    agg.select(col("n_raw"), col("n_full"),
        explode(array(GateNames.zipWithIndex.map { case (nm, i) =>
          struct(lit(i).as("i"), lit(nm).as("gate"), col(s"a$i").as("n_without"))
        }: _*)).as("r"))
      .select(col("r.i").as("stage"), col("r.gate").as("gate"),
        col("n_raw"), col("n_full"), col("r.n_without").as("n_without"),
        (col("r.n_without") - col("n_full")).as("n_rescued"),
        Portable.r4((col("r.n_without") - col("n_full")).cast("double") /
          col("n_raw").cast("double")).as("rescue_share"))
  }

  val gateAblationSql: String = {
    val gs = Seq(
      "NOT b.is_eval",
      "coalesce(b.doc_id = r.keep_id, false)",
      "n.keep",
      s"b.quality >= $QualityMin",
      "c.doc_id IS NULL")
    val ablations = gs.indices.map { i =>
      val without = gs.indices.filter(_ != i).map(gs).mkString(" AND ")
      s"sum(($without)::INT)::BIGINT AS a$i"
    }.mkString(",\n         ")
    val unioned = GateNames.zipWithIndex.map { case (nm, i) =>
      s"SELECT $i AS stage, '$nm' AS gate, n_raw, n_full, a$i AS n_without FROM a"
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (
       |  SELECT doc_id,
       |         (doc_id % ${Dedup.EvalSetModulus} = 0) AS is_eval,
       |         ${Dedup.exactFpSql} AS fp,
       |         ${TextOps.qualitySqlExpr} AS quality
       |  FROM documents),
       |reps AS (SELECT fp, min(doc_id) AS keep_id FROM base
       |         WHERE NOT is_eval GROUP BY 1),
       |near AS (${AdvancedOps.dedupKeepListSql.replace("\n", "\n  ")}),
       |cont AS (${Dedup.contaminationSql.replace("\n", "\n  ")}),
       |a AS (
       |  SELECT count(*)::BIGINT AS n_raw,
       |         sum((${gs.mkString(" AND ")})::INT)::BIGINT AS n_full,
       |         $ablations
       |  FROM base b
       |  LEFT JOIN reps r USING (fp)
       |  JOIN near n USING (doc_id)
       |  LEFT JOIN cont c USING (doc_id)),
       |rows_ AS ($unioned)
       |SELECT stage, gate, n_raw, n_full, n_without,
       |       n_without - n_full AS n_rescued,
       |       ${Portable.r4Sql("(n_without - n_full)::DOUBLE / n_raw::DOUBLE")}
       |         AS rescue_share
       |FROM rows_""".stripMargin
  }
}
