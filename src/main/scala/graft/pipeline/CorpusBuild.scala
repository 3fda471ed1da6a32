package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
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
  *  2. span-level hygiene TO FIXPOINT (q176) over the SURVIVOR corpus:
  *     the repeated-passage cut iterated until the span index of the
  *     output is empty, so the shipped corpus carries no repeated
  *     [[Dedup.SpanTokens]]-token window at all — not just none of the
  *     original ones (q171's single pass leaves junction-minted
  *     residue); documents cut to empty are dropped, counted in the
  *     stats;
  *  2b. UniMax budget annotation (q199): each shipped document carries
  *     its language's training-epoch weight under the epoch-capped
  *     uniform budget, computed over the post-cut kept tokens — the
  *     mixture-ready column a trainer's sampler consumes (CorpusBuildSpec
  *     asserts positivity, the cap, per-language constancy, and budget
  *     conservation over the shipped token mass);
  *  3. partitioned parquet publish (`source=<s>/` layout — the
  *     catalog-sized partition key; lang stays a column: 1000 sources ×
  *     20 langs as directories would shatter the layout into small
  *     files) through [[graft.ops.PartitionedSink]] — REBALANCE on the
  *     partition column for O(cells) file counts with AQE splitting any
  *     mega source cell, plus the per-file record cap (the S8
  *     discipline; r9 straggler bound).
  *
  * Returns the 1-row build manifest (raw/survivor/written counts, token
  * accounting, cutting rounds) — the numbers a dataset card (q149)
  * starts from — and writes two sidecar artifacts from a READ-BACK of
  * the published files: the release-integrity digest manifest
  * (`<outDir>_manifest`, the q185 per-bucket commutative-digest kernel)
  * so replicas can verify/diff their copy without row-level joins, and
  * the packing-layout manifest (`<outDir>_packing`, the q210 chunk
  * table) whose token total is the ONE number a future append needs to
  * continue the training stream in O(delta) (q216). Runs
  * `runMain graft.pipeline.CorpusBuildMain <sfDir> <outDir>`.
  *
  * MANIFEST WITHOUT EXTRA ACTIONS: the funnel counts are `observe()`d on
  * the plan that feeds the cut (collected when the fixpoint loop's first
  * eager checkpoint materializes it) and the written-corpus stats are
  * `observe()`d on the write plan itself (collected by the one write
  * job) — so the manifest is computed from the SAME data flow that
  * produced the files, and no count-action re-drives the funnel (the r6
  * finding: three full funnel actions where one pass + write metrics
  * serves). `source`/`lang` ride through the cut as passthrough columns
  * instead of a post-cut re-join for the same reason.
  *
  * Scale shape: survivor selection is the funnel's own audited plan; the
  * span cut is q176's per-round narrow join over a checkpointed token
  * corpus; the write is one shuffle keyed by source. Nothing here
  * introduces a new exchange class.
  */
object CorpusBuild {

  /** Decontamination policy conf: `drop` (default — the q81/q100 funnel
    * stage: a train doc sharing ANY 3-gram with the benchmark split is
    * dropped whole) or `excise` (the q173 shape at the q81 split: keep
    * the s3 survivors and CUT the verified shared
    * [[Dedup.DecontamSpanW]]-token windows out of them instead). The
    * BASELINE.md r7 rows show why the option exists: a benchmark split
    * that grows with the corpus makes the any-3-gram doc-drop flag
    * nearly every document at scale (sf0.1: 665 quality-survivors → 2),
    * while excision keeps the document and removes the overlap — the
    * GPT-3 appendix-C shape.
    */
  val DecontamModeKey = "graft.corpus.decontam"

  def run(spark: SparkSession, sfDir: String, outDir: String): DataFrame = {
    val excise = spark.conf.getOption(DecontamModeKey).contains("excise")
    val funnelObs = Observation("corpus-funnel")
    val flags = CurationPipeline.survivorFlags(spark, sfDir)
      .observe(funnelObs,
        count(lit(1)).as("n_raw"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("n_s3"),
        sum(when(col("s4"), 1L).otherwise(0L)).as("n_s4"))
    // excise mode keeps the PRE-decontamination (s3) survivors — the
    // benchmark overlap is removed span-wise below instead of doc-wise
    val survivors = flags.filter(col(if (excise) "s3" else "s4"))
      .select(col("doc_id"), col("source"), col("lang"))
    // inner join carries source/lang into the cut's passthrough columns;
    // intervals are computed on what will actually ship, so passages
    // repeated solely between a survivor and an already-dropped
    // duplicate do not trigger cuts
    val base = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val docs =
      if (!excise)
        base.join(survivors, Seq("doc_id"))
          .withColumn("excised_tokens", lit(0L))
      else {
        // q173's pipeline against the q81 benchmark split: the eval docs
        // ride in only to contribute windows (s3 ⊆ ¬eval, so the union
        // is disjoint); output is the excised train side
        val isEval =
          pmod(col("doc_id"), lit(Dedup.EvalSetModulus.toLong)) === 0L
        val cutInput = base
          .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi")
          .unionByName(base.filter(isEval))
        Dedup.decontamCutWith(cutInput, isEval, Dedup.DecontamSpanW)
          .select(col("doc_id"), col("clean_text").as("text"),
            col("n_tokens_cut").as("excised_tokens"))
          .join(survivors, Seq("doc_id"))
      }
    val (cleaned, rounds) = Dedup.cutFixpointWithRounds(docs)

    // UniMax budget annotation (q199): every shipped document carries the
    // training-epoch weight its LANGUAGE receives under the epoch-capped
    // uniform budget — the mixture-ready column a trainer's sampler reads
    // directly, computed over what actually ships (post-cut kept tokens).
    // The per-lang aggregation re-reads only the fixpoint's checkpointed
    // output (language-dimension rows; broadcast back onto the write plan).
    val kept = cleaned.filter(col("n_tokens_kept") > 0)
    val langTotals = kept.groupBy(col("lang"))
      .agg(sum(col("n_tokens_kept")).as("n"))
    val quotas = graft.ops.SamplingOps.unimaxBudgetDf(langTotals)
      .select(col("lang"), col("epochs"))

    val writeObs = Observation("corpus-write")
    val out = kept
      .join(broadcast(quotas), Seq("lang"), "left")
      .select(col("doc_id"), col("clean_text").as("text"), col("lang"),
        col("source"), length(col("clean_text")).as("n_chars"),
        col("n_tokens_kept"),
        // cumulative: benchmark excision + repeated-span fixpoint cut
        (col("excised_tokens") + col("n_tokens_cut")).as("n_tokens_cut"),
        coalesce(col("epochs"), lit(1.0)).as("epochs"))
      .observe(writeObs,
        count(lit(1)).as("n_written"),
        sum(col("n_tokens_kept")).as("tokens_kept"),
        sum(col("n_tokens_cut")).as("tokens_cut"))
    graft.ops.PartitionedSink.write(out, Seq("source"), outDir)

    // release-integrity manifest (the q185 digest kernel) — computed from
    // a READ-BACK of the published files, deliberately: an integrity
    // digest must witness what is on disk, not what was in memory, so
    // this one extra read of the (already-curated, small relative to the
    // input) corpus is the semantics, not an accident. A replica that
    // re-derives the same manifest from its copy can diff the two
    // 64-row tables and localize any divergence to 1/64th of the ids
    // without ever joining row-level data (see LakehouseOps.manifestDiff).
    graft.ops.LakehouseOps
      .digestManifest(spark.read.parquet(outDir),
        col("doc_id"), md5(col("text").cast("binary")))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(outDir + "_manifest")

    // packing-layout manifest (the q210 kernel) — the chunk table a
    // training loader consumes (doc ranges, fill, boundary-crossing
    // counts) PLUS the standing token total that makes future appends
    // O(delta) (q216 continues the stream from this number alone). Same
    // read-back discipline as the digest manifest: the layout must
    // witness the shipped files. repartition(1), NOT coalesce(1): the
    // chunk table is corpus_tokens/PackLen rows (corpus-LINEAR, unlike
    // the 64-row digest manifest), and a narrow coalesce would pull the
    // whole chunk aggregation into one task — repartition keeps the agg
    // parallel and single-tasks only the (already reduced) write. A
    // deployment whose chunk table outgrows one file drops the
    // repartition and partitions by chunk range instead.
    graft.ops.PackingOps.packChunksDf(spark.read.parquet(outDir))
      .repartition(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(outDir + "_packing")

    def l(m: Map[String, Any], k: String): Long = m(k) match {
      case null => 0L // sum() over zero rows observes as null
      case v: Long => v
      case v: Number => v.longValue()
    }
    val f = funnelObs.get
    val w = writeObs.get
    val (nRaw, nSurvivors) = (l(f, "n_raw"), l(f, if (excise) "n_s3" else "n_s4"))
    val nWritten = l(w, "n_written")
    import spark.implicits._
    Seq((nRaw, nSurvivors, nWritten, nSurvivors - nWritten,
      l(w, "tokens_kept"), l(w, "tokens_cut"), rounds.toLong,
      if (excise) "excise" else "drop"))
      .toDF("n_raw", "n_survivors", "n_written", "n_cut_to_empty",
        "tokens_kept", "tokens_cut", "cut_rounds", "decontam")
  }
}

object CorpusBuildMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CorpusBuildMain <sfDir> <outDir> [drop|excise]")
    val spark = graft.functions.chess.session("graft-corpus-build",
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).headOption.foreach(m =>
      spark.conf.set(CorpusBuild.DecontamModeKey, m))
    val t0 = System.nanoTime()
    val manifest = CorpusBuild.run(spark, args(0), args(1))
    manifest.show(truncate = false)
    println(f"[corpus-build] wall: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
