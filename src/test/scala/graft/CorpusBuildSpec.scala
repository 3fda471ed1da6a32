package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.{CurationPipeline, Dedup}
import graft.pipeline.CorpusBuild

/** The corpus sink end-to-end on the gate corpus: the written artifact
  * must satisfy every property the composing operators promise —
  * survivor selection, span hygiene, layout, and a manifest that cannot
  * disagree with the files on disk.
  */
class CorpusBuildSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("build writes the curated corpus; stats, hygiene and layout all hold") {
    val out = Files.createTempDirectory("corpus_build").resolve("corpus").toString
    val stats = CorpusBuild.run(spark, sf, out).head()
    val (nRaw, nSurv, nWritten, nEmpty, kept, cut) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2),
        stats.getLong(3), stats.getLong(4), stats.getLong(5))
    val rounds = stats.getLong(6)

    // the manifest's observe()d counts must match independent
    // recomputation ("today's values" — the funnel is NOT re-driven
    // inside run itself)
    assert(nRaw == graft.Tables.documents(spark, sf).count())
    val flags = CurationPipeline.survivorFlags(spark, sf)
    assert(nSurv == flags.filter(col("s4")).count())
    assert(nWritten + nEmpty == nSurv)
    assert(nSurv > 0 && nWritten > 0, "gate corpus must yield survivors")
    assert(rounds >= 0 && rounds < Dedup.CutFixpointMaxRounds,
      "the fixpoint cut must converge inside the runaway cap")

    val written = spark.read.parquet(out)
    assert(written.count() == nWritten)
    // source=... partition layout on disk
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("source=")))
    // token accounting matches the files
    val a = written.agg(sum(col("n_tokens_kept")), sum(col("n_tokens_cut"))).head()
    assert(a.getLong(0) == kept && a.getLong(1) == cut)

    // document-level hygiene: no exact-dup fingerprints among written docs
    val fps = written.select(
      md5(to_binary(lower(regexp_replace(trim(col("text")), "\\s+", " ")),
        lit("utf-8"))).as("fp"))
    assert(fps.distinct().count() == nWritten,
      "written corpus must contain no exact duplicates")
    // decontamination: no written doc is in the q81 contamination list
    val contaminated = Dedup.contamination(spark, sf).select(col("doc_id"))
    assert(written.join(contaminated, Seq("doc_id"), "left_semi").count() == 0)
    // span hygiene AT FIXPOINT: the q168 index of the SHIPPED corpus is
    // empty — no repeated window at all, original or junction-minted
    // (strengthens the previous no-ORIGINAL-span invariant; note the
    // index is computed over the written files, so empty-cut drops
    // cannot mask anything)
    val residue = Dedup.repeatedSpansDf(
      written.select(col("doc_id"), col("text"))).count()
    assert(residue == 0,
      s"the shipped corpus still carries $residue repeated spans")

    // release-integrity manifest: written next to the corpus, agrees
    // bit-for-bit with a replica's independent recompute from the files,
    // and localizes a single-document tamper to exactly one bucket
    val manifest = spark.read.parquet(out + "_manifest")
    def digest(df: org.apache.spark.sql.DataFrame) =
      graft.ops.LakehouseOps.digestManifest(df,
        col("doc_id"), md5(col("text").cast("binary")))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val published = manifest.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(digest(written) == published,
      "manifest must recompute bit-identically from the published files")
    val tampered = written.withColumn("text",
      when(col("doc_id") === written.select(min(col("doc_id"))).head().getLong(0),
        concat(col("text"), lit(" tampered"))).otherwise(col("text")))
    val diff = digest(tampered).toSet.diff(published.toSet)
    assert(diff.size == 1, s"a one-doc tamper must flip exactly one bucket: $diff")

    // UniMax budget annotation: every shipped doc carries its language's
    // epoch weight — positive, capped, constant within a language, and
    // conserving the q199 budget over the shipped token mass (up to the
    // r4 grid on per-lang epochs)
    val ep = written.select(col("lang"), col("epochs"), col("n_tokens_kept"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(ep.forall { case (_, e, _) =>
      e > 0.0 && e <= graft.ops.SamplingOps.UnimaxEpochCap.toDouble + 1e-9 })
    ep.groupBy(_._1).foreach { case (l, rs) =>
      assert(rs.map(_._2).distinct.length == 1, s"lang $l: epochs not constant")
    }
    val totalKept = ep.map(_._3).sum.toDouble
    val budgeted = ep.map { case (_, e, n) => e * n }.sum
    val target = graft.ops.SamplingOps.UnimaxBudgetFactor.toDouble * totalKept
    assert(math.abs(budgeted - target) <= 1e-4 * totalKept + 1.0,
      s"budget not conserved: $budgeted vs $target")

    // packing-layout manifest: the q210 chunk table over the SHIPPED
    // files — token mass agrees with the cut accounting (two independent
    // token paths: the fixpoint's n_tokens_kept vs re-tokenizing the
    // published text), chunk ids dense, every chunk but the last full
    val packing = spark.read.parquet(out + "_packing").collect()
      .map(r => (r.getLong(0), r.getLong(4))).sortBy(_._1)
    assert(packing.map(_._2).sum == kept,
      "packed token mass must equal the manifest's tokens_kept")
    assert(packing.head._1 == 0L &&
      packing.map(_._1).zip(packing.map(_._1).tail)
        .forall { case (x, y) => y == x + 1 }, "chunk ids must be dense")
    assert(packing.init.forall(_._2 == graft.ops.PackingOps.PackLen),
      "every chunk but the last must be exactly full")
  }

  test("excise mode keeps the documents and cuts the benchmark overlap instead") {
    val outDrop = Files.createTempDirectory("corpus_drop").resolve("c").toString
    val dropStats = CorpusBuild.run(spark, sf, outDrop).head()
    spark.conf.set(CorpusBuild.DecontamModeKey, "excise")
    try {
      val out = Files.createTempDirectory("corpus_excise").resolve("c").toString
      val stats = CorpusBuild.run(spark, sf, out).head()
      assert(stats.getString(7) == "excise")
      // the policy's point: the doc-drop rule discards every s3 survivor
      // that shares any 3-gram with the benchmark; excision retains them
      assert(stats.getLong(1) >= dropStats.getLong(1),
        "excise mode must keep at least the drop-mode survivor count")
      assert(stats.getLong(2) >= dropStats.getLong(2))

      val written = spark.read.parquet(out)
      assert(written.count() == stats.getLong(2))
      // decontamination invariant at the EXCISION granularity: no written
      // doc shares a 13-token window with the q81 benchmark split
      val docs = graft.Tables.documents(spark, sf)
      val isEval = pmod(col("doc_id"), lit(Dedup.EvalSetModulus.toLong)) === 0L
      val evalFps = docs.filter(isEval).select(
        explode(graft.functions.chess.spanHashes(col("text"),
          Dedup.DecontamSpanW)).as("fp")).distinct()
      val shared = written.select(
          explode(graft.functions.chess.spanHashes(col("text"),
            Dedup.DecontamSpanW)).as("fp"))
        .join(evalFps, Seq("fp"), "left_semi").count()
      assert(shared == 0,
        s"$shared benchmark windows survived the excision build")
      // span hygiene still holds on the excised corpus
      assert(Dedup.repeatedSpansDf(
        written.select(col("doc_id"), col("text"))).count() == 0)
      // cumulative token accounting: kept + (excision + span) cut = orig
      val bad = written.join(
          docs.select(col("doc_id"),
            size(graft.ops.Portable.toks(col("text"))).cast("long").as("n_orig")),
          Seq("doc_id"))
        .filter(col("n_tokens_kept") + col("n_tokens_cut") =!= col("n_orig"))
        .count()
      assert(bad == 0, "token accounting must cover both cut stages")
    } finally spark.conf.unset(CorpusBuild.DecontamModeKey)
  }
}
