package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Portable}

/** q171 corpus cut pass: applying q169's maximal-passage intervals and
  * emitting the cleaned corpus — fixture semantics plus the family
  * invariants on the real gate corpus.
  */
class CutPassagesSpec extends AnyFunSuite with SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("cutPassages removes every occurrence; uncut docs pass through; " +
    "fully-duplicated docs survive empty") {
    val s = spark
    import s.implicits._
    // an 8-token passage P shared by docs 1/2/3 in distinct contexts; the
    // context windows are unique so the cut interval is exactly P's span
    val p = (1 to 8).map(i => s"p$i").mkString(" ")
    val u = (1 to 8).map(i => s"u$i").mkString(" ")
    val v = (1 to 8).map(i => s"v$i").mkString(" ")
    val w = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$u $p"), // P at tokens 9-16
      (2L, s"$p $v"), // P at tokens 1-8
      (3L, p),        // doc IS the passage → cut to empty
      (4L, w))        // untouched
      .toDF("doc_id", "text")
    val rows = Dedup.cutPassagesDf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L),
      "every input document appears exactly once")
    assert(rows(1L) == ((u, 8L, 8L)))
    assert(rows(2L) == ((v, 8L, 8L)))
    assert(rows(3L) == (("", 0L, 8L)), "fully-duplicated doc survives empty")
    assert(rows(4L) == ((w, 8L, 0L)), "doc with no repeated passage untouched")
  }

  test("gate corpus: doc-count preserved, token accounting exact, " +
    "no original repeated span survives the cut") {
    val docs = graft.Tables.documents(spark, sf)
    val cleaned = Dedup.cutPassagesDf(docs)

    // every document exactly once
    val nDocs = docs.count()
    assert(cleaned.count() == nDocs)
    assert(cleaned.select("doc_id").distinct().count() == nDocs)

    // kept + cut == original token count, per doc
    val bad = cleaned.join(
        docs.select(col("doc_id"),
          size(Portable.toks(col("text"))).cast("long").as("n_orig")),
        Seq("doc_id"))
      .filter(col("n_tokens_kept") + col("n_tokens_cut") =!= col("n_orig"))
      .count()
    assert(bad == 0, "token accounting must be exact per document")

    // the corpus actually has repeated passages to cut at this sf
    val cut = cleaned.agg(sum(col("n_tokens_cut"))).head.getLong(0)
    assert(cut > 0, "gate corpus is known to contain repeated passages")

    // FAMILY INVARIANT: every window that repeated in the ORIGINAL corpus
    // is gone from every document — the q168 index of the output shares
    // no fingerprint with the original repeated-span set. (One pass is
    // not a fixpoint: junction windows can mint NEW repeats — measured
    // below — but original repeats must never survive.)
    val origRep = Dedup.repeatedSpansDf(docs).select(col("span_fp"))
    val cleanDocs = cleaned.select(col("doc_id"), col("clean_text").as("text"))
    val cleanSpans = cleanDocs.select(
      explode(graft.functions.chess.spanHashes8(col("text"))).as("span_fp"))
    val survivors = cleanSpans.join(origRep, Seq("span_fp"), "left_semi").count()
    assert(survivors == 0,
      s"$survivors original repeated-span occurrences survived the cut")

    // residue probe: NEW repeats minted by junction adjacency (the
    // non-idempotence Lee et al. §4 document). Not asserted zero — just
    // bounded sanely: strictly fewer repeated fps than the original index
    // (the pass must converge when iterated).
    val origCnt = origRep.count()
    val residue = Dedup.repeatedSpansDf(cleanDocs).count()
    info(s"residual repeated spans after one pass: $residue (was $origCnt)")
    assert(residue < origCnt,
      "one cut pass must strictly shrink the repeated-span index")
  }

  test("q173 decontamCut: excises exactly the verified shared windows; " +
    "eval docs excluded; clean train docs pass through") {
    val s = spark
    import s.implicits._
    val w = Dedup.DecontamSpanW // 13
    val e = (1 to w).map(i => s"e$i").mkString(" ")   // the benchmark passage
    val u = (1 to w).map(i => s"u$i").mkString(" ")   // unique train context
    val v = (1 to w).map(i => s"v$i").mkString(" ")
    val y = (1 to w - 1).map(i => s"y$i").mkString(" ") // 12-token eval pad:
    // its mixed y/e windows exist only in doc 20, so train hits are E alone
    // (a full-13-token eval context would itself become a shared window)
    val docs = Seq(
      (10L, e),               // eval doc: the passage alone
      (20L, s"$y $e"),        // eval doc: the passage in (unique) context
      (1L, s"$u $e $v"),      // train: E at tokens 14..26 → cut to u+v
      (2L, e),                // train: IS the passage → survives empty
      (3L, v),                // train: clean → untouched
      (4L, s"$u $v"))         // train: shares tokens with doc 1 but no window
      .toDF("doc_id", "text")
    val rows = Dedup.decontamCutDf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // eval docs are not in the output; every train doc exactly once
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    assert(rows(1L) == ((s"$u $v", 2L * w, w.toLong)),
      "exactly E's span is cut and the clean context splices")
    assert(rows(2L) == (("", 0L, w.toLong)), "fully-contaminated doc survives empty")
    assert(rows(3L) == ((v, w.toLong, 0L)))
    assert(rows(4L) == ((s"$u $v", 2L * w, 0L)),
      "token overlap without a shared 13-window cuts nothing")

    // independent reference: recompute the shared-window cover per train
    // doc by brute force and require the cut count to equal it
    val evalWins = docs.filter($"doc_id" % 10 === 0).collect().flatMap { r =>
      r.getString(1).split(" ").sliding(w).map(_.mkString(" "))
    }.toSet
    docs.filter($"doc_id" % 10 =!= 0).collect().foreach { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      val covered = toks.sliding(w).zipWithIndex.collect {
        case (win, i) if evalWins(win.mkString(" ")) => i
      }.flatMap(p => p until p + w).distinct.size
      assert(rows(r.getLong(0))._3 == covered.toLong,
        s"doc ${r.getLong(0)}: cut tokens must equal the reference cover")
    }
  }

  test("q173 gate corpus: output re-scan shares no verified window with the eval split") {
    val docs = graft.Tables.documents(spark, sf)
    val cleaned = Dedup.decontamCutDf(docs)
    val isEval = pmod(col("doc_id"), lit(Dedup.DecontamEvalModulus.toLong)) === 0L
    // train-doc count preserved
    assert(cleaned.count() == docs.filter(!isEval).count())
    // something was actually cut at this sf (the mod-10 split straddles
    // the synthetic near-dup clusters)
    assert(cleaned.agg(sum(col("n_tokens_cut"))).head.getLong(0) > 0)
    // invariant: re-indexing the cleaned output at width 13 yields no
    // window present in the eval split (cuts removed every occurrence)
    val evalFps = docs.filter(isEval).select(
      explode(graft.functions.chess.spanHashes(col("text"),
        Dedup.DecontamSpanW)).as("fp")).distinct()
    val survivors = cleaned
      .select(col("doc_id"),
        explode(graft.functions.chess.spanHashes(col("clean_text"),
          Dedup.DecontamSpanW)).as("fp"))
      .join(evalFps, Seq("fp"), "left_semi").count()
    assert(survivors == 0,
      s"$survivors contaminated windows survived the excision")
  }
}
