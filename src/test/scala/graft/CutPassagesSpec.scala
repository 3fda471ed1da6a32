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

  test("q176 fixpoint cut: junction-minted repeats are cut in later rounds") {
    val s = spark
    import s.implicits._
    // P repeats in docs 1/2 → cut in round 1. Cutting P from doc 1 splices
    // a1..a4 against b1..b4 — a junction window IDENTICAL to doc 5's whole
    // text, which was unique in the original corpus. Round 2 must see the
    // minted repeat and cut both copies; q171's single pass must NOT.
    val p = (1 to 8).map(i => s"p$i").mkString(" ")
    val a = (1 to 4).map(i => s"a$i").mkString(" ")
    val b = (1 to 4).map(i => s"b$i").mkString(" ")
    val c = (1 to 4).map(i => s"c$i").mkString(" ")
    val d = (1 to 4).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a $p $b"), // P at 5..12; round-1 cut splices "a… b…"
      (2L, s"$c $p $d"), // P at 5..12; spliced "c… d…" stays unique
      (5L, s"$a $b"))    // the pre-existing copy of doc 1's junction
      .toDF("doc_id", "text")

    val onePass = Dedup.cutPassagesDf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(onePass(1L) == s"$a $b",
      "single pass leaves the junction-minted repeat in place")

    val (fixed, rounds) = Dedup.cutFixpointWithRounds(docs)
    val rows = fixed.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rounds == 2, s"fixture needs exactly 2 cutting rounds, ran $rounds")
    assert(rows(1L) == (("", 0L, 16L)), "doc 1 loses P and then the minted repeat")
    assert(rows(5L) == (("", 0L, 8L)), "doc 5 loses its copy of the minted repeat")
    assert(rows(2L) == ((s"$c $d", 8L, 8L)), "doc 2's splice stays unique")
  }

  test("q176 gate corpus: span index of the fixpoint output is EMPTY; " +
    "doc count and token accounting preserved") {
    val docs = graft.Tables.documents(spark, sf)
    val (cleaned0, rounds) = Dedup.cutFixpointWithRounds(docs)
    val cleaned = cleaned0.localCheckpoint()
    info(s"cutting rounds to fixpoint at sf0.001: $rounds")
    assert(rounds >= 1 && rounds < Dedup.CutFixpointMaxRounds,
      "gate corpus must converge strictly inside the runaway cap")

    val nDocs = docs.count()
    assert(cleaned.count() == nDocs)
    val bad = cleaned.join(
        docs.select(col("doc_id"),
          size(Portable.toks(col("text"))).cast("long").as("n_orig")),
        Seq("doc_id"))
      .filter(col("n_tokens_kept") + col("n_tokens_cut") =!= col("n_orig"))
      .count()
    assert(bad == 0, "cumulative token accounting must stay exact per document")

    // THE fixpoint invariant (strengthens q171's no-ORIGINAL-span check):
    // the q168 index of the output has no entry at all
    val residue = Dedup.repeatedSpansDf(
      cleaned.select(col("doc_id"), col("clean_text").as("text"))).count()
    assert(residue == 0,
      s"fixpoint output still carries $residue repeated spans")

    // and it cuts strictly more than the single pass (the measured q171
    // residue is what the extra rounds remove)
    val cutFix = cleaned.agg(sum(col("n_tokens_cut"))).head.getLong(0)
    val cutOne = Dedup.cutPassagesDf(docs)
      .agg(sum(col("n_tokens_cut"))).head.getLong(0)
    assert(cutFix >= cutOne)
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

  test("redundancyShare: bounded, consistent with the q168 index, covers every doc") {
    val rows = Dedup.redundancyShare(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { case (id, nw, nr, red) =>
      assert(nr <= nw, s"doc $id: repeated $nr > windows $nw")
      assert(red >= 0.0 && red <= 1.0)
      if (nw == 0) assert(red == 0.0 && nr == 0)
    }
    // Σ per-doc repeated windows == Σ occurrence counts over the q168 index
    val idxOcc = Dedup.repeatedSpans(spark, sf)
      .agg(sum("n_occ")).collect()(0).getLong(0)
    assert(rows.map(_._3).sum == idxOcc,
      s"per-doc repeated mass ${rows.map(_._3).sum} != index mass $idxOcc")
  }

  test("spanIndexDelta = repeated(full) − repeated(base), counts consistent") {
    val delta = Dedup.spanIndexDelta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    delta.foreach { case (fp, nb, nd, nt, newE) =>
      assert(nb < 2 && nd >= 1 && nt == nb + nd && nt >= 2)
      assert((newE == 1) == (nb == 0), s"fp $fp new_entry flag wrong")
    }
    // independent reconstruction: the delta's fp set is exactly the
    // full-corpus repeated set minus the base-only repeated set
    val full = Dedup.repeatedSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val base = Dedup.repeatedSpansDf(
      graft.Tables.documents(spark, sf)
        .filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.lit(
            Dedup.SpanDeltaModulus.toLong)) =!= 0L))
      .collect().map(_.getLong(0)).toSet
    assert(delta.map(_._1).toSet == full.keySet -- base,
      "delta fps must be the newly-repeated spans")
    // and the promoted counts agree with the full index
    delta.foreach { case (fp, _, _, nt, _) =>
      assert(full(fp) == nt, s"fp $fp: total $nt != index ${full(fp)}")
    }
  }
}
