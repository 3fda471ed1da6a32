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
}
