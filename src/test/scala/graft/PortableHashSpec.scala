package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.{chess, PortableHash}
import graft.ops.Portable

/** The native hash/vector kernels (graft.functions.PortableHash*) replaced
  * interpreted HOF formulations for performance; these tests pin each native
  * expression to the HOF formulation it replaced, evaluated in the same
  * session — any semantic drift (tokenization, hash, arithmetic order) fails
  * here before it can silently break oracle parity.
  */
class PortableHashSpec extends AnyFunSuite with SparkTestBase {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "  leading and   irregular\twhitespace\n tokens  ",
    "one two",            // < 3 tokens → no shingles
    "a b c",              // exactly one shingle
    "dup dup dup dup",    // repeated shingles → distinct
    "",                   // empty
    "unicode λ tokens é mixed ascii"
  )

  private def df = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
  }

  test("toks matches the filter(split(trim)) HOF formulation") {
    val hofToks = filter(split(trim(col("text")), "\\s+"), t => length(t) > 0)
    val rows = df.select(chess.toks(col("text")).as("native"),
      hofToks.as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"drift on $r")
    }
    // null propagates like the HOF chain
    val s = spark
    import s.implicits._
    val n = Seq[Option[String]](None, Some("a  b")).toDF("text")
      .select(chess.toks(col("text"))).collect()
    assert(n(0).isNullAt(0) && n(1).getSeq[String](0) == Seq("a", "b"))
  }

  test("shingle_hashes matches the zip_with/array_distinct HOF formulation") {
    val hofShingles = {
      val hs = transform(
        filter(split(trim(col("text")), "\\s+"), t => length(t) > 0),
        t => Portable.h32(t))
      val s1 = slice(hs, lit(2), greatest(size(hs) - 1, lit(0)))
      val s2 = slice(hs, lit(3), greatest(size(hs) - 2, lit(0)))
      val pair = zip_with(hs, s1, (a, b) => a * 31 + b)
      val trip = zip_with(pair, s2, (p, c) => p * 31 + c)
      array_distinct(filter(trip, x => x.isNotNull))
    }
    val rows = df.select(chess.shingleHashes(col("text")).as("native"),
      hofShingles.as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"drift on $r")
    }
  }

  test("span_hashes8 matches the transform-over-sequence HOF formulation") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "one two three four five six seven eight nine ten",  // 10 toks → 3 spans
      "a b c d e f g h",                                   // exactly 8 → 1 span
      "a b c d e f g",                                     // 7 → empty
      "x x x x x x x x x x x x",        // 12 identical → 5 EQUAL spans kept
      "  irregular   ws\tmix one two three four five six ", // tokenizer parity
      "")
    val hofSpans = {
      val t = Portable.toks(col("text"))
      val w = PortableHash.SpanW
      when(size(t) >= w,
        transform(sequence(lit(1), size(t) - (w - 1)),
          i => Portable.h64(array_join(slice(t, i, lit(w)), " "))))
        .otherwise(array().cast("array<bigint>"))
    }
    val rows = cases.toDF("text")
      .select(chess.spanHashes8(col("text")).as("native"), hofSpans.as("hof"))
      .collect()
    rows.zip(cases).foreach { case (r, text) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"drift on '$text'")
    }
    // occurrences kept, position order: the identical-token case yields
    // n-W+1 spans, all equal (the repeated-span index counts these)
    val rep = rows(3).getSeq[Long](0)
    assert(rep.length == 5 && rep.toSet.size == 1)
    // the parameterized kernel at the q170 width (13): same HOF pin
    val w13 = 13
    val hof13 = {
      val t = Portable.toks(col("text"))
      when(size(t) >= w13,
        transform(sequence(lit(1), size(t) - (w13 - 1)),
          i => Portable.h64(array_join(slice(t, i, lit(w13)), " "))))
        .otherwise(array().cast("array<bigint>"))
    }
    val long = (1 to 20).map(i => s"w$i").mkString(" ")
    Seq(long, "a b c", "").toDF("text")
      .select(chess.spanHashes(col("text"), w13).as("native"), hof13.as("hof"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), "W=13 drift")
      }
    // span_hashes8 must be exactly span_hashes(_, 8)
    val both = cases.toDF("text")
      .select(chess.spanHashes8(col("text")).as("a"),
        chess.spanHashes(col("text"), PortableHash.SpanW).as("b"))
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // width must be a plan-time constant >= 2
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("text").select(chess.spanHashes(col("text"), 1)).collect()
    }
  }

  test("minimizer_hashes matches array_min-over-slices of span_hashes") {
    val s = spark
    import s.implicits._
    val k = graft.ops.Dedup.WinnowK
    val w = graft.ops.Dedup.WinnowW
    val cases = Seq(
      "one two three four five six seven eight nine ten eleven twelve",
      "a b c d e f g h",                 // exactly k+w-1 tokens → 1 window
      "a b c d e f g",                   // k+w-2 → empty
      "x x x x x x x x x x x x x x",     // identical spans → ties everywhere
      "  irregular   ws\tmix one two three four five six seven eight ",
      "")
    val hofMins = {
      val spans = chess.spanHashes(col("text"), k)
      when(size(spans) >= w,
        transform(sequence(lit(1), size(spans) - (w - 1)),
          i => array_min(slice(spans, i, lit(w)))))
        .otherwise(array().cast("array<bigint>"))
    }
    val rows = cases.toDF("text")
      .select(chess.minimizerHashes(col("text"), k, w).as("native"),
        hofMins.as("hof"))
      .collect()
    rows.zip(cases).foreach { case (r, text) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"drift on '$text'")
    }
  }

  test("winnowing guarantee: a shared k+w-1 token run always shares a minimizer") {
    val s = spark
    import s.implicits._
    val k = graft.ops.Dedup.WinnowK
    val w = graft.ops.Dedup.WinnowW
    // shared run of exactly k+w-1 = 8 tokens, embedded in unrelated context
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    assert(run.split(" ").length == k + w - 1)
    val docs = Seq(
      s"completely unrelated prefix text here $run and a different tail",
      s"other document begins otherwise $run closing with new words")
    val sketches = docs.toDF("text")
      .select(array_distinct(
        chess.minimizerHashes(col("text"), k, w)).as("fps"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(sketches(0).intersect(sketches(1)).nonEmpty,
      "guaranteed shared minimizer missing")
    // sketch is a real compression: strictly fewer distinct minimizers
    // than span windows for a long document
    val longDoc = (1 to 200).map(i => s"tok$i").mkString(" ")
    val Seq(nSpans, nMins) = Seq(
      chess.spanHashes(col("text"), k),
      array_distinct(chess.minimizerHashes(col("text"), k, w))).map(c =>
      Seq(longDoc).toDF("text").select(size(c)).collect().head.getInt(0))
    assert(nMins > 0 && nMins < nSpans,
      s"sketch not compressing: $nMins vs $nSpans")
  }

  test("cdc_chunks: partition invariant, cut rule, edge cases, shift resistance") {
    val s = spark
    import s.implicits._
    val k = graft.ops.Dedup.CdcK
    val m = graft.ops.Dedup.CdcMod
    val base = (1 to 120).map(i => s"w${i % 37}x$i").mkString(" ")
    val edited = base.split(" ").patch(60, Seq("INSERTED"), 0).mkString(" ")
    val cases = Seq(base, edited, "one two three", "", "single")
    val rows = cases.toDF("text")
      .select(chess.cdcChunks(col("text"), k, m).as("ch"),
        size(Portable.toks(col("text"))).as("n"))
      .collect()
    // chunk lengths partition the token stream exactly
    rows.foreach { r =>
      val lens = r.getSeq[Row](0).map(_.getInt(1))
      assert(lens.sum == r.getInt(1), s"lens $lens != ${r.getInt(1)} tokens")
      assert(lens.forall(_ > 0))
    }
    // < k tokens → exactly one whole-document chunk; empty → none
    assert(rows(2).getSeq[Row](0).length == 1)
    assert(rows(3).getSeq[Row](0).isEmpty)
    assert(rows(4).getSeq[Row](0).length == 1)
    // shift resistance: one inserted token preserves all chunks except the
    // O(1) neighborhood of the edit
    val fpBase = rows(0).getSeq[Row](0).map(_.getLong(0))
    val fpEdit = rows(1).getSeq[Row](0).map(_.getLong(0))
    val shared = fpBase.toSet.intersect(fpEdit.toSet).size
    assert(fpBase.size > 3, s"base must chunk (got ${fpBase.size})")
    assert(fpBase.size - shared <= 2,
      s"edit disturbed ${fpBase.size - shared} of ${fpBase.size} chunks")
    // a fixed-grid chunking of the same width loses every chunk after the
    // insertion point (the contrast the operator exists for)
    def grid(toks: Array[String]) =
      toks.grouped(m).map(_.mkString(" ")).toSeq
    val gb = grid(base.split(" "))
    val ge = grid(edited.split(" "))
    val gridShared = gb.toSet.intersect(ge.toSet).size
    assert(gridShared < shared,
      s"fixed grid kept $gridShared, CDC kept $shared — CDC must win")
  }

  test("simhash32 matches the aggregate/zip_with HOF formulation") {
    val ths = transform(
      filter(split(trim(col("text")), "\\s+"), t => length(t) > 0),
      t => Portable.h32(t))
    val bitSums = aggregate(
      ths,
      array_repeat(lit(0L), 32),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(31)),
          i => call_function("shiftright", h, i).bitwiseAND(1L) * 2 - 1),
        (x, y) => x + y))
    val hofSim = aggregate(
      zip_with(bitSums, sequence(lit(0), lit(31)),
        (s, i) => when(s > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
    val rows = df.select(chess.simhash32(col("text")), hofSim).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"drift on $r"))
  }

  test("minhash_sigs matches per-permutation array_min(transform) and is null on empty") {
    val p = PortableHash.P
    val shingles = chess.shingleHashes(col("text"))
    val hofSigs = PortableHash.HashParams.map { case (a, b) =>
      array_min(transform(shingles, h => ((h % p) * a + b) % p))
    }
    val rows = df.select(chess.minhashSigs(shingles).as("native"),
      array(hofSigs: _*).as("hof"), size(shingles).as("n")).collect()
    rows.foreach { r =>
      if (r.getInt(2) == 0) assert(r.isNullAt(0), s"expected null sigs: $r")
      else assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"drift on $r")
    }
  }

  test("vec_dot and hyperplane_bucket match HOF dot / literal element_at chain") {
    val s = spark
    import s.implicits._
    val vecs = Seq.tabulate(6) { v =>
      (v.toLong, Array.tabulate(PortableHash.Dim)(d =>
        (math.sin(v * 131 + d).toFloat)))
    }.toDF("vec_id", "embedding")
    val hofDot = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val litBucket = PortableHash.Hyperplanes.toSeq.zipWithIndex.map { case (plane, i) =>
      val d = plane.zipWithIndex.map { case (pv, di) =>
        element_at(col("embedding"), di + 1).cast("double") * lit(pv)
      }.reduce(_ + _)
      when(d > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = vecs.select(
      chess.vecDot(col("embedding"), col("embedding")), hofDot,
      chess.hyperplaneBucket(col("embedding")), litBucket).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"dot drift on $r")
      assert(r.getLong(2) == r.getLong(3), s"bucket drift on $r")
    }
  }

  test("vec_dot fails loudly on mismatched vector lengths") {
    // a silent min-length truncation would diverge from the oracle's fixed
    // 1..dim sum with no signal (ADVICE r2); contract now matches
    // hyperplane_bucket's fail-loud behavior
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(chess.vecDot(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).flatMap(c => Option(c.getMessage)).exists(_.contains("equal-length")),
      s"unexpected failure: $e")
  }

  test("lang_id matches the explode + broadcast-join + agg formulation") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "table scan join filter"),            // sqlish
      (2L, "stream window stream batch event"),  // streamy (with multiplicity)
      (3L, "nothing matching here at all"),      // und
      (4L, "table stream row"),                  // 3-way tie → lang ASC
      (5L, "")).toDF("doc_id", "text")
    val markers = PortableHash.LangProfiles
      .flatMap { case (l, ws) => ws.map(w => (l, w)) }.toDF("p_lang", "word")
    val hits = docs
      .select(col("doc_id"), explode(filter(split(trim(col("text")), "\\s+"),
        t => length(t) > 0)).as("word"))
      .join(broadcast(markers), "word")
      .groupBy(col("doc_id"), col("p_lang")).agg(count(lit(1)).as("score"))
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("score")).as("neg"), col("p_lang").as("l"))).as("best"))
      .select(col("doc_id"), col("best.l").as("lang"), (-col("best.neg")).as("score"))
    val declarative = docs.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("score"), lit(0L)).as("score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val native = docs.select(col("doc_id"),
        chess.langId(col("text")).getField("lang").as("lang"),
        chess.langId(col("text")).getField("score").as("score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(native == declarative, s"native $native vs declarative $declarative")
  }

  test("native expressions are SQL-callable via the registry") {
    df.createOrReplaceTempView("pht")
    val r = spark.sql(
      """SELECT simhash32(text) AS sh, size(shingle_hashes(text)) AS ns
        |FROM pht WHERE text LIKE 'the quick%'""".stripMargin).head()
    assert(r.getAs[Int]("ns") == 7) // 9 tokens, 7 trigrams, all distinct
  }

  test("char_class_counts matches the three-regex formulation (incl. edge cases)") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "hello world 42 foo7bar, baz!",
      "",                         // empty
      "   \t\n",                  // whitespace only
      "123abc456def",             // alternating runs, no separators
      "!!!",                      // punct only
      "a1b2c3",                   // single-char runs
      "héllo wörld",              // non-ASCII letters are NOT [A-Za-z]
      "tab\therevtab",      // \x0B is regex \s
      " nbsp",               // NBSP: punct under ASCII \s, 1 code point
      "emoji 😀 end")   // supplementary char = ONE punct match
    val df = cases.toDF("text")
    val native = graft.functions.chess.charClassCounts(col("text"))
    val rows = df.select(
      native.getField("n_words").as("w"),
      native.getField("n_numbers").as("n"),
      native.getField("n_punct").as("p"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).as("rw"),
      size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("rn"),
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("rp"))
      .collect()
    rows.zip(cases).foreach { case (r, text) =>
      assert(r.getInt(0) == r.getInt(3) && r.getInt(1) == r.getInt(4) &&
        r.getInt(2) == r.getInt(5),
        s"mismatch on '$text': native=(${r.getInt(0)},${r.getInt(1)},${r.getInt(2)}) " +
          s"regex=(${r.getInt(3)},${r.getInt(4)},${r.getInt(5)})")
    }
  }
}
