package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

class TextOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bpeTrain: merge weights are non-increasing and merges are distinct") {
    // classic BPE invariant: a merge can only create pairs whose count is
    // bounded by the merged pair's count, and leaves other pairs untouched
    // or reduced — so the chosen weights never increase round-over-round
    val rows = TextOps.bpeTrain(spark, sf).collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (1 to TextOps.BpeTrainRounds))
    val weights = rows.map(_.getLong(2))
    assert(weights.zip(weights.tail).forall { case (a, b) => a >= b },
      s"weights increased: ${weights.mkString(",")}")
    assert(rows.map(_.getString(1)).distinct.length == rows.length,
      "same pair merged twice")
  }

  test("bpeTrain's first merge is q101's top pair") {
    val firstMerge = TextOps.bpeTrain(spark, sf).collect()
      .minBy(_.getInt(0)).getString(1).replace("+", "")
    val topPair = TextOps.bpePairs(spark, sf).collect().head.getString(0)
    assert(firstMerge == topPair,
      s"round-1 merge '$firstMerge' != q101 top pair '$topPair'")
  }

  test("bpeTrain: merges never cross symbol boundaries (counterexample corpus)") {
    import spark.implicits._
    // ab×40, bc×25, zabc×10: round 1 merges (a,b) w=50; round 2 (b,c) w=25.
    // After round 2, 'zabc' is [z, ab, c] — a naive single-separator merge
    // encoding false-matches (b,c) INSIDE the boundary between symbols
    // 'ab' and 'c' and reports round 3 = z+abc; correct BPE reports
    // (ab,c) w=10 (tie with (z,ab) broken by pair ASC).
    val vocab = Seq(("ab", 40L), ("bc", 25L), ("zabc", 10L)).toDF("w", "freq")
    val merges = graft.ops.TextOps.bpeTrainVocab(spark, vocab).collect()
      .sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(merges.toSeq == Seq((1, "a+b", 50L), (2, "b+c", 25L), (3, "ab+c", 10L)),
      s"got ${merges.mkString(", ")}")
  }

  test("bpeTrain: consecutive pair occurrences all merge in one round") {
    import spark.implicits._
    // 'abab' must become [ab, ab] after merging (a,b) — the wrapped
    // delimiters keep adjacent occurrences disjoint for literal replace
    val vocab = Seq(("abab", 10L)).toDF("w", "freq")
    val merges = graft.ops.TextOps.bpeTrainVocab(spark, vocab).collect()
      .sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(merges.head == ((1, "a+b", 20L)), s"got ${merges.head}")
    // round 2: the only remaining pair is (ab, ab)
    assert(merges(1) == ((2, "ab+ab", 10L)), s"got ${merges(1)}")
  }

  test("perplexity: finite, positive NLL; single-bigram docs score exactly") {
    val rows = TextOps.perplexity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nll = r.getDouble(2)
      assert(!nll.isNaN && !nll.isInfinite && nll >= 0.0,
        s"doc ${r.getLong(0)}: bad NLL $nll")
    }
  }

  test("bpeEncode matches a reference leftmost-nonoverlapping merge simulation") {
    // leftmost non-overlapping single pass — exactly what the delimited
    // string replace does (a just-merged symbol cannot re-match in-pass)
    def applyMerge(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    def encode(w: String): Int =
      TextOps.BpeApplyMerges.foldLeft(w.map(_.toString).toList) {
        case (s, (a, b)) => applyMerge(s, a, b)
      }.length

    val got = TextOps.bpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
    assert(docs.length == got.size)
    docs.foreach { r =>
      val ws = r.getString(1).trim.split("\\s+").filter(w =>
        w.nonEmpty && !w.contains('\u0001'))
      val (nTok, nChars, nSym) = got(r.getLong(0))
      assert(nTok == ws.length, s"doc ${r.getLong(0)}: token count")
      assert(nChars == ws.map(_.length.toLong).sum, s"doc ${r.getLong(0)}: chars")
      assert(nSym == ws.map(encode(_).toLong).sum,
        s"doc ${r.getLong(0)}: symbol count diverged from reference BPE")
    }
  }

  // ------------------------------------------------------------------ q141

  test("bm25: scores match a reference implementation over the corpus") {
    val docs = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map { r =>
        val toks = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        (r.getLong(0), toks.length.toLong,
          TextOps.Bm25Terms.map(t => toks.count(_ == t).toLong))
      }
    val n = docs.length.toDouble
    val sumDl = docs.map(_._2).sum.toDouble
    val dfs = TextOps.Bm25Terms.indices.map(i => docs.count(_._3(i) > 0).toDouble)
    val k1 = TextOps.Bm25K1; val b = TextOps.Bm25B
    val expect = docs.filter(_._3.sum > 0).map { case (id, dl, tfs) =>
      val score = TextOps.Bm25Terms.indices.map { i =>
        val tf = tfs(i).toDouble
        val idf = math.log(1.0 + (n - dfs(i) + 0.5) / (dfs(i) + 0.5))
        idf * (tf * (k1 + 1.0)) /
          (tf + k1 * ((1.0 - b) + b * dl.toDouble * n / sumDl))
      }.reduce(_ + _)
      id -> (tfs.sum, math.floor(score * 10000.0 + 0.5) / 10000.0)
    }.toMap
    val rows = TextOps.bm25(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == expect.keySet,
      "bm25 must score exactly the docs containing at least one query term")
    rows.foreach { r =>
      val (tfTotal, score) = expect(r.getLong(0))
      assert(r.getLong(1) == tfTotal, s"doc ${r.getLong(0)}: tf_total")
      assert(r.getDouble(2) == score, s"doc ${r.getLong(0)}: score")
    }
    // relevance sanity: at equal length, more term mass can't score lower
    assert(rows.forall(_.getDouble(2) > 0.0))
  }

  // ------------------------------------------------------------------ q152

  test("vocabCoverage: per-lang OOV matches a reference top-K vocabulary") {
    val tok = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(r => r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        .map(w => (r.getString(0), w)))
    val vocab = tok.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (w, c) => (-c, w) }
      .take(TextOps.CoverageVocabK).map(_._1).toSet
    val expect = tok.groupBy(_._1).map { case (lang, xs) =>
      lang -> ((xs.length.toLong, xs.count(x => vocab(x._2)).toLong))
    }
    val rows = TextOps.vocabCoverage(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == expect.keySet)
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    rows.foreach { r =>
      val (n, iv) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == iv,
        s"${r.getString(0)}: token counts diverge")
      assert(r.getDouble(3) == r4(iv.toDouble / n))
      assert(r.getDouble(4) == r4((n - iv).toDouble / n))
      // coverage + oov partition the stream
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  // ------------------------------------------------------------------ q155

  test("featureHash: signed bucket weights match a reference hasher") {
    import org.apache.spark.sql.functions.col
    // reference h32: first 8 md5 hex digits as int64 (the Portable contract)
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      text.trim.split("\\s+").filter(_.nonEmpty).map { w =>
        val h = h32(w)
        ((id, (h % TextOps.HashDim).toInt),
          if (((h >> 4) % 2) == 0) 1L else -1L)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = TextOps.featureHash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expect, "hashed feature weights diverge from reference")
    // weights are bounded by token counts; buckets land inside [0, D)
    got.keys.foreach { case (_, b) =>
      assert(b >= 0 && b < TextOps.HashDim)
    }
  }

  // ------------------------------------------------------------------ q160

  test("langConfusion: cells recompute from q18 predictions x labels") {
    import org.apache.spark.sql.functions.col
    val pred = TextOps.langId(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getString(1), pred(r.getLong(0))))
    val cells = truth.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = truth.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val rows = TextOps.langConfusion(spark, sf).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == cells.keySet)
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == cells(key), s"$key: count")
      assert(r.getDouble(3) == r4(cells(key).toDouble / totals(key._1)), s"$key: recall")
    }
    // per-truth recall partitions to 1.0
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(_.getLong(2)).sum == totals(t), s"$t: recall cells must partition")
    }
  }

  test("fertility: per-lang sums match the q122 encode, fertility >= 1 where words exist") {
    import graft.ops.TextOps
    val sf = "/root/testdata/sf0.001"
    val rows = TextOps.fertility(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // language rows partition the corpus
    assert(rows.values.map(_._1).sum ==
      graft.Tables.documents(spark, sf).count())
    // independent recompute from the per-doc encode
    val enc = TextOps.bpeEncode(spark, sf)
      .join(graft.Tables.documents(spark, sf).select("doc_id", "lang"),
        "doc_id")
      .collect().map(r => (r.getString(5), r.getInt(1).toLong, r.getLong(3)))
    enc.groupBy(_._1).foreach { case (lang, rs) =>
      val (w, s) = (rs.map(_._2).sum, rs.map(_._3).sum)
      val got = rows(lang)
      assert(got._2 == w && got._3 == s, s"$lang sums drift")
      if (w > 0) {
        // every whitespace word encodes to at least one symbol
        assert(s >= w && got._4 >= 1.0, s"$lang fertility ${got._4} < 1")
        assert(got._4 == math.floor(s.toDouble / w.toDouble * 1e4 + 0.5) / 1e4)
      }
    }
  }
  // ---------------------------------------------------------------- q234

  test("vocabPrune: coverage/fertility algebra holds and matches brute force") {
    val rows = graft.ops.TextOps.vocabPrune(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    // brute force on the collected corpus
    import org.apache.spark.sql.functions.col
    val toks = graft.Tables.documents(spark, sf)
      .select(col("lang"), graft.ops.Portable.toks(col("text")).as("ts"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val freq = toks.flatMap(_._2).groupBy(identity).map { case (w, xs) => w -> xs.length }
    val keep = freq.filter(_._2 >= graft.ops.TextOps.VocabPruneMinFreq).keySet
    rows.foreach { case (lang, n, k, cov, fert) =>
      val ws = toks.filter(_._1 == lang).flatMap(_._2)
      assert(n == ws.length.toLong, s"$lang n_words")
      assert(k == ws.count(keep.contains).toLong, s"$lang n_kept")
      val out = ws.map(w => if (keep.contains(w)) 1L else w.length.toLong).sum
      assert(cov == r4(k.toDouble / n), s"$lang coverage")
      assert(fert == r4(out.toDouble / n), s"$lang fertility")
      assert(fert >= 1.0 - 1e-9 || ws.forall(_.length == 1),
        s"$lang fertility below 1 without single-char pruned words")
    }
  }

  // ---------------------------------------------------------------- q237

  test("heapsLaw: cumulative points are monotone, totals exact, beta sane") {
    import org.apache.spark.sql.functions.col
    val rows = graft.ops.TextOps.heapsLaw(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq ==
      (1L to graft.ops.TextOps.HeapsPoints.toLong))
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4,
        s"point ${b._1} not monotone")
    }
    // the last point is the whole corpus: exact doc/token/vocab totals
    val docs = graft.Tables.documents(spark, sf)
      .select(graft.ops.Portable.toks(col("text")).as("ts"))
      .collect().map(_.getSeq[String](0))
    assert(rows.last._2 == docs.length.toLong)
    assert(rows.last._3 == docs.map(_.length.toLong).sum)
    val types = docs.flatMap(_.sliding(graft.ops.TextOps.HeapsGramW)
      .filter(_.length == graft.ops.TextOps.HeapsGramW).map(_.mkString(" ")))
      .distinct.length.toLong
    assert(rows.last._4 == types, s"vocab ${rows.last._4} != $types")
    // one beta on every row; sublinear growth (beta < 1) on any corpus
    // where vocabulary saturates, which token replication guarantees here
    assert(rows.map(_._5).distinct.length == 1)
    // saturating synthetic vocab can flatten V entirely (beta -> 0)
    assert(rows.head._5 >= 0.0 && rows.head._5 < 1.0,
      s"beta ${rows.head._5} outside [0,1)")
  }

  test("langPurity: driver-side replay of the half-document langid matrix") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.TextOps.langPurity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("text").collect().map(_.getString(0))
    val profiles = graft.functions.PortableHash.LangProfiles
    def lid(t: String): String = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      val scores = profiles.map { case (l, ws) =>
        (l, toks.count(ws.toSet)) }.filter(_._2 > 0)
      if (scores.isEmpty) "und"
      else scores.minBy { case (l, s) => (-s, l) }._1
    }
    val expect = docs.map { t =>
      val h = t.length / 2
      (lid(t.substring(0, h)), lid(t.substring(h)))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.length == expect.size, "one row per realized lang pair")
    assert(rows.map(_._3).sum == docs.length.toLong, "matrix partitions corpus")
    rows.foreach { case (l, r, n, c) =>
      assert(expect((l, r)) == n, s"cell ($l,$r)")
      assert(c == (if (l == r) 1 else 0))
    }
  }

  test("canonStability: flip/delta replay off the two kernel evaluations") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.TextOps.canonStability(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val tau = math.floor(
      graft.ops.CurationPipeline.QualityMin * 10000.0 + 0.5).toLong
    // pure-Scala replica of the q17 kernel (same op order as qualityCol)
    val stop = graft.ops.TextOps.Stopwords.toSet
    def quality(t: String): Long = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      val nTok = math.max(toks.length, 1).toDouble
      val nStop = toks.count(stop).toDouble
      val nPunct = t.count(".,;:!?".contains(_)).toDouble
      val nChars = math.max(t.length, 1).toDouble
      val lenScore = math.min(t.length.toDouble / 500.0, 1.0)
      val q = 0.5 * lenScore + 0.3 * (1.0 - math.abs(nStop / nTok - 0.1)) +
        0.2 * (1.0 - nPunct / nChars)
      math.floor((math.floor(q * 10000.0 + 0.5) / 10000.0) * 10000.0 + 0.5).toLong
    }
    val scored = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map { r =>
        val t = r.getString(1)
        val canon = t.trim.replaceAll("\\s+", " ").toLowerCase
        (r.getString(0), quality(t), quality(canon))
      }
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val bySrc = scored.groupBy(_._1)
    assert(rows.map(_._2).sum == scored.length.toLong)
    rows.foreach { case (s, n, flips, rate, delta) =>
      val g = bySrc(s)
      assert(n == g.length, s"$s n")
      val ef = g.count(t => (t._2 >= tau) != (t._3 >= tau)).toLong
      assert(flips == ef, s"$s flips")
      assert(rate == o4(ef.toDouble / n), s"$s rate")
      assert(delta == o4(g.map(t => t._3 - t._2).sum.toDouble / (n * 1e4)),
        s"$s delta")
    }
  }
}
