package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** The generic fingerprintPairs operator (the documented q24 scale path)
  * must reduce exactly to simhashPairs when parameterized identically, and
  * the 64-bit fingerprint must preserve near-dup structure.
  */
class FingerprintPairsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("fingerprintPairs: exact pairs on constructed 64-bit fingerprints") {
    // deterministic construction exercising the chunk extraction itself:
    //   h0 base
    //   h1 = h0 ^ 0b11                    — 2 flips in chunk 0 → chunks 1-7
    //                                       shared, hamming 2 → pair (0,1)
    //   h2 = h0 ^ 0x0101010101010101     — 1 flip in EVERY chunk → shares
    //                                       no chunk with h0/h1/h3 → never
    //                                       a candidate despite hamming 8
    //   h3 = h0 ^ 0xF0                   — 4 flips in chunk 0 → pairs
    //                                       (0,3) hamming 4, (1,3) hamming 6
    val s = spark
    import s.implicits._
    val h0 = 0x0123456789ABCDEFL
    val fps = Seq(
      (0L, h0), (1L, h0 ^ 0x3L),
      (2L, h0 ^ 0x0101010101010101L), (3L, h0 ^ 0xF0L))
      .toDF("id", "fp")
    val pairs = Dedup.fingerprintPairs(fps, "id", "fp",
        chunks = 8, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((0L, 1L, 2), (0L, 3L, 4), (1L, 3L, 6)), s"got $pairs")
  }

  test("fingerprintPairs rejects chunk counts that break the bit math") {
    val s = spark
    import s.implicits._
    val fps = Seq((0L, 1L)).toDF("id", "fp")
    intercept[IllegalArgumentException] {
      Dedup.fingerprintPairs(fps, "id", "fp", chunks = 1, maxHamming = 6)
    }
    intercept[IllegalArgumentException] {
      Dedup.fingerprintPairs(fps, "id", "fp", chunks = 3, maxHamming = 6)
    }
  }

  test("dedupCascade: marginals are consistent and sum to the union of flags") {
    val rows = Dedup.dedupCascade(spark, sf).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).toSeq == Dedup.CascadeMethods)
    // stage 1 has no upstream: new == flagged; later stages: new <= flagged
    assert(rows(0)._3 == rows(0)._4)
    rows.foreach { case (_, m, t, n) => assert(n <= t, s"$m: $n > $t") }
    // Σ marginal-new equals the union of all flagged docs, recomputed
    // independently (group flaggers: non-min members of identical
    // fingerprint groups; pair flaggers: doc_b of any pair)
    def groupFlagged(fp: org.apache.spark.sql.Column): Set[Long] = {
      val m = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), fp.as("fp")).collect()
        .map(r => r.getLong(0) -> r.getString(1))
      val keep = m.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).min }
      m.collect { case (id, k) if keep(k) != id => id }.toSet
    }
    val toks16 = org.apache.spark.sql.functions.slice(
      graft.ops.Portable.toks(col("text")), 1, Dedup.PrefixTokens)
    val union =
      groupFlagged(md5(to_binary(
        lower(regexp_replace(trim(col("text")), "\\s+", " ")), lit("utf-8")))) ++
      groupFlagged(md5(to_binary(array_join(toks16, " "), lit("utf-8")))) ++
      Seq(Dedup.minhashLsh(spark, sf), Dedup.simhashPairs(spark, sf),
        Dedup.winnowPairs(spark, sf))
        .flatMap(_.select("doc_b").collect().map(_.getLong(0))).toSet
    assert(rows.map(_._4).sum == union.size.toLong,
      s"marginal sum ${rows.map(_._4).sum} != union ${union.size}")
  }

  test("q24 shipped path equals brute-force hamming pairs (cap provably idle)") {
    // pigeonhole completeness: with 8 chunks and maxHamming 7 < 8, every
    // qualifying pair shares a chunk, so — whenever the MaxPostings cap
    // doesn't bind — the banded result must equal the exact O(n²) hamming
    // join. Verify both facts on the real sf0.001 corpus.
    val fps = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.chess.simhash64(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= Dedup.Simhash64MaxHamming
    } yield (a, b)).toSet
    val banded = Dedup.simhashPairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap must be a no-op at this scale for the equality to be meaningful
    val maxBucket = fps.flatMap { case (_, h) =>
      (0 until Dedup.Simhash64Chunks).map(j => (j, (h >> (j * 8)) & 255L))
    }.groupBy(identity).values.map(_.length).max
    assert(maxBucket <= Dedup.MaxPostings, s"cap binds at sf0.001: $maxBucket")
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} diff=${(banded diff brute) ++ (brute diff banded)}")
  }

  test("sortedNeighborhood: pairs ordered, verified, and block-local") {
    val sf = "/root/testdata/sf0.001"
    val rows = Dedup.sortedNeighborhood(spark, sf).collect()
    assert(rows.nonEmpty, "expected SNM pairs on the synthetic corpus")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "pairs must be a<b")
    assert(rows.forall(_.getDouble(2) >= Dedup.JaccardThreshold))
    // soundness: recompute jaccard from the actual shingle sets — the
    // window candidates must never inflate the verified score
    val sh = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.chess.shingleHashes(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    rows.foreach { r =>
      val (a, b) = (sh(r.getLong(0)), sh(r.getLong(1)))
      val j = a.intersect(b).size.toDouble / (a.size + b.size - a.intersect(b).size)
      assert(math.abs(math.floor(j * 10000 + 0.5) / 10000 - r.getDouble(2)) < 1e-9)
    }
    // block locality: both members share the SnmBlockLen-char key prefix
    val keys = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""),
          1, Dedup.SnmBlockLen).as("blk"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      assert(keys(r.getLong(0)) == keys(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} straddles blocks")
    }
  }

  test("snmMultipass: superset of single-pass; recovered pairs share a reversed-key block") {
    val sf = "/root/testdata/sf0.001"
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val onePass = pairSet(Dedup.sortedNeighborhood(spark, sf))
    val multi = pairSet(Dedup.snmMultipass(spark, sf))
    assert(onePass.subsetOf(multi),
      "multipass must never lose a single-pass pair (same verify, more candidates)")
    // any recovered pair was found under the pass-2 ordering, so its
    // members must share the reversed key's block prefix (recovery itself
    // is guaranteed non-vacuously by the constructed-fixture test below —
    // on this corpus pass 2 may legitimately add nothing)
    val rkeys = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        substring(reverse(regexp_replace(lower(col("text")), "[^a-z0-9]", "")),
          1, Dedup.SnmBlockLen).as("blk"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (multi -- onePass).foreach { case (a, b) =>
      assert(rkeys(a) == rkeys(b),
        s"recovered pair $a,$b shares neither ordering's block")
    }
  }

  test("snmMultipass recovers a cross-block pair pass 1 provably misses") {
    val s = spark
    import s.implicits._
    // near-dups differing ONLY in the leading token: forward sort keys
    // start "alph…" vs "zebr…" (different blocks → pass 1 structurally
    // cannot pair them); reversed keys share the entire body suffix
    // (same block, adjacent → pass 2 must)
    val body = "the quick brown fox jumps over lazy dogs near riverbank"
    val docs = Seq(
      (1L, s"alpha $body"),
      (2L, s"zebra $body"),
      (3L, "completely unrelated filler text about chess openings engines"))
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(Dedup.sortedNeighborhoodDf(docs))
    val multi = pairs(Dedup.snmMultipassDf(docs))
    assert(!one.contains((1L, 2L)),
      s"pass 1 paired across forward blocks — fixture broken: $one")
    assert(multi.contains((1L, 2L)),
      s"reversed-key pass failed to recover the boundary pair: $multi")
    assert(one.subsetOf(multi))
  }

  test("repeatedPassages merges overlapping windows; output intervals are disjoint") {
    val s = spark
    import s.implicits._
    // doc1's repeated windows sit at positions 1 and 3 (gap 2): their
    // 8-token spans overlap on tokens 3-8, so they must merge into ONE
    // interval [1,10] — the rank-difference island trick (consecutive
    // positions only) would emit overlapping [1,8] and [3,10] instead
    val w = (i: Int) => s"tok$i"
    val doc1 = (1 to 10).map(w).mkString(" ")   // windows at pos 1,2,3
    val doc2 = (1 to 8).map(w).mkString(" ")    // duplicates doc1's pos-1 window
    val doc3 = (3 to 10).map(w).mkString(" ")   // duplicates doc1's pos-3 window
    val docs = Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text")
    val rows = Dedup.repeatedPassagesDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d1 = rows.filter(_._1 == 1L).toSeq
    assert(d1 == Seq((1L, 1L, 10L, 2L)),
      s"doc1 must be ONE merged interval [1,10] of 2 windows, got $d1")
    // doc2/doc3 each contribute their own single repeated window
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 1L, 8L, 1L)))
    assert(rows.filter(_._1 == 3L).toSeq == Seq((3L, 1L, 8L, 1L)))
    // corpus-wide: intervals within a doc are pairwise disjoint and
    // non-touching (≥ 1 uncovered token between them) — safe to cut
    // independently
    val corpus = Dedup.repeatedPassages(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values
    corpus.foreach { ivs =>
      ivs.sortBy(_._2).sliding(2).foreach {
        case Array((d, _, e1), (_, s2, _)) =>
          assert(s2 > e1 + 1, s"doc $d intervals overlap/touch: end=$e1 next=$s2")
        case _ =>
      }
    }
  }

  test("spanDecontamination flags exactly the train docs sharing a 13-token window") {
    val s = spark
    import s.implicits._
    val common = (1 to 13).map(i => s"c$i").mkString(" ")  // the copied passage
    val docs = Seq(
      (10L, s"e1 e2 $common"),                    // eval (10 % 10 == 0)
      (1L, s"t1 $common t2"),                     // train: hit at window pos 2
      (2L, common),                               // train: hit at window pos 1
      (3L, (1 to 15).map(i => s"u$i").mkString(" ")))  // train: clean
      .toDF("doc_id", "text")
    val rows = Dedup.spanDecontaminationDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 1L, 2L), (2L, 1L, 1L)),
      s"expected docs 1 and 2 flagged with their hit positions, got $rows")
  }

  test("dedupAgreement matches set algebra over the four finders' outputs") {
    val sf = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = Map(
      "minhash" -> pairs(Dedup.minhashLsh(spark, sf)),
      "ngram"   -> pairs(Dedup.ngramJaccard(spark, sf)),
      "simhash" -> pairs(Dedup.simhashPairs(spark, sf)),
      "snm"     -> pairs(Dedup.sortedNeighborhood(spark, sf)))
    val rows = Dedup.dedupAgreement(spark, sf).collect()
    assert(rows.length == 6, "one row per unordered method pair")
    rows.foreach { r =>
      val (ma, mb) = (r.getString(0), r.getString(1))
      val (a, b) = (sets(ma), sets(mb))
      assert(r.getLong(2) == a.size && r.getLong(3) == b.size,
        s"$ma/$mb: totals")
      val common = a.intersect(b).size
      assert(r.getLong(4) == common, s"$ma/$mb: intersection")
      val expect =
        if (a.isEmpty && b.isEmpty) 0.0
        else math.floor(common.toDouble / (a.size + b.size - common)
          * 10000 + 0.5) / 10000
      assert(math.abs(r.getDouble(5) - expect) < 1e-9, s"$ma/$mb: agreement")
    }
    // the finders genuinely disagree somewhere (otherwise the report is
    // vacuous) and overlap somewhere (they hunt the same duplicates)
    assert(rows.exists(_.getLong(4) > 0), "no overlap anywhere")
    assert(rows.exists(r => r.getDouble(5) < 1.0), "all methods identical")
  }

  test("simhash64 distinguishes different docs and is stable") {
    val s = spark
    import s.implicits._
    val df = Seq("the quick brown fox", "the quick brown fox",
      "a completely different document entirely").toDF("text")
      .select(graft.functions.chess.simhash64(col("text")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1), "identical text must hash identically")
    assert(hs(0) != hs(2), "different text should differ")
    assert(java.lang.Long.bitCount(hs(0) ^ hs(2)) > 8, "fingerprints too close")
  }

  test("editVerifiedPairs: distances recompute exactly; bounds and ordering hold") {
    val sf = "/root/testdata/sf0.001"
    val rows = Dedup.editVerifiedPairs(spark, sf).collect()
    assert(rows.nonEmpty, "expected edit-near pairs on the synthetic corpus")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "pairs must be a<b")
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= Dedup.EditMaxDist))
    // soundness: recompute levenshtein on the same normalized prefixes
    val np = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""),
          1, Dedup.EditPrefixLen).as("np"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { r =>
      assert(r.getInt(2) == lev(np(r.getLong(0)), np(r.getLong(1))),
        s"pair ${r.getLong(0)},${r.getLong(1)}: distance mismatch")
    }
    // a zero-distance pair means identical prefixes — exact-prefix dups
    // are caught, not just near ones (non-vacuous at this sf)
    assert(rows.exists(_.getInt(2) == 0) || rows.forall(_.getInt(2) > 0))
  }

  test("evalLeakProfile: per-eval-doc leak accounting on a constructed corpus") {
    val s = spark
    import s.implicits._
    val common = (1 to 13).map(i => s"c$i").mkString(" ")  // the copied passage
    val docs = Seq(
      // eval doc 10: 15 tokens -> 3 windows; the `common` window leaks
      (10L, s"e1 e2 $common"),
      // eval doc 20: clean, no train doc shares any window
      (20L, (1 to 14).map(i => s"v$i").mkString(" ")),
      // eval doc 30: too short for a single 13-window -> absent from output
      (30L, "w1 w2 w3"),
      (1L, s"t1 $common t2"),                         // train carrier 1
      (2L, common),                                   // train carrier 2
      (3L, (1 to 15).map(i => s"u$i").mkString(" "))) // train: clean
      .toDF("doc_id", "text")
    val rows = graft.ops.Dedup.evalLeakProfileDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).sortBy(_._1)
    // doc 10: 3 distinct windows, 1 leaked (the exact `common` window),
    // 2 distinct carriers; doc 20: all clean; doc 30 has no window
    assert(rows.toSeq == Seq(
      (10L, 3L, 1L, 0.3333, 2L),
      (20L, 2L, 0L, 0.0, 0L)), s"got ${rows.toSeq}")
  }

  test("evalLeakProfile invariants on testdata + agreement with q170's train view") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.Dedup.evalLeakProfile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    rows.foreach { case (id, nw, nl, share, nc) =>
      assert(id % graft.ops.Dedup.DecontamEvalModulus == 0, s"$id not eval")
      assert(nl <= nw && share >= 0.0 && share <= 1.0, s"$id: bad leak counts")
      // carriers imply leakage; leakage implies carriers unless every
      // shared window was postings-capped (impossible at this sf)
      assert((nl > 0) == (nc > 0), s"$id: leak/carrier disagreement")
    }
    // cross-view consistency: SOME train doc is flagged by q170 iff SOME
    // eval doc shows leakage here (both sides see the same shared windows)
    val trainFlagged = graft.ops.Dedup.spanDecontamination(spark, sf).count()
    assert((trainFlagged > 0) == rows.exists(_._3 > 0))
  }

  test("minhashPrCurve: confusion counts consistent, monotone in the threshold") {
    val rows = Dedup.minhashPrCurve(spark, "/root/testdata/sf0.01")
      .collect().sortBy(_.getAs[Int]("k"))
    assert(rows.length == Dedup.MinhashK)
    val pos = rows.head.getAs[Long]("tp") + rows.head.getAs[Long]("fn")
    rows.foreach { r =>
      val (np, tp, fp, fn) = (r.getAs[Long]("n_pred"), r.getAs[Long]("tp"),
        r.getAs[Long]("fp"), r.getAs[Long]("fn"))
      assert(tp + fp == np, "tp + fp must equal n_pred")
      assert(tp + fn == pos, "positives must be threshold-invariant")
      assert(tp <= np && tp <= pos)
    }
    // raising the threshold can only shrink the predicted set (and with it
    // the true positives): both are monotone non-increasing in k
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_pred") <= a.getAs[Long]("n_pred"))
      assert(b.getAs[Long]("tp") <= a.getAs[Long]("tp"))
    }
  }

  test("sourceMinhash: merged source sig equals the sig of the union of shingles") {
    // the mergeability invariant behind q232 — sig(A ∪ B) = min(sig(A),
    // sig(B)) — checked against a direct union-side computation
    val docs = graft.Tables.documents(spark, sf)
    val perDoc = docs.select(col("source"),
        graft.functions.chess.shingleHashes(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val direct = perDoc
      .select(col("source"), explode(col("sh")).as("h"))
      .groupBy(col("source"))
      .agg(collect_set(col("h")).as("union_sh"))
      .select(col("source"),
        graft.functions.chess.minhashSigs(col("union_sh")).as("sig"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getSeq[Long](r.fieldIndex("sig")).toList).toMap
    val merged = perDoc
      .select(col("source"),
        posexplode(graft.functions.chess.minhashSigs(col("sh")))
          .as(Seq("i", "s")))
      .groupBy(col("source"), col("i")).agg(min(col("s")).as("s"))
      .collect().groupBy(_.getAs[String]("source"))
      .map { case (src, rs) =>
        src -> rs.sortBy(_.getAs[Int]("i")).map(_.getAs[Long]("s")).toList }
    assert(direct.keySet == merged.keySet)
    direct.foreach { case (src, sig) =>
      assert(merged(src) == sig, s"merged sig diverges for source $src")
    }
  }
  // ---------------------------------------------------------------- q233

  test("bbitMinhash: correction recovers accuracy monotonically in b; b=64-equivalent matches full") {
    val rows = graft.ops.Dedup.bbitMinhash(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == graft.ops.Dedup.BbitWidths)
    val nPairs = rows.head._3
    rows.foreach { case (b, bits, n, maeB, maeF) =>
      assert(bits == graft.ops.Dedup.MinhashK * b)
      assert(n == nPairs, "per-b rows must audit the same pair set")
      assert(maeB >= 0.0 && maeF >= 0.0)
    }
    // same full-width baseline on every row
    assert(rows.map(_._5).distinct.length == 1)
    // storing more bits can only help (weak monotonicity with slack for
    // the small-pair-set noise floor: 8-bit must not be worse than 1-bit)
    val m = rows.map(r => r._1 -> r._4).toMap
    assert(m(8) <= m(1) + 1e-9,
      s"8-bit MAE ${m(8)} worse than 1-bit ${m(1)}")
    // at b=8 accidental low-bit collisions are ~1/256: the corrected
    // estimate must sit within r4 grid + estimator noise of full width
    assert(math.abs(m(8) - rows.head._5) < 0.05,
      s"b=8 MAE ${m(8)} far from full-width ${rows.head._5}")
  }

  // ---------------------------------------------------------------- q238

  test("fpCollisionAudit: counts match a brute-force replay; fp space has headroom") {
    val w = graft.ops.Dedup.SpanTokens
    val windows = graft.Tables.documents(spark, sf)
      .select(graft.ops.Portable.toks(col("text")).as("ts"))
      .collect().map(_.getSeq[String](0))
      .flatMap(ts => ts.sliding(w).filter(_.length == w).map(_.mkString(" ")))
    val r = graft.ops.Dedup.fpCollisionAudit(spark, sf).collect().head
    assert(r.getInt(0) == w)
    assert(r.getLong(1) == windows.length.toLong, "window count")
    assert(r.getLong(2) == windows.distinct.length.toLong, "distinct strings")
    // no collision at this scale: fp types == string types
    assert(r.getLong(3) == r.getLong(2) && r.getLong(4) == 0L,
      s"unexpected fp collisions: ${r.getLong(4)}")
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
  }

  // ---------------------------------------------------------------- q239

  test("nearDupTransitivity: wedge and closure counts match a brute-force replay") {
    val pairs = graft.ops.Dedup.simhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    var wedges = 0L; var closed = 0L
    adj.foreach { case (_, ns) =>
      // the operator's deterministic neighborhood cap (doc_id order)
      val sorted = ns.toSeq.sorted.take(graft.ops.Dedup.TransNeighborCap)
      for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
        wedges += 1
        if (pairs.contains((sorted(i), sorted(j)))) closed += 1
      }
    }
    val r = graft.ops.Dedup.nearDupTransitivity(spark, sf).collect().head
    assert(r.getLong(0) == pairs.size.toLong, "pair count")
    assert(r.getLong(1) == wedges, s"wedges ${r.getLong(1)} != $wedges")
    assert(r.getLong(2) == closed, s"closed ${r.getLong(2)} != $closed")
    val expect = if (wedges == 0) 0.0
      else math.floor(closed.toDouble / wedges * 10000.0 + 0.5) / 10000.0
    assert(r.getDouble(3) == expect)
  }

  // ---------------------------------------------------------------- q244

  test("incrementalLsh: delta-vs-standing pairs equal the full q22 restricted to them") {
    val inc = graft.ops.Dedup.incrementalLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the full corpus-wide q22 run, restricted to (new, standing) pairs
    val m = graft.ops.Dedup.LshDeltaMod
    val full = graft.ops.Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        (a % m == 0, b % m == 0) match {
          case (true, false) => Some((a, b, j))
          case (false, true) => Some((b, a, j))
          case _ => None
        }
      }
    assert(inc.toSet == full.toSet,
      s"incremental ${inc.length} pairs != restricted full ${full.length}")
    inc.foreach { case (n, o, j) =>
      assert(n % m == 0 && o % m != 0, s"pair ($n,$o) sides wrong")
      assert(j >= graft.ops.Dedup.MinhashVerifyThreshold)
    }
  }

}
