package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{PackingOps, Portable}

class PackingOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("packChunks: token conservation, dense chunk ids, fill semantics") {
    val chunks = PackingOps.packChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .sortBy(_._1)
    val totalTokens = Tables.documents(spark, sf)
      .select(size(Portable.toks(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    // chunk ids are dense 0..n-1 (the concatenation has no holes)
    assert(chunks.head._1 == 0L)
    chunks.map(_._1).zip(chunks.map(_._1).tail).foreach { case (a, b) =>
      assert(b == a + 1, s"chunk ids not dense at $a -> $b")
    }
    // token conservation: chunk token counts sum to the corpus total
    assert(chunks.map(_._5).sum == totalTokens)
    // every chunk except the last is exactly full (fill = 1.0)
    chunks.init.foreach { c =>
      assert(c._5 == PackingOps.PackLen && c._6 == 1.0,
        s"non-final chunk ${c._1} not full: $c")
    }
    assert(chunks.last._5 <= PackingOps.PackLen)
    // doc ranges are sane and monotone: a chunk's first contributor is the
    // previous chunk's last contributor (straddler) or the NEXT surviving
    // doc in id order — compare positions in the surviving-doc order, not
    // raw id arithmetic, so id gaps / empty docs in a fixture can't fail
    // a correct packing
    val survivors = Tables.documents(spark, sf)
      .select(col("doc_id"), size(Portable.toks(col("text"))).cast("long").as("nt"))
      .filter(col("nt") > 0).collect().map(_.getLong(0)).sorted
    val pos = survivors.zipWithIndex.toMap
    chunks.foreach { c => assert(c._3 <= c._4, s"first>last in $c") }
    chunks.zip(chunks.tail).foreach { case (a, b) =>
      assert(pos(b._3) == pos(a._4) || pos(b._3) == pos(a._4) + 1,
        s"chunk handoff broken: $a -> $b")
    }
  }

  test("docFragmentation agrees with packChunks: straddlers and touch counts") {
    val frag = PackingOps.docFragmentation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))
    val chunks = PackingOps.packChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // total (doc, chunk) incidences match: sum of per-doc n_chunks equals
    // sum of per-chunk n_docs
    assert(frag.map(_._4).sum == chunks.map(_._2).sum)
    frag.foreach { case (id, nt, c0, nc, intact, off) =>
      assert(nt > 0, s"doc $id: empty doc must not appear")
      assert(off >= 0 && off < PackingOps.PackLen, s"doc $id: bad offset $off")
      assert((intact == 1) == (nc == 1), s"doc $id: intact/n_chunks disagree")
      // nc is exactly the arithmetic span of the doc's offsets
      assert(nc == (off + nt - 1) / PackingOps.PackLen + 1,
        s"doc $id: span arithmetic mismatch ($off + $nt vs $nc chunks)")
      assert(c0 >= 0)
    }
    // intact docs are exactly those fitting inside one chunk from their
    // offset
    frag.foreach { case (id, nt, _, _, intact, off) =>
      val fits = off + nt <= PackingOps.PackLen
      assert((intact == 1) == fits, s"doc $id: intact=$intact but fits=$fits")
    }
  }

  test("packContamination: pair identities hold, totals recompute from chunks") {
    val rows = PackingOps.packContamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val chunks = PackingOps.packChunks(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    rows.foreach { case (id, nd, t, cross, within, share) =>
      val (cd, ct) = chunks(id)
      assert(nd == cd && t == ct, s"chunk $id disagrees with q210")
      // cross + within + (ordered within-doc adjacent pairs...) — the
      // exact identity: all unordered pairs = t(t-1)/2 = cross + within
      assert(cross + within == t * (t - 1) / 2, s"chunk $id: pair identity")
      assert(cross >= 0 && within >= 0)
      // single-doc chunks have zero cross pairs; multi-doc chunks > 0
      assert((nd == 1) == (cross == 0), s"chunk $id: cross/n_docs")
      if (t > 1) {
        val expect = math.floor(cross.toDouble * 2 /
          (t.toDouble * (t - 1)) * 1e4 + 0.5) / 1e4
        assert(share == expect, s"chunk $id: share $share != $expect")
      } else assert(share == 0.0)
    }
  }

  test("paddingAudit: strategies recompute from raw lengths and rank as theory says") {
    val nts = Tables.documents(spark, sf)
      .select(size(Portable.toks(col("text"))).cast("long").as("nt"))
      .collect().map(_.getLong(0)).filter(_ > 0)
    val rows = PackingOps.paddingAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val t = nts.sum
    def pow2(n: Long) = (0 to 62).map(1L << _).find(_ >= n).get
    assert(rows("concat")._2 ==
      (t + PackingOps.PackLen - 1) / PackingOps.PackLen * PackingOps.PackLen)
    assert(rows("pow2_buckets")._2 == nts.map(pow2).sum)
    assert(rows("pad_to_max")._2 == nts.max * nts.length)
    rows.values.foreach { case (real, padded, share) =>
      assert(real == t && padded >= real)
      val expect = math.floor((padded - real).toDouble / padded * 1e4 + 0.5) / 1e4
      assert(share == expect)
    }
    // the ranking the audit exists to show: concat wastes least
    assert(rows("concat")._3 <= rows("pow2_buckets")._3 &&
      rows("pow2_buckets")._3 <= rows("pad_to_max")._3)
  }

  test("rangedSourceQuota is row-identical to the window form under heavy ties") {
    val s = spark
    import s.implicits._
    // 3 sources; src_t is ALL ties (same quality) — the degenerate cell
    val rows =
      (0L until 40L).map(i => (i, "src_a", 0.1 + (i % 7) * 0.1)) ++
      (100L until 160L).map(i => (i, "src_t", 0.5)) ++
      (200L until 205L).map(i => (i, "src_s", 0.9 - i.toDouble / 1000))
    val scored = rows.toDF("doc_id", "source", "quality")
    val a = PackingOps.sourceQuotaDf(scored).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val b = PackingOps.rangedSourceQuotaDf(scored).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(a == b, s"window vs ranged mismatch: ${(a diff b).take(5)} / ${(b diff a).take(5)}")
    // quota respected; under-quota source kept whole
    val bySrc = a.groupBy(_._2)
    assert(bySrc("src_a").size == PackingOps.QuotaK)
    assert(bySrc("src_t").size == PackingOps.QuotaK)
    assert(bySrc("src_s").size == 5)
    // tie cell ranks by doc_id: src_t keeps the K smallest ids
    assert(bySrc("src_t").map(_._1).toSeq.sorted ==
      (100L until (100L + PackingOps.QuotaK)).toSeq)
  }

  test("heapSourceQuota is row-identical to the window form (strategy triangle)") {
    val a = PackingOps.sourceQuota(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val c = PackingOps.heapSourceQuota(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(a == c,
      s"heap vs window mismatch: ${(a diff c).take(5)} / ${(c diff a).take(5)}")
  }

  test("packDelta: delta docs continue the base stream exactly") {
    val docs = Tables.documents(spark, sf)
    val isDelta = (id: Long) => id % PackingOps.PackDeltaModulus == 0
    // driver-side replay: base total, then delta spans in doc_id order
    val nts = docs.select(col("doc_id"),
        size(Portable.toks(col("text"))).cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0).sortBy(_._1)
    val baseTotal = nts.filterNot(d => isDelta(d._1)).map(_._2).sum
    var off = baseTotal
    val expect = nts.filter(d => isDelta(d._1)).map { case (id, nt) =>
      val start = off; off += nt
      val c0 = start / PackingOps.PackLen
      val c1 = (start + nt - 1) / PackingOps.PackLen
      (id, nt, c0, c1 - c0 + 1, start % PackingOps.PackLen,
        if (c0 == baseTotal / PackingOps.PackLen &&
          baseTotal % PackingOps.PackLen != 0) 1 else 0)
    }.toSet
    val got = PackingOps.packDelta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSet
    assert(got == expect,
      s"delta layout mismatch: ${(got diff expect).take(3)} vs ${(expect diff got).take(3)}")
    // the very first delta doc starts exactly where the base ended
    val first = got.minBy(_._1)
    assert(first._5 == baseTotal % PackingOps.PackLen,
      "first delta doc must start at the base's end offset")
  }

  test("sourceQuota on testdata: per-source cap and rank contiguity") {
    val kept = PackingOps.sourceQuota(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    kept.groupBy(_._2).foreach { case (src, ks) =>
      assert(ks.size <= PackingOps.QuotaK, s"$src over quota")
      assert(ks.map(_._4).toSeq.sorted == (1 to ks.size).toSeq,
        s"$src: ranks not contiguous")
      // ranks follow quality desc (ties by doc_id asc)
      val ordered = ks.toSeq.sortBy(_._4)
      ordered.zip(ordered.tail).foreach { case (x, y) =>
        assert(x._3 > y._3 || (x._3 == y._3 && x._1 < y._1),
          s"$src: rank order violates (quality desc, doc_id)")
      }
    }
  }
  // ---------------------------------------------------------------- q227

  test("shardShuffle: shards partition the corpus and the audit is coherent") {
    val rows = PackingOps.shardShuffle(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (sh, n, tok, chi2, ratio) =>
      assert(sh >= 0 && sh < PackingOps.ShuffleShards, s"shard $sh")
      assert(n > 0 && tok >= 0, s"shard $sh mass")
      assert(chi2 >= -1e-4, s"shard $sh chi2 $chi2 negative")
      assert(ratio >= 0.0, s"shard $sh tok_ratio $ratio")
    }
    val docs = graft.Tables.documents(spark, sf)
    assert(rows.map(_._2).sum == docs.count(), "shards do not partition docs")
    val totTok = docs.select(
      org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.size(
        graft.ops.Portable.toks(col("text"))).cast("long"))).head().getLong(0)
    assert(rows.map(_._3).sum == totTok, "shards do not partition tokens")
    // tok_ratio is exactly n_tokens * S / total (r4'd)
    rows.foreach { case (sh, _, tok, _, ratio) =>
      val expect = math.floor(tok.toDouble * PackingOps.ShuffleShards /
        totTok * 10000.0 + 0.5) / 10000.0
      assert(ratio == expect, s"shard $sh ratio $ratio != $expect")
    }
  }

  test("shardShuffle: hash sharding mixes sources far better than a source-keyed shard") {
    // adversarial control: sharding BY SOURCE concentrates each shard on
    // one source; its chi2 must dwarf the hash shuffle's on the same data
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val total = docs.length.toDouble
    val srcN = docs.groupBy(_._2).map { case (s, xs) => s -> xs.length }
    def chi2Of(assign: ((Long, String)) => Int): Double = {
      val byShard = docs.groupBy(assign)
      byShard.values.map { xs =>
        val nd = xs.length.toDouble
        val cells = xs.groupBy(_._2)
        cells.map { case (s, c) =>
          val e = nd * srcN(s) / total
          (c.length - e) * (c.length - e) / e
        }.sum + srcN.filterNot(k => cells.contains(k._1))
          .map { case (_, n) => nd * n / total }.sum
      }.max
    }
    val badMax = chi2Of { case (_, s) =>
      math.abs(s.hashCode) % PackingOps.ShuffleShards }
    val hashMax = PackingOps.shardShuffle(spark, sf).collect()
      .map(_.getDouble(3)).max
    assert(hashMax < badMax,
      s"hash shuffle chi2 $hashMax not better than source-keyed $badMax")
  }
  // ---------------------------------------------------------------- q236

  test("spanCorruption: realized rate near target, merged spans >= drawn mean floor") {
    val rows = PackingOps.spanCorruption(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val (toks, masked) = (rows.map(_._3).sum, rows.map(_._4).sum)
    rows.foreach { case (lang, nd, nt, nm, ns, rate, mspan) =>
      assert(nm <= nt, s"$lang masks more than its tokens")
      assert(rate >= 0.0 && rate <= 1.0)
      if (ns > 0) assert(mspan >= 1.0, s"$lang merged span < 1")
      assert(nd > 0 && nt > 0)
    }
    // corpus-level realized rate concentrates near the 15% target
    val realized = masked.toDouble / toks
    assert(realized > PackingOps.CorruptRate * 0.5 &&
      realized < PackingOps.CorruptRate * 2.0,
      s"realized corruption $realized far from ${PackingOps.CorruptRate}")
  }

  test("spanCorruption: per-doc masks match a brute-force replay") {
    // replay the hash-coin mask on the collected corpus for a sample
    import org.apache.spark.sql.functions.{col, size => fsize}
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), fsize(graft.ops.Portable.toks(col("text")))
        .cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    var totMasked = 0L
    docs.foreach { case (id, nt) =>
      val mask = new Array[Boolean](nt.toInt + 1)
      (1L to nt).foreach { i =>
        if (h32(s"corrupt_$id:$i") % 1000000L < PackingOps.CorruptStartPpm) {
          val e = math.min(nt, i + h32(s"span_$id:$i") % PackingOps.CorruptSpanMod)
          (i to e).foreach(j => mask(j.toInt) = true)
        }
      }
      totMasked += mask.count(identity)
    }
    val got = PackingOps.spanCorruption(spark, sf).collect().map(_.getLong(3)).sum
    assert(got == totMasked, s"operator masked $got != replay $totMasked")
  }

  // ---------------------------------------------------------------- q242

  test("chunkDedupSurvival: doc dups exist, chunk dups (near) vanish, counts replay") {
    val r = PackingOps.chunkDedupSurvival(spark, sf).collect().head
    val (ncf, ndc, ndup, cRate, nd, ndd, dRate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))
    assert(ndup == ncf - ndc && ndup >= 0)
    assert(nd >= ndd && nd > 0)
    // brute-force replay of the chunk fingerprint space
    import org.apache.spark.sql.functions.col
    val texts = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r2 => (r2.getLong(0), r2.getString(1))).sortBy(_._1)
    val stream = texts.flatMap { case (_, t) =>
      t.trim.split("\\s+").filter(_.nonEmpty) }
    val full = stream.grouped(PackingOps.PackLen.toInt)
      .filter(_.length == PackingOps.PackLen.toInt)
      .map(_.mkString(" ")).toSeq
    assert(ncf == full.length.toLong, s"full chunks $ncf != ${full.length}")
    assert(ndc == full.distinct.length.toLong, "distinct chunks")
    val docDups = texts.length - texts.map(_._2).distinct.length
    assert(nd - ndd == docDups.toLong, "doc dup count")
    // the ordering lesson: packing destroys (almost all) dedup alignment
    if (dRate > 0.0) assert(cRate <= dRate + 1e-9,
      s"chunk dup rate $cRate exceeds doc dup rate $dRate")
  }

}
