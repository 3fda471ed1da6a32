package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{FunctionOps, SamplingOps}

class SamplingOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("quotaSample: exactly min(quota, group size) rows per language") {
    val sizes = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SamplingOps.quotaSample(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == sizes.keySet)
    kept.foreach { case (lang, n) =>
      assert(n == math.min(SamplingOps.QuotaK.toLong, sizes(lang)),
        s"$lang: kept $n of ${sizes(lang)}")
    }
    // map-side bounded: the plan is aggregation-shaped, not a window sort
    val plan = SamplingOps.quotaSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "quota sampling must not plan a window")
  }

  test("packSequences: packs are contiguous, conserve docs, and respect capacity") {
    import org.apache.spark.sql.functions._
    val packs = SamplingOps.packSequences(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables.documents(spark, sf)
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxDocTok = docs
      .select(size(graft.ops.Portable.toks(col("text"))).cast("long").as("n"))
      .agg(max(col("n"))).head().getLong(0)
    packs.groupBy(_._1).foreach { case (source, ps) =>
      val ids = ps.map(_._2).sorted
      assert(ids.head == 0 && ids.zip(ids.tail).forall { case (a, b) => b == a + 1 },
        s"$source: pack ids not contiguous: ${ids.take(10).mkString(",")}")
      assert(ps.map(_._3).sum == perSource(source),
        s"$source: packing lost/duplicated documents")
      // a pack holds the docs whose START offset falls inside it, so its
      // token total is < PackLen + the last doc's own length
      ps.foreach { case (_, id, _, tok) =>
        assert(tok < SamplingOps.PackLen + maxDocTok,
          s"$source pack $id: $tok tokens exceeds capacity bound")
      }
    }
  }

  test("winsorize: mean lands inside the cut interval, clamp rate ≈ 10%") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val counts = orders.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    FunctionOps.winsorize(spark, sf).collect().foreach { r =>
      val (prio, p05, p95) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val wAvg = r.getDouble(3)
      assert(p05 <= wAvg && wAvg <= p95, s"$prio: mean $wAvg outside cuts")
      // ~5% clamp on each tail; allow slack for small groups + ties
      assert(r.getLong(4) <= math.ceil(counts(prio) * 0.15).toLong,
        s"$prio: clamped ${r.getLong(4)} of ${counts(prio)}")
    }
  }

  test("splitBalance: chi-square recomputes from the actual split counts") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = SamplingOps.splitBalance(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getDouble(3))).toMap
    val obs = SamplingOps.trainSplit(spark, sf)
      .join(graft.Tables.documents(spark, sf).select("doc_id", "lang"), "doc_id")
      .groupBy("split", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = obs.keys.map(_._2).toSet.toSeq.sorted
    val n = obs.values.sum.toDouble
    got.foreach { case (split, (nDocs, df, chi2)) =>
      val nSplit = obs.collect { case ((s, _), c) if s == split => c }.sum
      assert(nDocs == nSplit, s"$split: margin")
      assert(df == langs.size - 1, s"$split: df")
      // observed cells only — the operator's (and oracle's) documented
      // convention; an empty (split, lang) cell would omit its exp term
      val expect = obs.collect { case ((s, l), c) if s == split =>
        val nl = obs.collect { case ((_, l2), c2) if l2 == l => c2 }.sum
        val e = nSplit * nl / n
        val t = (c - e) * (c - e) / e
        math.floor(t * SamplingOps.ChiScale + 0.5)
      }.sum / SamplingOps.ChiScale
      assert(math.abs(chi2 - math.floor(expect * 10000 + 0.5) / 10000) < 1e-9,
        s"$split: chi2 $chi2 != $expect")
      assert(chi2 >= 0.0)
    }
  }

  test("mixtureSchedule: budget respected, sqrt weighting flattens rates") {
    val sf = "/root/testdata/sf0.001"
    val rows = SamplingOps.mixtureSchedule(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // floor allocation never exceeds the budget
    assert(rows.map(_._3).sum <= SamplingOps.MixBudgetTokens)
    rows.foreach { case (src, tok, target, epochs, rate) =>
      assert(epochs == (target + tok - 1) / tok, s"$src: epoch math")
      assert(math.abs(rate - math.floor(target.toDouble / tok * 10000 + 0.5)
        / 10000) < 1e-9, s"$src: rate")
    }
    // sub-linear weighting: a strictly larger inventory gets a strictly
    // smaller sampling rate (rate ∝ budget/sqrt(tokens))
    val byTok = rows.sortBy(_._2)
    byTok.sliding(2).foreach {
      case Array(a, b) if a._2 < b._2 =>
        assert(a._5 >= b._5, s"rate must not grow with inventory: $a vs $b")
      case _ =>
    }
  }

  // ------------------------------------------------------------------ q158

  test("splitLeakage: full frame; pair cells recompute from q22 + q39") {
    import org.apache.spark.sql.functions.col
    val split = SamplingOps.trainSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.ops.Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = pairs.map { case (a, b) =>
      val (sa, sb) = (split(a), split(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = SamplingOps.splitLeakage(spark, sf).collect()
    assert(rows.length == 6, "split-pair frame must be complete (6 combos)")
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == expect.getOrElse(key, 0L), s"$key: n_pairs")
      assert(r.getInt(3) == (if (key._1 != key._2) 1 else 0), s"$key: is_leak")
    }
    assert(rows.map(_.getLong(2)).sum == pairs.length.toLong,
      "cells must partition the verified pair set")
  }

  test("bootstrapCi: matches a driver-side deterministic Poisson bootstrap exactly") {
    import org.apache.spark.sql.functions.col
    val row = SamplingOps.bootstrapCi(spark, sf).collect() match {
      case Array(r) => r
      case other => fail(s"expected one row, got ${other.length}")
    }
    val b = SamplingOps.BootReplicates
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    def weight(doc: Long, rep: Int): Long = {
      val u = h32(s"${doc}_b$rep").toDouble / 4294967296.0
      val k = SamplingOps.PoissonCdf.indexWhere(u < _)
      if (k < 0) 5L else k.toLong
    }
    val q4 = graft.ops.TextOps.qualityScore(spark, sf)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 10000.0 + 0.5).toLong)
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val ms = (0 until b).map { rep =>
      val (sw, swq) = q4.foldLeft((0L, 0L)) { case ((a, c), (doc, q)) =>
        val w = weight(doc, rep); (a + w, c + w * q)
      }
      swq.toDouble / sw.toDouble / 10000.0
    }
    val mean = ms.sum / b
    val se = math.sqrt(ms.map(m => (m - mean) * (m - mean)).sum / (b - 1))
    assert(row.getLong(0) == q4.length.toLong && row.getLong(1) == b.toLong)
    assert(row.getDouble(3) == r4(mean), s"boot mean ${row.getDouble(3)} != $mean")
    assert(row.getDouble(4) == r4(se), s"boot se ${row.getDouble(4)} != $se")
    assert(row.getDouble(5) <= row.getDouble(3) && row.getDouble(3) <= row.getDouble(6))
    // the interval is non-degenerate: replicates actually vary
    assert(row.getDouble(4) > 0.0, "zero bootstrap variance is a broken resample")
  }

  test("clusterSplit: whole dup clusters move as one unit — zero graph leakage") {
    import org.apache.spark.sql.functions.col
    val rows = SamplingOps.clusterSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // assignment covers the corpus exactly once
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.size.toLong == nDocs)
    // every edge of the SAME near-dup graph q57 clusters (simhash pairs)
    // has both endpoints in the same split — the q158 off-diagonal is
    // structurally empty for this splitter
    val pairs = graft.ops.Dedup.simhashPairs(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(rows(a)._2 == rows(b)._2, s"pair ($a,$b) straddles splits")
      assert(rows(a)._1 == rows(b)._1, s"pair ($a,$b) has two representatives")
    }
    // representatives are cluster-consistent: split is a function of rep
    rows.values.groupBy(_._1).foreach { case (rep, members) =>
      assert(members.map(_._2).toSet.size == 1, s"rep $rep spans splits")
    }
    // the splitter still produces all three splits on singleton mass
    assert(rows.values.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("dsirWeights: target-likeness separates the target subset, zero-token docs get 0") {
    import graft.ops.{CorpusOps, SamplingOps}
    val w = SamplingOps.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(w.size == nDocs, "one weight row per document")
    val target = CorpusOps.gopherRules(spark, sf)
      .filter(org.apache.spark.sql.functions.col("keep") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(target.nonEmpty && target.size < w.size,
      "corpus must contain both classes for this check")
    // a model fit to the target slice must, on average, rank its own
    // members above the rest (per-token, so length cancels)
    def mean(ids: Iterable[Long]) =
      ids.map(w(_)._3).sum / ids.size.toDouble
    val inT = mean(target)
    val outT = mean(w.keys.filterNot(target))
    assert(inT > outT, s"target mean $inT !> non-target mean $outT")
    // every zero-token doc scores exactly zero
    w.values.filter(_._1 == 0L).foreach { case (_, lw, lpt) =>
      assert(lw == 0.0 && lpt == 0.0)
    }
  }

  test("unimaxBudgetDf: caps bind on the tail, budget conserved, head uniform") {
    import graft.ops.SamplingOps
    val s = spark
    import s.implicits._
    // skewed corpus: two tiny tail languages whose 4-epoch caps are far
    // below the uniform share, two head languages that absorb the slack
    val counts = Seq(("aa", 100L), ("bb", 200L), ("en", 10000L),
      ("zz", 8000L)).toDF("lang", "n")
    val rows = SamplingOps.unimaxBudgetDf(counts).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getInt(5))).toMap
    val budget = (100L + 200 + 10000 + 8000) * SamplingOps.UnimaxBudgetFactor
    // tail languages hit their epoch caps exactly
    assert(rows("aa")._3 == 400.0 && rows("aa")._5 == 1)
    assert(rows("bb")._3 == 800.0 && rows("bb")._5 == 1)
    assert(rows("aa")._4 == SamplingOps.UnimaxEpochCap.toDouble)
    // head languages sit at one common waterline, uncapped
    assert(rows("en")._3 == rows("zz")._3 && rows("en")._5 == 0 &&
      rows("zz")._5 == 0)
    // the budget is fully allocated (within the r4 grid)
    val total = rows.values.map(_._3).sum
    assert(math.abs(total - budget) < 1e-3, s"allocated $total != $budget")
    // no language exceeds its cap
    rows.values.foreach { case (_, cap, quota, _, _) =>
      assert(quota <= cap.toDouble + 1e-9)
    }
  }

  test("budgetFill: greedy-by-quality prefix per language, quota respected") {
    import org.apache.spark.sql.functions._
    val kept = SamplingOps.budgetFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    val quotas = SamplingOps.unimaxBudget(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // full corpus scored the same way, for the prefix property
    val all = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(graft.ops.Portable.toks(col("text"))).cast("long").as("nt"))
      .join(graft.ops.TextOps.qualityScore(spark, sf)
        .select(col("doc_id"), col("quality").as("q")), "doc_id")
      .select("doc_id", "lang", "q", "nt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    kept.groupBy(_._2).foreach { case (lang, ks) =>
      val quota = quotas(lang)
      // every admitted doc's strictly-better token mass is under quota,
      // and cum_before recomputes from the full ordering
      val order = all.filter(_._2 == lang).sortBy(d => (-d._3, d._1))
      var cum = 0L
      val expectIds = scala.collection.mutable.ListBuffer[Long]()
      order.foreach { case (id, _, _, nt) =>
        if (cum.toDouble < quota) expectIds += id
        cum += nt
      }
      assert(ks.map(_._1).toSet == expectIds.toSet,
        s"$lang: admitted set is not the greedy quality prefix")
      ks.foreach { case (id, _, _, nt, cb, partial) =>
        assert(cb.toDouble < quota, s"$lang/$id admitted past quota")
        assert((partial == 1) == ((cb + nt).toDouble > quota),
          s"$lang/$id: partial flag wrong")
      }
      // at most one straddler per language
      assert(ks.count(_._6 == 1) <= 1, s"$lang: multiple partial docs")
      // budget exhausted or language fully admitted
      val keptMass = ks.map(_._4).sum
      val langMass = order.map(_._4).sum
      assert(keptMass.toDouble >= quota || keptMass == langMass,
        s"$lang: budget unfilled with docs remaining")
    }
  }
  // ---------------------------------------------------------------- q228

  test("doremiWeights: a proper reweighted distribution that boosts hard domains") {
    val rows = SamplingOps.doremiWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // weights form a distribution (r4 granularity slack)
    val wSum = rows.map(_._5).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum to $wSum")
    val uSum = rows.map(_._3).sum
    assert(math.abs(uSum - 1.0) < 1e-3, s"shares sum to $uSum")
    rows.foreach { case (s, n, u, ex, w, boost) =>
      assert(n > 0 && u > 0 && w > 0, s"$s degenerate")
      assert(ex >= 0.0, s"$s negative excess")
      // zero excess can only lose mass to boosted domains; positive
      // excess must not lose mass (exp(eta*ex) >= 1 before normalizing)
      if (ex == 0.0) assert(boost <= 1.0 + 1e-3, s"$s boosted w/o excess")
    }
    // some domain is above reference loss unless all NLLs are equal
    assert(rows.exists(_._4 > 0.0), "no domain has excess loss")
    // the hardest domain gets the largest boost (exp is monotone)
    val byExcess = rows.sortBy(_._4)
    assert(byExcess.last._6 >= byExcess.head._6 - 1e-9,
      "boost not monotone in excess")
  }
  // ---------------------------------------------------------------- q243

  test("evalHoldout: Hamilton apportionment — exact total, within-1 quotas") {
    val rows = SamplingOps.evalHoldout(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    // seats sum to N exactly
    assert(rows.map(_._6).sum == SamplingOps.EvalHoldoutN,
      s"alloc sum ${rows.map(_._6).sum}")
    rows.foreach { case (lang, src, n, base, rem, alloc) =>
      val quota = n.toDouble * SamplingOps.EvalHoldoutN / total
      assert(alloc == base || alloc == base + 1, s"$lang/$src alloc")
      assert(base == (n * SamplingOps.EvalHoldoutN) / total, s"$lang/$src base")
      assert(rem == (n * SamplingOps.EvalHoldoutN) % total, s"$lang/$src rem")
      // Hamilton: |alloc - quota| < 1
      assert(math.abs(alloc - quota) < 1.0 + 1e-9, s"$lang/$src quota dev")
    }
    // seats beyond base go to the largest remainders
    // seats go to the largest remainders; at the boundary remainder, the
    // seated cells must precede the unseated ones in (lang, source) order
    val seated = rows.filter(r => r._6 == r._4 + 1)
    val unseated = rows.filter(r => r._6 == r._4)
    if (seated.nonEmpty && unseated.nonEmpty) {
      assert(seated.map(_._5).min >= unseated.map(_._5).max,
        "seat went to a strictly smaller remainder")
      val b = seated.map(_._5).min
      if (unseated.exists(_._5 == b)) {
        implicit val ord: Ordering[(String, String)] = Ordering.Tuple2
        val lastSeated = seated.filter(_._5 == b)
          .map(r => (r._1, r._2)).max
        val firstUnseated = unseated.filter(_._5 == b)
          .map(r => (r._1, r._2)).min
        assert(ord.lt(lastSeated, firstUnseated),
          s"tie at rem $b broken out of (lang, source) order")
      }
    }
  }

  test("scalingPlan: Muennighoff decay replay over exact-dedup supply") {
    val rows = SamplingOps.scalingPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    // supply replay: q20 keep rule (min doc_id per canonical fp)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source",
        "size(filter(split(trim(text), '\\\\s+'), t -> length(t) > 0)) ntok",
        "md5(to_binary(lower(regexp_replace(trim(text), '\\\\s+', ' ')), 'utf-8')) fp")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong, r.getString(3)))
    val keepers = docs.groupBy(_._4).values.map(_.minBy(_._1)).toSeq
    val bySrc = keepers.groupBy(_._2)
    val tot = keepers.map(_._3).sum
    val budget = SamplingOps.ScalingBudgetFactor * tot / bySrc.size
    val rs = SamplingOps.ScalingRStar
    def o4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(rows.length == bySrc.size, "one row per source")
    rows.foreach { case (s, nKept, u, b, epochs, eff, effic) =>
      val g = bySrc(s)
      assert(nKept == g.length && u == g.map(_._3).sum, s"$s supply")
      assert(b == budget, s"$s budget")
      val uD = u.toDouble; val bD = b.toDouble
      val eEff =
        if (u == 0L) 0.0
        else if (b <= u) bD
        else uD + uD * rs * (1.0 - math.exp(-(bD / uD - 1.0) / rs))
      assert(epochs == o4(if (u == 0L) 0.0 else bD / uD), s"$s epochs")
      assert(eff == o4(eEff), s"$s eff_tokens")
      assert(effic == o4(if (b == 0L) 0.0 else eEff / bD), s"$s efficiency")
      // decay sanity: effective tokens never exceed the budget, and a
      // repeating source cannot beat U·(1+R*)
      assert(eff <= b + 1e-4 && eff <= uD * (1.0 + rs) + 1e-4)
    }
  }
}
