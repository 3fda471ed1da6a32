package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ExtraOps, FunctionOps, LakehouseOps}

/** Round-4 maintenance + data-quality operators: SCD2 history build
  * (q116), MAD outlier report (q119), binned KS drift (q120).
  */
class LakehouseOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("scd2: per-key episode count matches the churn mod classes") {
    val rows = LakehouseOps.scd2Orders(spark, sf).collect()
    val byKey = rows.groupBy(_.getLong(0))
    byKey.foreach { case (k, eps) =>
      val expected =
        1 + (if (k % LakehouseOps.Scd2BumpMod == 0) 1 else 0) +
          (if (k % LakehouseOps.Scd2CutMod == 0) 1 else 0)
      assert(eps.length == expected,
        s"key $k: ${eps.length} episodes, expected $expected")
    }
    // all three episode-count classes are actually exercised by the data
    assert(byKey.values.map(_.length).toSet == Set(1, 2, 3))
  }

  test("scd2: intervals chain, first opens at 0, exactly one current") {
    val rows = LakehouseOps.scd2Orders(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (k, eps) =>
      val sorted = eps.sortBy(_.getInt(2)) // valid_from
      assert(sorted.head.getInt(2) == 0, s"key $k: history must open at v0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(3) && a.getInt(3) == b.getInt(2),
            s"key $k: episode gap/overlap")
        case _ =>
      }
      assert(sorted.init.forall(!_.getBoolean(4)), s"key $k: closed row current")
      assert(sorted.last.isNullAt(3) && sorted.last.getBoolean(4),
        s"key $k: open episode must be current")
    }
  }

  test("madOutliers: outliers bounded, MAD nonnegative, n partitions orders") {
    val rows = FunctionOps.madOutliers(spark, sf).collect()
    val nOrders = graft.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(3)).sum == nOrders)
    rows.foreach { r =>
      val (mad, n, out) = (r.getDouble(2), r.getLong(3), r.getLong(4))
      assert(mad >= 0.0)
      // |x - med| > 3·MAD can hold for at most half the group (MAD is the
      // median of those deviations), with slack for interpolation
      assert(out <= n / 2 + 1, s"${r.getString(0)}: $out outliers of $n")
    }
  }

  test("psiDrift: nonnegative, small for same-distribution halves, covers customers") {
    val rows = ExtraOps.psiDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val nCust = graft.Tables.customer(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == nCust)
    rows.foreach { r =>
      val (seg, psi, nb) = (r.getString(0), r.getDouble(4), r.getInt(3))
      assert(psi >= 0.0, s"$seg: PSI negative")
      // same-distribution halves, but at sf0.001 a segment has ~15
      // customers per side over up to 22 smoothed cells — pure sampling
      // noise puts PSI well above the production 0.1 threshold; bound at
      // the level where a REAL shift (disjoint supports ⇒ PSI ≈ several)
      // would still fail loudly
      assert(psi < 1.5, s"$seg: PSI $psi beyond sampling noise")
      assert(nb >= 1 && nb <= ExtraOps.PsiBins)
    }
    // the noise argument above, made quantitative: at 10× the data the
    // same statistic must collapse toward 0 (PSI noise scales ~ cells/n)
    val big = ExtraOps.psiDrift(spark, "/root/testdata/sf0.01").collect()
    val meanBig = big.map(_.getDouble(4)).sum / big.length
    val meanSmall = rows.map(_.getDouble(4)).sum / rows.length
    assert(meanBig < meanSmall,
      s"PSI should shrink with n: sf0.001 $meanSmall -> sf0.01 $meanBig")
  }

  test("zoneMapSkipping: verdicts exactly match a per-row recount") {
    import org.apache.spark.sql.functions._
    val rows = LakehouseOps.zoneMapSkipping(spark, sf).collect()
    val li = graft.Tables.lineitem(spark, sf)
      .select(expr(s"l_orderkey div ${LakehouseOps.ZoneFileSpan}").as("f"),
        col("l_orderkey"), col("l_shipdate")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2)))
    val dateCutoff = java.time.LocalDateTime.parse(
      LakehouseOps.ZoneDateCutoff.replace(' ', 'T'))
    assert(rows.map(_.getLong(1)).sum == li.length, "files must partition the scan")
    rows.foreach { r =>
      val inFile = li.filter(_._1 == r.getLong(0))
      assert(r.getLong(1) == inFile.length)
      val skipKey = inFile.forall(_._2 < LakehouseOps.ZoneKeyCutoff)
      val skipDate = inFile.forall(_._3.isBefore(dateCutoff))
      assert(r.getBoolean(6) == skipKey, s"file ${r.getLong(0)}: key verdict")
      assert(r.getBoolean(7) == skipDate, s"file ${r.getLong(0)}: date verdict")
      assert(r.getLong(8) == (if (skipKey) inFile.length.toLong else 0L))
    }
    // the layout diagnostic the operator exists for: the key predicate
    // prunes at least one file AND must read at least one; the
    // uncorrelated date predicate prunes nothing
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)))
    assert(rows.forall(!_.getBoolean(7)),
      "shipdate is uncorrelated with the file layout — nothing should skip")
  }

  test("momGrowth: growth recomputes from the revenue chain, first month open") {
    val rows = ExtraOps.momGrowth(spark, sf).collect()
      .sortBy(_.getString(0))
    assert(rows.length > 12, "expected a multi-year monthly series")
    assert(rows.head.isNullAt(3), "first month has no prior to grow from")
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        val expect = math.floor((cur.getDouble(2) - prev.getDouble(2)) /
          prev.getDouble(2) * 100.0 * 10000 + 0.5) / 10000
        assert(math.abs(cur.getDouble(3) - expect) < 1e-9,
          s"${cur.getString(0)}: growth mismatch")
      case _ =>
    }
  }

  test("ksDrift: statistic in [0,1], identical samples give 0") {
    val r = ExtraOps.ksDrift(spark, sf).collect()
    assert(r.length == 1)
    val ks = r.head.getDouble(2)
    assert(ks >= 0.0 && ks <= 1.0)
    // even/odd key halves of the same synthetic distribution: drift must
    // be small but the statistic still well-defined
    assert(ks < 0.2, s"same-distribution halves drifted: $ks")
    assert(r.head.getLong(0) + r.head.getLong(1) ==
      graft.Tables.orders(spark, sf).count())
  }

  // ------------------------------------------------------------------ q142

  test("cdcApply: last-write-wins compaction with delete and resurrection") {
    import org.apache.spark.sql.functions.col
    val base = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = LakehouseOps.cdcApply(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    def r2(x: Double) = math.floor(x * 100.0 + 0.5) / 100.0
    base.foreach { case (k, p) =>
      val u = LakehouseOps.CdcUpdMod; val d = LakehouseOps.CdcDelMod
      if (k % (u * d) == 0)           // delete at seq2, update at seq4 wins
        assert(got(k) == ((r2(p * 1.2), "U")), s"key $k must resurrect")
      else if (k % d == 0)            // delete wins
        assert(!got.contains(k), s"key $k must be deleted")
      else if (k % u == 0)            // plain update
        assert(got(k) == ((r2(p * 1.1), "U")), s"key $k must carry the update")
      else
        assert(got(k) == ((p, "base")), s"key $k must pass through")
      if (k % LakehouseOps.CdcInsMod == 0)
        assert(got(-k - 1) == ((99.0, "I")), s"insert for $k missing")
    }
    // no phantom rows: everything in the output is base-derived or inserted
    got.keys.foreach { k =>
      assert(base.contains(k) || base.contains(-k - 1), s"phantom key $k")
    }
  }

  // ------------------------------------------------------------------ q146

  test("weightedMedian: brute-force weighted-median per returnflag") {
    import org.apache.spark.sql.functions.col
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100.0 + 0.5).toLong, r.getDouble(2).toLong))
    val expect = rows.groupBy(_._1).map { case (f, xs) =>
      val tot = xs.map(_._3).sum
      val sorted = xs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val med = sorted.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      f -> ((tot, med))
    }
    val got = FunctionOps.weightedMedian(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == expect.keySet)
    got.foreach { r =>
      val (tot, med) = expect(r.getString(0))
      assert(r.getLong(1) == tot, s"${r.getString(0)}: total weight")
      assert(r.getLong(2) == med, s"${r.getString(0)}: weighted median")
    }
  }

  // ------------------------------------------------------------------ q147

  test("deadLetter: dead count is exactly the injected corruption set") {
    import org.apache.spark.sql.functions.col
    val events = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = events.groupBy(_._2).map { case (t, xs) =>
      t -> ((xs.length.toLong,
        xs.count(_._1 % graft.ops.SemiStructuredOps.DeadLetterMod == 0).toLong))
    }
    val got = graft.ops.SemiStructuredOps.deadLetter(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == expect.keySet)
    got.foreach { r =>
      val (n, dead) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == dead,
        s"${r.getString(0)}: n/dead diverge")
      val rate = math.floor(dead.toDouble / n * 10000.0 + 0.5) / 10000.0
      assert(r.getDouble(3) == rate)
    }
  }

  test("q182: compaction groups honor the greedy packing guarantees") {
    val rows = graft.ops.LakehouseOps.compactionPlan(spark, sf).collect()
      .map(r => (r.getAs[String]("part_key"), r.getAs[Long]("n_rows"), r.getAs[Long]("bin")))
    assert(rows.nonEmpty)
    // every source partition is planned exactly once, rows conserved
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum == total, "plan lost or duplicated rows")
    assert(rows.map(_._1).distinct.length == rows.length)
    // bin ids start at 0 and never exceed what the total volume implies
    // (oversized partitions may legitimately skip ids — each takes a
    // whole group; contiguity is NOT a general guarantee)
    val bins = rows.map(_._3).distinct.sorted
    assert(bins.head == 0L, "first group must be 0")
    assert(bins.last <= total / graft.ops.LakehouseOps.CompactTarget,
      s"bin id ${bins.last} beyond the volume bound")
    // the greedy bound: a group exceeds the target only by its straddling
    // item — fill < target + largest item in the group
    rows.groupBy(_._3).foreach { case (b, g) =>
      val fill = g.map(_._2).sum
      assert(fill < graft.ops.LakehouseOps.CompactTarget + g.map(_._2).max,
        s"bin $b overfilled: $fill")
    }
  }

  test("layoutAudit: cells partition rows, z-cells bound BOTH dims, skip sound") {
    import graft.ops.LakehouseOps._
    import graft.ops.ScaleOps
    val rows = LakehouseOps.layoutAudit(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    val zSpan = (1L << ScaleOps.ZorderBits) / (1L << (LayoutCellBits / 2))
    val linSpan = (1L << ScaleOps.ZorderBits) / (1L << LayoutCellBits)
    Seq("zorder", "linear").foreach { layout =>
      val cells = rows.filter(_.getString(0) == layout)
      assert(cells.map(_.getLong(2)).sum == total, s"$layout lost rows")
      assert(cells.map(_.getLong(1)).distinct.length == cells.length)
      cells.foreach { c =>
        val (mna, mxa, mnb, mxb) = (c.getLong(3), c.getLong(4), c.getLong(5), c.getLong(6))
        // the layout contract: z-prefix cells bound BOTH quantized dims to
        // a 2^(bits/2)-th of the range; linear cells bound only dim A
        if (layout == "zorder") {
          assert(mxa - mna < zSpan, s"z-cell ${c.getLong(1)} dim-A span")
          assert(mxb - mnb < zSpan, s"z-cell ${c.getLong(1)} dim-B span")
        } else assert(mxa - mna < linSpan, s"linear cell dim-A span")
        // skip verdict is exactly the bounds-vs-rectangle test
        val expectSkip = mxa < LayoutProbeALo || mna > LayoutProbeAHi ||
          mxb < LayoutProbeBLo || mnb > LayoutProbeBHi
        assert(c.getBoolean(7) == expectSkip)
        assert(c.getLong(8) == (if (expectSkip) 0L else c.getLong(2)))
      }
    }
  }

  test("layoutAudit: z-order scans at most the linear layout's rows (sf0.01 probe)") {
    // sf0.001 keys never reach the probe rectangle (both layouts skip
    // everything); sf0.01 populates the full 16-bit residue range, so the
    // comparative claim is actually exercised there
    val rows = LakehouseOps.layoutAudit(spark, "/root/testdata/sf0.01").collect()
    def scanned(layout: String) =
      rows.filter(_.getString(0) == layout).map(_.getLong(8)).sum
    val (z, lin) = (scanned("zorder"), scanned("linear"))
    assert(lin > 0, "probe must hit data at sf0.01")
    assert(z < lin, s"z-order must out-prune linear: z=$z linear=$lin")
  }

  test("manifestDiff: differing buckets are exactly those holding churned keys") {
    import graft.ops.LakehouseOps._
    val rows = LakehouseOps.manifestDiff(spark, sf).collect()
    // recompute the affected bucket set with the same portable hash
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0))
    def bucket(k: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % ManifestBuckets
    }
    val affected = keys.filter(k =>
      k % ManifestTamperMod == 0 || k % ManifestDropMod == 0).map(bucket).toSet
    val flagged = rows.filter(_.getBoolean(7)).map(_.getLong(0)).toSet
    assert(flagged == affected,
      s"diff must localize churn: flagged=$flagged affected=$affected")
    // clean buckets carry bit-identical digests on both sides
    rows.filterNot(_.getBoolean(7)).foreach { r =>
      assert(r.getLong(1) == r.getLong(2))
      assert(r.getLong(3) == r.getLong(4) && r.getLong(5) == r.getLong(6))
    }
    // row-count conservation: Σn_a = all orders, Σn_b = orders minus drops
    assert(rows.map(_.getLong(1)).sum == keys.length.toLong)
    assert(rows.map(_.getLong(2)).sum ==
      keys.count(_ % ManifestDropMod != 0).toLong)
  }

  test("localizedDiff: emits exactly the churned keys with correct classes") {
    import graft.ops.LakehouseOps._
    val rows = LakehouseOps.localizedDiff(spark, sf).collect()
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0))
    val dropped = keys.filter(_ % ManifestDropMod == 0).toSet
    // a tampered key that is ALSO dropped reports as dropped, and a
    // tamper whose 1% bump rounds to the same cents is not a diff at all
    val changed = keys.filter(k =>
      k % ManifestTamperMod == 0 && k % ManifestDropMod != 0).toSet
    val got = rows.map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got.filter(_._2 == "dropped").keySet == dropped)
    val gotChanged = got.filter(_._2 == "changed").keySet
    assert(gotChanged.subsetOf(changed),
      s"non-tampered keys reported changed: ${gotChanged.diff(changed)}")
    // every tampered key whose cents actually moved is caught
    rows.filter(_.getString(3) == "changed").foreach { r =>
      assert(r.getLong(1) != r.getLong(2), s"key ${r.getLong(0)}: equal cents")
    }
    assert(got.values.forall(_ != "added"), "this churn never adds keys")
    assert(rows.nonEmpty)
  }

  test("overlapDepth: arrival files overlap everything, clustered files nothing") {
    val rows = LakehouseOps.overlapDepth(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    Seq("arrival", "clustered").foreach { layout =>
      val files = rows.filter(_.getString(0) == layout)
      assert(files.map(_.getLong(2)).sum == total, s"$layout lost rows")
      // depth is symmetric-consistent: a file's depth < file count
      files.foreach(f => assert(f.getLong(5) < files.length))
    }
    // the audit's verdict: every clustered file is probe-exact...
    rows.filter(_.getString(0) == "clustered")
      .foreach(f => assert(f.getLong(5) == 0L,
        s"clustered file ${f.getString(1)} overlaps ${f.getLong(5)}"))
    // ...while arrival files (monthly, each spanning ~the whole customer
    // range) overlap nearly everything — the re-cluster trigger
    val arrival = rows.filter(_.getString(0) == "arrival")
    val avgDepth = arrival.map(_.getLong(5)).sum.toDouble / arrival.length
    assert(avgDepth > 0.8 * (arrival.length - 1),
      s"arrival layout should be near-fully overlapped, avg $avgDepth of ${arrival.length - 1}")
  }

  test("timeTravel: the AS OF read reconstructs snapshot v1 row-for-row") {
    import graft.ops.LakehouseOps._
    val got = LakehouseOps.timeTravel(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2), r.getBoolean(3)))
      .toMap
    // independent v1 construction straight from the churn constants
    def r2(x: Double) = math.floor(x * 100.0 + 0.5) / 100.0
    val v1 = Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_totalprice"))
      .collect().map { r =>
        val k = r.getLong(0)
        val p0 = r.getDouble(1)
        k -> (if (k % Scd2BumpMod == 0) r2(p0 * 1.05) else p0)
      }.toMap
    assert(got.keySet == v1.keySet, "AS OF v1 must cover every key once")
    got.foreach { case (k, (price, from, current)) =>
      assert(price == v1(k), s"key $k: price at v1")
      // the serving episode opened at or before v1...
      assert(from <= AsOfVersion)
      // ...and an episode superseded at v2 cannot be marked current
      if (k % Scd2CutMod == 0) assert(!current, s"key $k: v2 supersedes")
    }
  }
}
