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
}
