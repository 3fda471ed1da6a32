package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.EventOps

class EventOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("hoppingWindow: every event lands in exactly WinHops windows") {
    // raw spark.read.parquet rejects TIMESTAMP(NANOS); Tables.events carries
    // the int64-nanos read path
    val events = graft.Tables.events(spark, sf).count()
    val windowed = EventOps.hoppingWindow(spark, sf)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(windowed == events * EventOps.WinHops,
      s"expected ${events * EventOps.WinHops} window-event memberships, got $windowed")
  }

  test("ewma: constant series stays constant; single event equals its value") {
    import spark.implicits._
    val series =
      // user 1: constant 10.0 series longer than the tap window
      (1L to 12L).map(i => (1L, i, 10.0, i * 1000L)) :+
      // user 2: a single event
      ((2L, 100L, 7.5, 5000L))
    val df = series.toDF("user_id", "event_id", "value", "tns")
    val out = EventOps.ewmaOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // renormalized weights ⇒ a constant series is a fixed point at every
    // position, including the ramp-up rows before all taps exist
    (1L to 12L).foreach(i => assert(out((1L, i)) == 10.0,
      s"constant series drifted at event $i: ${out((1L, i))}"))
    assert(out((2L, 100L)) == 7.5, "single event must equal its value")
  }

  test("ewma: step series decays toward the new level with 2^-k weights") {
    import spark.implicits._
    // 8 events at 0.0 then one at 16.0: ewma = 16·1 / Σ_{k<8} 2^-k = 16/1.9921875
    val df = ((1L to 8L).map(i => (1L, i, 0.0, i * 1000L)) :+ ((1L, 9L, 16.0, 9000L)))
      .toDF("user_id", "event_id", "value", "tns")
    val last = EventOps.ewmaOf(df).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap.apply(9L)
    val expected = math.floor(16.0 / 1.9921875 * 10000.0 + 0.5) / 10000.0
    assert(last == expected, s"expected $expected, got $last")
  }

  test("dateSpine: contiguous days, gaps are zero-count rows") {
    val rows = EventOps.dateSpine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val days = rows.map(_._1)
    assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 },
      "spine must be contiguous")
    assert(rows.forall { case (_, n, gap) => (gap == 1) == (n == 0) },
      "is_gap must mark exactly the zero-count days")
  }

  test("gapFill: dense frame, LOCF semantics, observed days pass through") {
    val rows = EventOps.gapFill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    val byType = rows.groupBy(_._1)
    val nDays = rows.map(_._2).distinct.length
    byType.foreach { case (t, series) =>
      assert(series.length == nDays, s"$t: frame not dense")
      var lastSeen = 0L
      series.sortBy(_._2).foreach { case (_, day, n, filled, gap) =>
        if (gap == 0) {
          assert(filled == n, s"$t/$day: observed day must pass through")
          lastSeen = n
        } else {
          assert(n == 0, s"$t/$day: gap day must report 0 observed")
          assert(filled == lastSeen, s"$t/$day: LOCF must carry $lastSeen")
        }
      }
    }
  }

  // ------------------------------------------------------------------ q140

  test("intervalCoverage: equals a brute-force per-user interval union") {
    val iv = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value")).collect()
      .map { r =>
        val start = r.getLong(1) - java.lang.Math.floorMod(r.getLong(1), 1000L)
        val dur = math.floor(r.getDouble(2) * 100.0 + 0.5).toLong * EventOps.CentiValueNs
        (r.getLong(0), start, start + dur)
      }
    val expect = iv.groupBy(_._1).map { case (u, xs) =>
      val sorted = xs.map(x => (x._2, x._3)).sortBy(_._1)
      var islands = List.empty[(Long, Long)]
      sorted.foreach { case (s, e) =>
        islands match {
          case (is, ie) :: rest if s <= ie =>
            islands = (is, math.max(ie, e)) :: rest
          case _ => islands = (s, e) :: islands
        }
      }
      u -> (islands.size.toLong, islands.map(i => i._2 - i._1).sum)
    }
    val rows = EventOps.intervalCoverage(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == expect.keySet)
    rows.foreach { r =>
      val (n, cov) = expect(r.getLong(0))
      assert(r.getLong(1) == n, s"user ${r.getLong(0)}: n_intervals")
      assert(r.getLong(2) == cov, s"user ${r.getLong(0)}: covered_ns")
    }
  }

  // ------------------------------------------------------------------ q151

  test("lateData: per-type watermark replay matches a sequential reference") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("ts")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getLong(2) - java.lang.Math.floorMod(r.getLong(2), 1000L)))
    def arr(id: Long) =
      id + (id % EventOps.ArrivalJitterMod) * EventOps.ArrivalJitterStep
    val expect = evs.groupBy(_._1).map { case (t, xs) =>
      var runMax = Long.MinValue
      var late = 0L; var maxLateness = 0L; var n = 0L
      xs.sortBy(e => (arr(e._2), e._2)).foreach { case (_, _, ts) =>
        n += 1
        if (runMax != Long.MinValue) {
          val wm = runMax - EventOps.LateDelayNs
          if (ts < wm) { late += 1; maxLateness = math.max(maxLateness, wm - ts) }
        }
        runMax = math.max(runMax, ts)
      }
      t -> ((n, late, maxLateness))
    }
    val rows = EventOps.lateData(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == expect.keySet)
    rows.foreach { r =>
      val (n, late, maxL) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == late,
        s"${r.getString(0)}: counts diverge")
      val rate = math.floor(late.toDouble / n * 10000.0 + 0.5) / 10000.0
      assert(r.getDouble(3) == rate, s"${r.getString(0)}: late_rate")
      assert(r.getLong(4) == maxL, s"${r.getString(0)}: max_lateness")
    }
    // the audit must observe SOME lateness at a 2h bound on this stream,
    // otherwise the operator proves nothing about the delay choice
    assert(rows.map(_.getLong(2)).sum > 0, "no late events observed")
  }

  // ------------------------------------------------------------------ q159

  test("activeUsers: DAU/WAU recompute from distinct (user, day) sets") {
    val ud = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / EventOps.DayNs)).distinct
    val (d0, d1) = (ud.map(_._2).min, ud.map(_._2).max)
    val dau = ud.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong)
    val rows = EventOps.activeUsers(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == (d0 to d1).toSet,
      "every calendar day inside the data range must report")
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    rows.foreach { r =>
      val day = r.getLong(0)
      val wau = ud.filter { case (_, d) =>
        d <= day && d > day - EventOps.WauDays }.map(_._1).distinct.size.toLong
      assert(r.getLong(1) == dau.getOrElse(day, 0L), s"day $day: dau")
      assert(r.getLong(2) == wau, s"day $day: wau")
      assert(r.getDouble(3) == r4(r.getLong(1).toDouble / wau), s"day $day: stickiness")
      assert(r.getLong(1) <= r.getLong(2), s"day $day: DAU must not exceed WAU")
    }
  }

  // ------------------------------------------------------------------ q161

  test("conformance: orphan actions recompute against first-view times") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(2) - java.lang.Math.floorMod(r.getLong(2), 1000L)))
    val firstView = evs.filter(_._2 == "view").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val expect = evs.filter(e => e._2 == "click" || e._2 == "purchase")
      .groupBy(_._2).map { case (t, xs) =>
        val orphans = xs.count(e =>
          !firstView.contains(e._1) || e._3 < firstView(e._1))
        t -> ((xs.length.toLong, orphans.toLong))
      }
    val rows = EventOps.conformance(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == expect.keySet)
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    rows.foreach { r =>
      val (n, orphan) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == orphan,
        s"${r.getString(0)}: counts")
      assert(r.getDouble(3) == r4(orphan.toDouble / n))
    }
  }

  // ------------------------------------------------------------------ q162

  test("conversionLatency: quartiles over the recomputed latency set") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(2) - java.lang.Math.floorMod(r.getLong(2), 1000L)))
    val lat = evs.groupBy(_._1).flatMap { case (_, xs) =>
      val v0 = xs.filter(_._2 == "view").map(_._3).minOption
      val p0 = xs.filter(_._2 == "purchase").map(_._3).minOption
      (v0, p0) match {
        case (Some(v), Some(p)) if p >= v => Some((p - v) / 1e9)
        case _ => None
      }
    }.toSeq.sorted
    def q(p: Double): Double = { // quantile_cont / Spark percentile formula
      val pos = p * (lat.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      lat(lo) + (pos - lo) * (lat(hi) - lat(lo))
    }
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val r = EventOps.conversionLatency(spark, sf).collect().head
    assert(r.getLong(0) == lat.length.toLong, "converted-user count")
    assert(r.getDouble(1) == r4(q(0.25)), "p25")
    assert(r.getDouble(2) == r4(q(0.5)), "p50")
    assert(r.getDouble(3) == r4(q(0.9)), "p90")
    assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
  }

  // ------------------------------------------------------------------ q164

  test("weeklyChurn: retained/churned recompute from weekly active sets") {
    val uw = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / EventOps.WeekNs)).distinct
    val byWeek = uw.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val rows = EventOps.weeklyChurn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == byWeek.keySet.map(_ + 1),
      "one churn row per observed previous week")
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    rows.foreach { r =>
      val prev = byWeek(r.getLong(0) - 1)
      val retained = (prev intersect byWeek.getOrElse(r.getLong(0), Set.empty)).size
      assert(r.getLong(1) == prev.size.toLong, s"week ${r.getLong(0)}: prev actives")
      assert(r.getLong(2) == retained.toLong, s"week ${r.getLong(0)}: retained")
      assert(r.getLong(3) == (prev.size - retained).toLong)
      assert(r.getDouble(4) == r4((prev.size - retained).toDouble / prev.size))
    }
  }

  // ------------------------------------------------------------------ q165

  test("maxDrawdown: sequential peak/trough replay per user") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value")).collect()
      .map { r =>
        val tns = r.getLong(2) - java.lang.Math.floorMod(r.getLong(2), 1000L)
        val c = math.floor(r.getDouble(4) * 100.0 + 0.5).toLong
        (r.getLong(0), r.getLong(1), tns,
          if (r.getString(3) == "error") -c else c)
      }
    val expect = evs.groupBy(_._1).map { case (u, xs) =>
      var (bal, peak, dd) = (0L, Long.MinValue, 0L)
      xs.sortBy(e => (e._3, e._2)).foreach { case (_, _, _, flow) =>
        bal += flow
        peak = math.max(peak, bal)
        dd = math.max(dd, peak - bal)
      }
      u -> ((xs.length.toLong, dd, peak))
    }
    val rows = EventOps.maxDrawdown(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == expect.keySet)
    rows.foreach { r =>
      val (n, dd, peak) = expect(r.getLong(0))
      assert(r.getLong(1) == n, s"user ${r.getLong(0)}: n_events")
      assert(r.getLong(2) == dd, s"user ${r.getLong(0)}: max drawdown")
      assert(r.getLong(3) == peak, s"user ${r.getLong(0)}: peak")
      assert(r.getLong(2) >= 0L)
    }
    // the error debits must make SOME series actually draw down
    assert(rows.exists(_.getLong(2) > 0), "no drawdown anywhere — signal vacuous")
  }

  test("q181 CUPED: variance shrinks, mean survives, theta is one number") {
    val rows = graft.ops.EventOps.cuped(spark, sf).collect()
    assert(rows.length > 10)
    val post = rows.map(_.getAs[Long]("post_c").toDouble / 100.0)
    val adj = rows.map(_.getAs[Double]("adj"))
    def variance(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    // the entire point of the op: the pre-period covariate explains real
    // variance, so the adjusted metric is strictly tighter (the synthetic
    // per-user values are correlated across halves via user activity)
    assert(variance(adj) < variance(post),
      s"no variance reduction: ${variance(adj)} vs ${variance(post)}")
    // CUPED is mean-preserving: E[adj] = E[post] because E[pre - mean] = 0
    val meanDrift = math.abs(adj.sum / adj.length - post.sum / post.length)
    assert(meanDrift < 1e-3, s"adjustment moved the mean by $meanDrift")
    // theta is a corpus constant carried per row
    assert(rows.map(_.getAs[Double]("theta")).distinct.length == 1)
  }
}
