package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.{AdvancedOps, ScaleOps}

/** q172 ranged as-of: the bucket-and-stitch carry-in must be row-identical
  * to the q51 single-window form — on constructed cross-range fixtures
  * (the cases the window form gets for free and the ranged form must
  * stitch: seeds carried across empty and probe-only ranges, boundary
  * ties, keys with no build rows) and on the real events table.
  */
class RangedAsOfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("rangedAsOf matches the single-window form on cross-range fixtures") {
    import org.apache.spark.sql.expressions.Window
    // (user, ts, side, tie, payload) — payload non-null exactly on build
    // rows (side 0). rangeNs = 100 so the rid boundaries land mid-fixture.
    val rows = Seq(
      // user 1: build in rid 0; probes in rid 1 and rid 3 must carry it
      // across an EMPTY rid 2 and a probe-only rid 1
      (1L, 10L, 0, 1L, Some(100L)),
      (1L, 150L, 1, 2L, None),
      (1L, 350L, 1, 3L, None),
      // ...then a newer build in rid 4 wins for the rid-4 probe AFTER it,
      // while the rid-4 probe BEFORE it still reads the rid-0 seed
      (1L, 405L, 1, 4L, None),
      (1L, 410L, 0, 5L, Some(200L)),
      (1L, 420L, 1, 6L, None),
      // boundary tie: build and probe at the SAME ts in rid 5 — side
      // orders the build first, so the probe sees it
      (1L, 500L, 0, 7L, Some(300L)),
      (1L, 500L, 1, 8L, None),
      // user 2: probe BEFORE any build → null; then build; then probe
      (2L, 20L, 1, 1L, None),
      (2L, 130L, 0, 2L, Some(900L)),
      (2L, 260L, 1, 3L, None),
      // user 3: probe-only key → all null, must survive the stitch join
      (3L, 40L, 1, 1L, None)
    ).toDF("user_id", "ts", "side", "tie", "p")

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc, col("tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def picks(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "tie", "side", "out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val windowed = rows.withColumn("out",
      last(col("p"), ignoreNulls = true).over(w))
    val ranged = ScaleOps.rangedAsOf(rows, "user_id", "ts", "side", "tie",
      "p", rangeNs = 100L, out = "out")
    assert(picks(ranged) == picks(windowed))
    // non-vacuous: the fixture exercises a carry across >1 range, a
    // local-beats-seed case, a boundary tie, and a never-built key
    val byTie = ranged.filter(col("user_id") === 1L)
      .select("tie", "out").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(byTie(3L) == 100L, "carry across empty range")
    assert(byTie(4L) == 100L, "probe before same-range build reads the seed")
    assert(byTie(6L) == 200L, "local build beats the seed")
    assert(byTie(8L) == 300L, "boundary tie orders build before probe")
    assert(picks(ranged).contains((3L, 1L, 1, -1L)), "probe-only key stays null")
  }

  test("q172 equals q51 on the real events table") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(rows(AdvancedOps.asofJoinRanged(spark, sf))
      == rows(AdvancedOps.asofJoin(spark, sf)))
  }

  test("q174 equals q29 on the real events table") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(rows(graft.ops.EventOps.sessionizeRangedGate(spark, sf))
      == rows(graft.ops.EventOps.sessionize(spark, sf)))
  }

  test("ranged plan buckets the event-sized window by (user, range)") {
    // optimized LOGICAL plan: AQE wraps the physical plan until execution
    val windows = AdvancedOps.asofJoinRanged(spark, sf)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.nonEmpty, "expected window nodes in the ranged plan")
    // the event-sized running-last window (the one computing last(p)) must
    // be partitioned by BOTH user and the range bucket; only the
    // calendar-bounded summary stitch may partition by user alone
    val eventWindows = windows.filter { w =>
      val s = w.windowExpressions.mkString
      s.contains("last(") && !s.contains("__s") // __s = the summary stitch
    }
    assert(eventWindows.nonEmpty, "expected the running-last window")
    eventWindows.foreach { w =>
      assert(w.partitionSpec.size >= 2 &&
        w.partitionSpec.mkString.contains("__rid"),
        s"running-last window must bucket by (user, __rid): ${w.partitionSpec}")
    }
  }
}
