package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ScaleOps

class ScaleOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("topKPerGroup agrees with the window form") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val viaAgg = ScaleOps.topKPerGroup(orders, "o_custkey", "o_totalprice", "o_orderkey", 3)
      .select("o_custkey", "o_orderkey", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("o_custkey", "o_orderkey", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("topK aggregation has a map-side partial phase (no Window, no global sort)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val plan = ScaleOps.topKPerGroup(orders, "o_custkey", "o_totalprice", "o_orderkey", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "topK must not plan a window")
    assert(plan.contains("Aggregate"), s"expected aggregate:\n$plan")
  }

  test("saltedAgg equals plain aggregation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val salted = ScaleOps.saltedAgg(li, "l_returnflag", "l_quantity", salt = 8)
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 100))).toSet
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 100))).toSet
    assert(salted == plain)
  }

  test("saltedBroadcastJoin equals plain join") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val n = spark.read.parquet(s"$sf/nation.parquet")
    val salted = ScaleOps.saltedBroadcastJoin(c, n, "c_nationkey", "n_nationkey", 4)
      .select("c_custkey", "n_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .select("c_custkey", "n_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(salted.size == c.count())
  }

  test("salt is deterministic across reruns and spreads duplicate rows") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def saltRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.withColumn("_s", ScaleOps.contentSalt(df, 8))
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val base = saltRows(li)
    // re-reading the same files re-derives the identical salts (the
    // monotonically_increasing_id salt this replaced did not)
    assert(saltRows(spark.read.parquet(s"$sf/lineitem.parquet")) == base)
    // salt actually spreads rows (not constant)
    assert(base.map(_.split("\\|").last).toSet.size > 1)
    // byte-identical duplicate rows — the most skew-prone shape — must
    // STILL spread (partition id disambiguates what content cannot)
    val dups = spark.range(1000)
      .select(lit(1L).as("k"), lit(2.0).as("v")).repartition(8)
    val spread = dups.withColumn("_s", ScaleOps.contentSalt(dups, 8))
      .select("_s").distinct().count()
    assert(spread > 1, "duplicate rows collapsed onto one salt")
  }

  test("bloomPrefilteredJoin equals plain join and prunes the probe side") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val hot = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 400000.0)
    val viaBloom = ScaleOps.bloomPrefilteredJoin(li, hot, "l_orderkey", "o_orderkey", 10000L)
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val plain = li.join(hot, li("l_orderkey") === hot("o_orderkey"))
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaBloom == plain)
    // the prefilter must actually prune: surviving probe rows ≪ full scan
    val bf = hot.stat.bloomFilter("o_orderkey", 10000L, 0.01)
    val survivors = li.collect().count(r => bf.mightContainLong(r.getAs[Long]("l_orderkey")))
    assert(survivors < li.count() / 2, s"bloom pruned nothing: $survivors")
  }

  test("ranged prefix ops match the window form on NULLs and range boundaries") {
    import org.apache.spark.sql.expressions.Window
    // keys straddle range boundaries (rid = k/3); NULL values probe the SQL
    // aggregate semantics the combine must preserve: sum/max skip NULLs and
    // are NULL only over an empty-or-all-NULL prefix, lag propagates a
    // legitimately NULL lagged VALUE but range-boundary rows must borrow
    // from the previous range
    val cells = Seq(
      (0L, Some(5L)), (1L, None), (2L, Some(3L)),       // rid 0
      (3L, None), (4L, Some(7L)),                        // rid 1 (leading NULL)
      (6L, None), (7L, None),                            // rid 2 (all NULL)
      (9L, Some(1L))                                     // rid 3
    ).toDF("k", "v")
    val rid = col("k") / 3
    def sortedRows(df: org.apache.spark.sql.DataFrame, c: String) =
      df.orderBy("k").select(col("k"), col(c)).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.get(1))).toSeq

    val cumWin = cells.withColumn("cum", sum(col("v")).over(
      Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)))
    assert(sortedRows(ScaleOps.rangedCumSum(cells, "k", rid,
      Seq(("v", "cum"))), "cum") == sortedRows(cumWin, "cum"))

    for (desc <- Seq(false, true)) {
      val ord = if (desc) col("k").desc else col("k").asc
      val maxWin = cells.withColumn("pm", max(col("v")).over(
        Window.orderBy(ord).rowsBetween(Window.unboundedPreceding, -1)))
      assert(sortedRows(ScaleOps.rangedPrefixMax(cells, "k", rid,
        "v", "pm", desc), "pm") == sortedRows(maxWin, "pm"), s"desc=$desc")
    }

    val lagWin = cells.withColumn("pv",
      lag(col("v"), 1).over(Window.orderBy(col("k"))))
    assert(sortedRows(ScaleOps.rangedLag(cells, "k", rid, "v", "pv"), "pv")
      == sortedRows(lagWin, "pv"))
  }

  test("sessionizeRanged matches the single-window form, incl. cross-range chains") {
    import org.apache.spark.sql.expressions.Window
    def windowForm(ev: org.apache.spark.sql.DataFrame, gap: Long) = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      ev.withColumn("__p", lag(col("ts"), 1).over(w))
        .withColumn("__n",
          when(col("__p").isNull || col("ts") - col("__p") > gap, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("__n"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .drop("__p", "__n")
    }
    def assignments(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_id", "session_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // a mega-user chain fixture: rangeNs = 100, gap = 30. User 1: one
    // session straddling the rid 0→1 boundary (merge, with a tie), a new
    // session whose start coincides with the rid 1→2 boundary (90 > gap),
    // a new session INSIDE rid 3, and a session straddling rid 3→4
    // (2 ≤ gap merges); user 2's boundary does NOT merge (gap just over).
    val gap = 30L
    val ev = Seq(
      (1L, 10L), (1L, 35L), (1L, 60L), (1L, 90L),   // rid 0
      (1L, 110L), (1L, 140L), (1L, 140L),           // rid 1 (merge, tie)
      (1L, 230L), (1L, 260L),                       // rid 2 (merge: 170? no
      //   — 230-140=90 > 30 → NEW session despite adjacency)
      (1L, 310L),                                   // rid 3 (merge: 310-260=50>30 → new)
      (1L, 399L), (1L, 401L),                       // rid 3→4 chain (2 ≤ 30 merges)
      (2L, 95L), (2L, 126L)                         // user 2: 31 > 30 → no merge
    ).zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      .toDF("user_id", "ts", "event_id")
    val ranged = ScaleOps.sessionizeRanged(ev, "user_id", "ts", "event_id",
      gapNs = gap, rangeNs = 100L)
    assert(assignments(ranged) == assignments(windowForm(ev, gap)))
    // the fixture is non-vacuous: boundary-straddling merges AND
    // boundary-coinciding new sessions both occur
    val perUser = ranged.groupBy("user_id").agg(max(col("session_idx")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser(1L) == 4L, s"user 1 sessions: ${perUser(1L)}")
    assert(perUser(2L) == 2L, s"user 2 sessions: ${perUser(2L)}")

    // and on the real events table (int64 nanos): identical assignment
    val real = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val gapNs = graft.ops.EventOps.SessionGapNs
    assert(assignments(ScaleOps.sessionizeRanged(real, "user_id", "ts",
        "event_id", gapNs, rangeNs = 4 * gapNs))
      == assignments(windowForm(real, gapNs)))
  }

  test("cpuBound pins the stage width AQE would otherwise coalesce away") {
    // a byte-light post-shuffle stage: AQE's byte-sized coalescing folds
    // it into ~1 task; cpuBound's REPARTITION_BY_NUM must survive AQE at
    // the session's shuffle width (the q194 serialized-verify regression)
    val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val tiny = spark.range(10000)
      .select((col("id") % 100).as("k"), col("id").as("v"))
      .groupBy(col("k")).agg(count(lit(1)).as("n")) // a real exchange first
    def partsOf(df: org.apache.spark.sql.DataFrame): Int = {
      val ids = df.select(spark_partition_id().as("p")).distinct()
        .collect().map(_.getInt(0))
      ids.length
    }
    // sanity: AQE coalesces the plain tiny aggregate below session width
    assert(partsOf(tiny) < width, "expected AQE to coalesce the control")
    val pinned = ScaleOps.cpuBound(tiny)
    val nonEmpty = partsOf(pinned)
    // hash-round-robin over 100 keys at `width` partitions: every (or
    // nearly every) partition populated, and the RDD keeps full width
    assert(pinned.rdd.getNumPartitions == width,
      s"cpuBound width ${pinned.rdd.getNumPartitions} != $width")
    assert(nonEmpty > width / 2, s"only $nonEmpty populated partitions")
  }

  test("shardMigration: movers all land on the new shard, ≈1/(N+1) move") {
    val n = ScaleOps.RendezvousShards
    val rows = ScaleOps.shardMigration(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val total = rows.map(_._3).sum
    assert(total == Tables.documents(spark, sf).count(), "matrix covers corpus")
    // the HRW structural invariant: old weights are unchanged, so a doc
    // whose placement changed can ONLY have been won by the added shard
    rows.foreach { case (from, to, _, moved) =>
      assert(from >= 0 && from < n && to >= 0 && to <= n)
      assert(moved == (from != to))
      if (moved) assert(to == n, s"mover $from->$to bypassed the new shard")
    }
    // expected movement is total/(N+1); allow generous sampling slack at
    // this sf but reject both mod-N-style mass movement and zero movement
    val movedN = rows.filter(_._4).map(_._3).sum
    assert(movedN > 0, "scale-out must move something")
    assert(movedN.toDouble / total < 3.0 / (n + 1),
      s"moved $movedN of $total — rendezvous must not mass-migrate")
  }
}
