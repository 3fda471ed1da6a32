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
}
