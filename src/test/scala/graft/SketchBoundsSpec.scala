package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.AdvancedOps

/** q56's RAW sketch estimates have no cross-engine oracle (HLL++/KLL
  * internals are engine-specific); since r9 the gate query itself outputs
  * exact values + within-bound booleans that DO hash-match a DuckDB
  * oracle. This spec keeps the INDEPENDENT check: it recomputes the raw
  * estimates with the same sketch parameters and asserts them against
  * exact values within the algorithms' published error bounds — so a
  * regression in the sketches themselves cannot hide behind a query that
  * (hypothetically) hard-coded its booleans.
  */
class SketchBoundsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact; approx_percentile within p±2% rank") {
    val li = Tables.lineitem(spark, sf)
    // raw estimates, same parameters as q56 (rsd 1%, accuracy 1000)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("hll"),
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000)).as("med"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // q56 configures rsd = 1%; 5% here is a 5-sigma bound
    exact.foreach { case (flag, nd) =>
      val est = approx(flag)._1
      assert(math.abs(est - nd).toDouble / nd < 0.05,
        s"HLL estimate $est vs exact $nd for $flag")
    }
    // percentile estimate must land within the [48%, 52%] rank band
    exact.keys.foreach { flag =>
      val med = approx(flag)._2
      val vals = li.filter(col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      val rank = vals.count(_ <= med).toDouble / vals.length
      assert(rank > 0.48 && rank < 0.52, s"approx median rank $rank for $flag")
    }
  }

  test("q56 gate query reports every bound check true") {
    val rows = AdvancedOps.sketches(spark, sf).collect()
    assert(rows.length == 3, s"expected 3 return flags, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getBoolean(3), s"hll_ok false for ${r.getString(0)}")
      assert(r.getBoolean(4), s"median_ok false for ${r.getString(0)}")
    }
  }
}
