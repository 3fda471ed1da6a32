package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AutoRangeCumSum

class AutoRangeSpec extends AnyFunSuite with SparkTestBase {

  // count on the OPTIMIZED logical plan (the plane the rule acts on and
  // the one PlanSpec's suite-wide assertion reads — the physical plan
  // hides children under AdaptiveSparkPlanExec until execution)
  private def partitionlessWindows(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }.size

  private def windows(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size

  private def withConf[T](bucket: Option[String])(body: => T): T = {
    bucket match {
      case Some(b) => spark.conf.set(AutoRangeCumSum.BucketKey, b)
      case None => spark.conf.unset(AutoRangeCumSum.BucketKey)
    }
    try body finally spark.conf.unset(AutoRangeCumSum.BucketKey)
  }

  test("rewrites the partition-less running sum and preserves every row") {
    val s = spark
    import s.implicits._
    // sparse, negative, and dense keys; a NULL value row (sum skips it)
    val rows = Seq((-7L, Some(3L)), (1L, Some(10L)), (2L, None),
      (5L, Some(7L)), (63L, Some(1L)), (64L, Some(2L)), (1000L, Some(4L)))
    val df = rows.toDF("k", "v")
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q = df.withColumn("cum", sum(col("v")).over(w))
      .withColumn("cumk", sum(col("k")).over(w))
    val off = withConf(None) {
      val r = q.collect().map(r2 =>
        (r2.getLong(0), r2.getLong(2), r2.getLong(3))).toSet
      assert(partitionlessWindows(q) == 1, "control: the naive plan")
      r
    }
    withConf(Some("16")) {
      assert(partitionlessWindows(q) == 0,
        "the rule must remove the partition-less window")
      assert(q.collect().map(r2 =>
        (r2.getLong(0), r2.getLong(2), r2.getLong(3))).toSet == off,
        "rewritten results must be row-identical")
    }
  }

  test("NULL keys keep the window form's nulls-first prefix semantics") {
    val s = spark
    import s.implicits._
    // a NULL-key row heads the running sum under ASC NULLS FIRST; its
    // value must flow into every later prefix (the silent-undercount
    // hazard if NULL rangeIds fell out of the offsets join). ONE null
    // row on purpose: several would tie, and intra-tie prefix values are
    // nondeterministic in the window form itself.
    val df = Seq((Option.empty[Long], 150L), (Some(1L), 1L),
      (Some(70L), 2L), (Some(200L), 3L)).toDF("k", "v")
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q = df.withColumn("cum", sum(col("v")).over(w))
    val off = withConf(None)(q.collect()
      .map(r => (Option(r.get(0)), r.getLong(2))).toSet)
    withConf(Some("64")) {
      assert(partitionlessWindows(q) == 0)
      val on = q.collect().map(r => (Option(r.get(0)), r.getLong(2))).toSet
      assert(on == off, s"null-key prefix mismatch: $on vs $off")
      // concretely: every non-null row's cum includes the 150 null mass
      assert(on.filter(_._1.isDefined).forall(_._2 > 150L))
    }
  }

  test("downstream operators over the rewritten column still work") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "v")
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q = df.withColumn("cum", sum(col("v")).over(w))
      .filter(col("cum") > 100L)
      .groupBy((col("k") % 10L).as("b")).agg(max(col("cum")).as("m"))
    val off = withConf(None)(q.collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet)
    withConf(Some("64")) {
      assert(partitionlessWindows(q) == 0)
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == off)
    }
  }

  test("non-matching windows are left untouched") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L, "a"), (2L, 3L, "b"), (3L, 4L, "a")).toDF("k", "v", "g")
    val run = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withConf(Some("16")) {
      // avg (not sum) — no rewrite claimed
      val avgQ = df.withColumn("a", avg(col("v")).over(run))
      assert(partitionlessWindows(avgQ) == 1)
      // descending order — no rewrite
      val descW = Window.orderBy(col("k").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val descQ = df.withColumn("c", sum(col("v")).over(descW))
      assert(partitionlessWindows(descQ) == 1)
      // already partitioned — not this rule's business
      val partW = Window.partitionBy(col("g")).orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val partQ = df.withColumn("c", sum(col("v")).over(partW))
      assert(partitionlessWindows(partQ) == 0)
      assert(windows(partQ) == 1, "partitioned window survives")
      // mixed sum + row_number in ONE window node — all-or-nothing guard
      val mixQ = df.withColumn("c", sum(col("v")).over(run))
        .withColumn("r", row_number().over(Window.orderBy(col("k"))))
      assert(mixQ.collect().length == 3)
    }
  }

  test("matches the ranged-form oracle on the events table") {
    // same frame the q174/q172 recoveries are proven on: unique event ids
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id").as("k"),
        floor(col("value") * 100).cast("long").as("v"))
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q = ev.withColumn("cum", sum(col("v")).over(w))
    val off = withConf(None)(q.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet)
    withConf(Some("4096")) {
      assert(partitionlessWindows(q) == 0)
      assert(q.collect().map(r => (r.getLong(0), r.getLong(2))).toSet == off)
    }
  }
}
