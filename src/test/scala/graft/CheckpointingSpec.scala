package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Checkpointing.LineageSyntax

/** The checkpoint-strategy seam (r11 verdict #1): every iterative op's
  * lineage truncation routes through [[Checkpointing.truncate]], so a
  * cluster deployment flips `graft.checkpoint.mode=reliable` (plus a
  * checkpoint dir) and survives executor loss with ZERO code edits.
  * The conf-pinned InvarianceCheck A/B (`invariance_ckpt_sf1.json`)
  * proves reliable ≡ local bit-exact on the heavy iterative queries;
  * this spec pins the seam's mechanics.
  *
  * Ordering note: the refusal test must run FIRST — the reliable-dir
  * test lazily sets the context's checkpoint dir, after which "no dir
  * configured" is unreachable in this shared session.
  */
class CheckpointingSpec extends AnyFunSuite with SparkTestBase {

  private def df = {
    val s = spark
    import s.implicits._
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
  }

  test("reliable mode without a directory fails loudly; bad mode rejected") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "test-order invariant broken: checkpoint dir already set")
    spark.conf.set(Checkpointing.ModeKey, "reliable")
    try {
      val e = intercept[IllegalStateException](df.lineageCheckpoint())
      assert(e.getMessage.contains(Checkpointing.DirKey))
    } finally spark.conf.unset(Checkpointing.ModeKey)
    spark.conf.set(Checkpointing.ModeKey, "banana")
    try intercept[IllegalArgumentException](df.lineageCheckpoint())
    finally spark.conf.unset(Checkpointing.ModeKey)
  }

  test("local mode (default) truncates lineage eagerly") {
    spark.conf.unset(Checkpointing.ModeKey)
    val t = df.filter(col("id") > 10).lineageCheckpoint()
    // the returned plan is a scan of materialized blocks, not the filter
    assert(t.queryExecution.optimizedPlan.collectLeaves()
      .exists(_.getClass.getSimpleName.contains("LogicalRDD")))
    assert(t.count() == 90)
  }

  test("reliable mode writes RDD checkpoint files under graft.checkpoint.dir") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Checkpointing.ModeKey, "reliable")
    spark.conf.set(Checkpointing.DirKey, dir)
    try {
      val t = df.groupBy(col("v")).agg(sum("id").as("s")).lineageCheckpoint()
      assert(t.count() == 100)
      // the reliable form materialized to the configured directory
      def anyFile(p: java.io.File): Boolean = {
        val kids = Option(p.listFiles()).getOrElse(Array.empty)
        kids.exists(f => f.isFile || anyFile(f))
      }
      assert(anyFile(new java.io.File(dir)),
        s"no checkpoint files under $dir")
      // and the two modes agree on content
      spark.conf.set(Checkpointing.ModeKey, "local")
      val l = df.groupBy(col("v")).agg(sum("id").as("s")).lineageCheckpoint()
      assert(t.orderBy("v").collect().toSeq == l.orderBy("v").collect().toSeq)
    } finally {
      spark.conf.unset(Checkpointing.ModeKey)
      spark.conf.unset(Checkpointing.DirKey)
    }
  }
}
