package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.Checkpointing.LineageSyntax
import graft.ops.MultimodalOps

/** A/B for the q125 shared-hashed-frame refactor on DECODE-SHAPED
  * payloads (r10 verdict follow-up): the r10 claim — localCheckpointing
  * the (media_id, chunks) frame lets the density probe AND the banding
  * read ONE payload pass — was only measured on the synthetic text
  * corpus, where payloads are ~KB and hashing is ~free, so the A/B read
  * as parity. This tool generates a corpus of MULTI-MB binary payloads
  * (the shape of a real image/video table, where the per-row
  * decode/hash pass dominates end-to-end cost) and measures:
  *
  *  - `two_pass_s`: adaptive-arity probe over a FRESH hashed frame +
  *    banding/verify over ANOTHER fresh hashed frame — every consumer
  *    re-scans and re-hashes the payload bytes (the pre-r10 shape);
  *  - `one_pass_s`: probe + banding/verify sharing ONE
  *    localCheckpointed hashed frame (the shipped q125 shape).
  *
  * Payloads are deterministic per media_id (seeded PRNG), written to
  * parquet first so each "pass" is a real columnar scan of the payload
  * bytes. Expected: one_pass ≈ half of two_pass when payload hashing
  * dominates; the measured ratio is the BASELINE.md record.
  *
  * `runMain graft.tools.PhashPayloadAB [nDocs] [mbPerDoc] [workDir]`
  * — defaults 256 docs × 4 MB = 1 GB.
  */
object PhashPayloadAB {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(256)
    val mb = args.lift(1).map(_.toInt).getOrElse(4)
    val work = args.lift(2).getOrElse(
      Files.createTempDirectory("phash_ab").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val bytesPerDoc = mb * 1024 * 1024
    val table = s"$work/media"
    spark.range(nDocs).as[Long]
      .mapPartitions(_.map { id =>
        val rnd = new java.util.Random(7000 + id)
        val b = new Array[Byte](bytesPerDoc)
        rnd.nextBytes(b)
        (id, b)
      })
      .toDF("media_id", "payload")
      .write.mode("overwrite").parquet(table)

    def hashedFresh() = spark.read.parquet(table)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        MultimodalOps.MediaHash(id, MultimodalOps.phashChunks(p))
      })
      .toDF()

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def runPairs(hashed: org.apache.spark.sql.DataFrame, arity: Int): Long =
      MultimodalOps.candidatesFromHashed(hashed, arity).count()

    // warmup scan (page cache parity between the two arms)
    spark.read.parquet(table).count()

    // A: two-pass — probe and banding each hash the payloads
    def twoPassRun(): Double = time {
      val arity = MultimodalOps.arityFromHashed(hashedFresh())
      runPairs(hashedFresh(), arity)
    }._2
    // B: one-pass — probe and banding share one checkpointed hash frame
    def onePassRun(): Double = time {
      val h = hashedFresh().lineageCheckpoint()
      val arity = MultimodalOps.arityFromHashed(h)
      val n = runPairs(h, arity)
      h.unpersist()
      n
    }._2
    // interleave A,B,A,B and take each arm's min: the first A pays the
    // hash kernel's JIT compilation for both arms, which otherwise
    // inflates the ratio well past the structural 2×
    val a1 = twoPassRun(); val b1 = onePassRun()
    val a2 = twoPassRun(); val b2 = onePassRun()
    val twoPass = math.min(a1, a2)
    val onePass = math.min(b1, b2)
    val json =
      s"""{"metric":"phash_payload_ab","n_docs":$nDocs,"mb_per_doc":$mb,""" +
      s""""two_pass_s":${"%.2f".formatLocal(java.util.Locale.ROOT, twoPass)},""" +
      s""""one_pass_s":${"%.2f".formatLocal(java.util.Locale.ROOT, onePass)},""" +
      s""""speedup":${"%.2f".formatLocal(java.util.Locale.ROOT, twoPass / onePass)}}"""
    spark.stop()
    println(json)
  }
}
