package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{QuantOps, Similarity}

/** q178 PQ-ADC properties the oracle hash match cannot express.
  *
  * What PQ promises is bounded DISTANCE DISTORTION, not top-k recall: on
  * the synthetic i.i.d. embeddings there is no neighbor structure for any
  * quantized score to recover (the q26 LSH recall floor survives because
  * LSH re-scores candidates with EXACT cosine; PQ replaces the score
  * itself). So the audit here is the one a PQ deployment actually runs:
  * does the quantized ranking place its picks far into the true-distance
  * head, and does ADC track the true distance at all?
  */
class QuantOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.chess.vecDot(a, b)

  private lazy val truth = {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") < Similarity.NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("qv"))
    broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), col("emb")) +
          dot(col("emb"), col("emb"))).as("d2_true"))
  }

  test("PQ picks land far into the true-distance head (beats chance 2x+)") {
    val n = Tables.embeddings(spark, sf).count()
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2_true").asc, col("n_id").asc)
    val ranked = truth.withColumn("true_rank", row_number().over(w))
    val meanRank = QuantOps.annPq(spark, sf)
      .join(ranked, Seq("q_id", "n_id"))
      .agg(avg(col("true_rank"))).collect()(0).getDouble(0)
    val chance = (n - 1) / 2.0
    // measured 113 vs chance 249.5 with the 2-bit codebooks; floor at half
    // of chance so codebook jitter cannot flake the suite
    assert(meanRank < chance / 2.0,
      s"mean true rank of PQ top-k = $meanRank, chance = $chance")
  }

  test("ADC correlates with the true distance on the selected pairs") {
    val c = QuantOps.annPq(spark, sf).join(truth, Seq("q_id", "n_id"))
      .agg(corr(col("adc"), col("d2_true"))).collect()(0).getDouble(0)
    // measured ≈ 0.48; assert a conservative positive floor
    assert(c > 0.2, s"ADC vs true-d2 correlation = $c")
  }

  test("every query returns a full top-k (encoding covered the corpus)") {
    val perQ = QuantOps.annPq(spark, sf)
      .groupBy(col("q_id")).agg(count(lit(1)).as("n")).collect()
    assert(perQ.length == Similarity.NQueries)
    perQ.foreach(r => assert(r.getAs[Long]("n") == Similarity.K.toLong))
  }

  test("q180 IVF-PQ scores candidates with exactly the q178 ADC") {
    // a pair surfaced by both operators must carry the identical quantized
    // distance — the composition changes WHO is scored, never the score
    val pq = QuantOps.annPq(spark, sf)
      .select(col("q_id"), col("n_id"), col("adc").as("adc_pq"))
    val ivf = QuantOps.annIvfPq(spark, sf)
      .select(col("q_id"), col("n_id"), col("adc").as("adc_ivf"))
    val both = pq.join(ivf, Seq("q_id", "n_id")).collect()
    assert(both.nonEmpty, "operators share no pairs — composition broken")
    both.foreach(r =>
      assert(r.getAs[Double]("adc_pq") == r.getAs[Double]("adc_ivf")))
  }

  test("q180 probing retains a useful share of the unpruned PQ picks") {
    val pq = QuantOps.annPq(spark, sf).select(col("q_id"), col("n_id"))
    val ivf = QuantOps.annIvfPq(spark, sf).select(col("q_id"), col("n_id"))
    val nPq = pq.count()
    val shared = pq.join(ivf, Seq("q_id", "n_id")).count()
    // probing 2/16 lists ≈ 12.5% of the corpus; retaining well above that
    // share of the full-scan picks is the locality the inverted file buys
    assert(shared.toDouble / nPq > 0.15,
      s"IVF pruning kept only $shared/$nPq of the PQ picks")
  }

  test("q180 per-query results are capped at k with contiguous ranks") {
    val rows = QuantOps.annIvfPq(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Int]("rn")).sorted
      assert(ranks.length <= Similarity.K, s"query $q returned ${ranks.length} rows")
      assert(ranks.sameElements(1 to ranks.length), s"query $q ranks not contiguous")
    }
  }
}
