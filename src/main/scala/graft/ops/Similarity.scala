package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float> ×64, label).
  *
  * Three operators:
  *  - [[knnBrute]] (q25): exact top-k cosine for a small query set —
  *    broadcast the queries, one narrow pass over all vectors, per-query
  *    top-k. The baseline every ANN variant is judged against.
  *  - [[annLsh]] (q26): random-hyperplane LSH — vectors bucketed by the sign
  *    pattern of 8 fixed hyperplanes; a query only scores its own bucket.
  *    At 100 TB the bucket equi-join replaces the brute-force scan: work
  *    drops from O(Q·N) to O(Q·N/2^bits) expected, and the join is a plain
  *    shuffle-hash on bucket id. Recall vs brute force is asserted in
  *    SimilaritySpec.
  *  - [[cosineNearDup]] (q27): embedding near-duplicate pairs — all-pairs
  *    WITHIN buckets only (a<b), verified by exact cosine ≥ τ; the
  *    embedding-space analog of MinHash-LSH dedup.
  *
  * Engine portability: hyperplane components are deterministic literals
  * computed once in Scala (md5-derived, in [-1,1)) and inlined into both the
  * Spark plan and the oracle SQL; all float math is widened to double before
  * any arithmetic, summed in list order, and floor-rounded to 4 decimals.
  */
object Similarity {

  val Dim = 64
  val K = 3
  val NQueries = 8
  val LshBits = 8
  /** The synthetic embeddings are i.i.d. random (max pairwise cosine ≈ 0.48
    * at sf0.001), so the "near-dup" threshold is set where the data actually
    * has tail mass; on a real corpus this would be ~0.9+.
    */
  val NearDupThreshold = 0.35

  /** Deterministic pseudo-random hyperplanes: component d of plane i derives
    * from md5("hp_<i>_<d>") — same values recomputable anywhere.
    */
  val Hyperplanes: Seq[Seq[Double]] = (0 until LshBits).map { i =>
    (0 until Dim).map { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hp_${i}_$d".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val v = java.lang.Long.parseLong(hex, 16)
      (v % 2001L - 1000L) / 1000.0
    }
  }

  private def r4(c: Column): Column = Portable.r4(c)

  /** Σ aᵢ·bᵢ in list order, all-double. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Dot against a literal hyperplane (element_at is 1-based). */
  private def dotLit(v: Column, plane: Seq[Double]): Column =
    plane.zipWithIndex.map { case (p, d) =>
      element_at(v, d + 1).cast("double") * lit(p)
    }.reduce(_ + _)

  /** LSH bucket id: sign-bit pattern over the fixed hyperplanes. */
  private def bucket(v: Column): Column =
    Hyperplanes.zipWithIndex.map { case (plane, i) =>
      when(dotLit(v, plane) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** q25: exact brute-force top-k cosine neighbors for queries vec_id < 8. */
  def knnBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val scored = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(
        col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qv"), col("embedding")) /
          (norm(col("qv")) * norm(col("embedding")))).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("n_id"), col("score"), col("rn"))
  }

  /** q26: ANN via hyperplane-LSH buckets — queries only score candidates in
    * their own bucket (equi-join on bucket id), then exact cosine + top-k.
    */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bkt"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("bkt"))
    val scored = q.join(e, Seq("bkt"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(
        col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qv"), col("embedding")) /
          (norm(col("qv")) * norm(col("embedding")))).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("n_id"), col("score"), col("rn"))
  }

  /** q27: embedding near-dup pairs — within-bucket pairs (a<b) verified by
    * exact cosine ≥ τ.
    */
  def cosineNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bkt"))
    // pairs-within-buckets (no exchange reuse across self-joins — see
    // Dedup.ngramJaccard): one bucket computation, ordered pairs from each
    // bucket's postings list
    val pairs = e
      .groupBy(col("bkt"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("vs"))
      .filter(size(col("vs")) > 1)
      .select(explode(col("vs")).as("a"), col("vs"))
      .select(col("a.vec_id").as("id_a"), col("a.embedding").as("ea"),
        explode(filter(col("vs"), v => v.getField("vec_id") > col("a.vec_id"))).as("b"))
      .select(
        col("id_a"), col("b.vec_id").as("id_b"),
        r4(dot(col("ea"), col("b.embedding")) /
          (norm(col("ea")) * norm(col("b.embedding")))).as("score"))
    pairs.filter(col("score") >= NearDupThreshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  // ---- generated oracle SQL ----

  private def r4Sql(x: String) = Portable.r4Sql(x)

  /** Σ aᵢ·bᵢ in index order (double). */
  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  private def dotLitSql(v: String, plane: Seq[Double]): String =
    plane.zipWithIndex.map { case (p, d) => s"$v[${d + 1}]::DOUBLE * ($p)" }
      .mkString(" + ")

  private def bucketSql(v: String): String =
    Hyperplanes.zipWithIndex.map { case (plane, i) =>
      s"(CASE WHEN ${dotLitSql(v, plane)} > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")::BIGINT")

  val knnBruteSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT q.q_id, e.vec_id AS n_id,
       |         ${dotSql("q.qv", "e.embedding")} /
       |         (sqrt(${dotSql("q.qv", "q.qv")}) * sqrt(${dotSql("e.embedding", "e.embedding")})) AS cos
       |  FROM q JOIN embeddings e ON q.q_id <> e.vec_id),
       |ranked AS (
       |  SELECT q_id, n_id, ${r4Sql("cos")} AS score,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY ${r4Sql("cos")} DESC, n_id ASC) AS rn
       |  FROM scored)
       |SELECT q_id, n_id, score, rn::INT AS rn
       |FROM ranked WHERE rn <= $K""".stripMargin

  val annLshSql: String =
    s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bkt FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, bkt FROM b WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT q.q_id, e.vec_id AS n_id,
       |         ${dotSql("q.qv", "e.embedding")} /
       |         (sqrt(${dotSql("q.qv", "q.qv")}) * sqrt(${dotSql("e.embedding", "e.embedding")})) AS cos
       |  FROM q JOIN b e USING (bkt) WHERE q.q_id <> e.vec_id),
       |ranked AS (
       |  SELECT q_id, n_id, ${r4Sql("cos")} AS score,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY ${r4Sql("cos")} DESC, n_id ASC) AS rn
       |  FROM scored)
       |SELECT q_id, n_id, score, rn::INT AS rn
       |FROM ranked WHERE rn <= $K""".stripMargin

  val cosineNearDupSql: String =
    s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bkt FROM embeddings),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
       |         ${dotSql("a.embedding", "b2.embedding")} /
       |         (sqrt(${dotSql("a.embedding", "a.embedding")}) *
       |          sqrt(${dotSql("b2.embedding", "b2.embedding")})) AS cos
       |  FROM b a JOIN b b2 ON a.bkt = b2.bkt AND a.vec_id < b2.vec_id)
       |SELECT id_a, id_b, ${r4Sql("cos")} AS score
       |FROM pairs WHERE ${r4Sql("cos")} >= $NearDupThreshold""".stripMargin
}
