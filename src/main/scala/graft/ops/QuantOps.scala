package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Product quantization over the `embeddings` table — the billion-scale
  * ANN path (Jégou, Douze & Schmid 2011) that completes the repo's ANN
  * family: q25 brute force (the truth), q26/q55 LSH buckets (prune WHO you
  * score), q37 IVF (prune WHERE you look) — and PQ, which compresses WHAT
  * you store: each vector becomes [[PqM]] small codes, and query-time
  * scoring reads only a Q×M×K lookup table plus the code columns, never
  * the raw floats.
  *
  * Scale shape — the reason PQ is THE memory-bound regime answer: the
  * codebooks are trained per 16-dim subspace with the q49 deterministic
  * k-means contract (init = first-K subvectors, fixed Lloyd rounds,
  * r4-rounded centroids), all on a unified (vec_id, subspace) frame — the
  * per-iteration shuffle is O(M·K·dim/M) = O(K·dim) regardless of corpus
  * size. Encoding is one broadcast of the M·K centroid rows against the
  * vector scan. ADC scoring touches the corpus only through the 4 integer
  * code columns: the per-query distance table (Q·M·K = 128 rows here) is
  * broadcast, and the pair scores are 4 broadcast equi-joins + 3 adds —
  * at 100 TB the scored frame is 16 bytes/vector instead of 256, an
  * in-memory scan where raw floats would spill, and the same codes serve
  * an IVF-PQ composition (q37's partition pruning on top).
  *
  * Engine parity: every arithmetic step mirrors the q49/q25 precedents —
  * subvector d2 in the ||e||² − 2e·c + ||c||² association, centroid
  * components r4-floored before round-2 distances, ADC summed in explicit
  * subspace order ((l0+l1)+l2)+l3, ranking on the r4'd ADC with n_id
  * tie-break. The oracle replays the identical unified-frame training.
  */
object QuantOps {

  /** Subspaces (Dim must divide evenly). */
  val PqM = 4

  /** Dims per subspace. */
  val PqSub: Int = Similarity.Dim / PqM

  /** Centroids per subspace codebook (8-bit codebooks at production scale;
    * 2 bits here so codes collide and ADC actually quantizes at gate SF).
    */
  val PqK = 4

  private val NQueries = Similarity.NQueries
  private val K = Similarity.K

  private def r4(c: Column) = Portable.r4(c)
  private def dot(a: Column, b: Column): Column = graft.functions.chess.vecDot(a, b)

  /** d2 between a subvector column and a centroid column — the q49 form. */
  private def d2(e: Column, c: Column): Column =
    dot(e, e) - lit(2.0) * dot(e, c) + dot(c, c)

  /** Unified (vec_id, s, subv) frame: M rows per vector. */
  private def subFrame(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), explode(array((0 until PqM).map { s =>
        struct(lit(s).as("s"), slice(col("emb"), s * PqSub + 1, PqSub).as("subv"))
      }: _*)).as("x"))
      .select(col("vec_id"), col("x.s").as("s"), col("x.subv").as("subv"))

  /** One Lloyd assignment round over the unified frame (argmin by (d2, c_id)). */
  private def assign(sub: DataFrame, cent: DataFrame): DataFrame =
    sub.join(broadcast(cent), Seq("s"))
      .select(col("vec_id"), col("s"), col("subv"), col("c_id"),
        d2(col("subv"), col("cv")).as("dd"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("dd"), col("c_id"))).as("best"),
        first(col("subv")).as("subv"))
      .select(col("vec_id"), col("s"), col("subv"), col("best.c_id").as("cluster"))

  /** Trained codebooks (s, c_id, cv): init from the first-[[PqK]] vectors'
    * subspace slices, one assign → r4-rounded recompute (the q49 2-round
    * contract; encoding is the second assignment).
    */
  private def codebooks(sub: DataFrame): DataFrame = {
    val c0 = sub.filter(col("vec_id") < PqK)
      .select(col("s"), col("vec_id").as("c_id"), col("subv").as("cv"))
    val a1 = assign(sub, c0)
    a1.select(col("s"), col("cluster"), posexplode(col("subv")).as(Seq("pos", "v")))
      .groupBy(col("s"), col("cluster"), col("pos")).agg(r4(avg(col("v"))).as("m"))
      .groupBy(col("s"), col("cluster"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col("s"), col("cluster").as("c_id"),
        transform(col("ps"), p => p.getField("m")).as("cv"))
  }

  /** q178: PQ-ADC top-k — train codebooks, encode the corpus to M code
    * columns, score the [[NQueries]] query vectors against the codes via
    * the per-query distance lookup table, rank by the r4'd ADC distance.
    */
  def annPq(spark: SparkSession, sfDir: String): DataFrame = {
    val sub = subFrame(spark, sfDir)
    val cb = codebooks(sub)

    // encode: second assignment against the trained books → wide code row
    val codeAggs = (0 until PqM).map(s =>
      max(when(col("s") === s, col("cluster"))).as(s"code_$s"))
    val codes = assign(sub, cb)
      .groupBy(col("vec_id"))
      .agg(codeAggs.head, codeAggs.tail: _*)

    // ADC lookup table: Q×M×K rows — distance from each query subvector to
    // each centroid
    val lut = sub.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("s"), col("subv"))
      .join(broadcast(cb), Seq("s"))
      .select(col("q_id"), col("s"), col("c_id"),
        d2(col("subv"), col("cv")).as("dd"))

    // pair scores: M broadcast equi-joins on (q_id, code_s); adds in fixed
    // subspace order
    var pairs = codes.join(
      broadcast(lut.filter(col("s") === 0)
        .select(col("q_id"), col("c_id").as("code_0"), col("dd").as("dd_0"))),
      Seq("code_0"))
    for (s <- 1 until PqM)
      pairs = pairs.join(
        broadcast(lut.filter(col("s") === s)
          .select(col("q_id"), col("c_id").as(s"code_$s"), col("dd").as(s"dd_$s"))),
        Seq("q_id", s"code_$s"))
    val adc = (1 until PqM).foldLeft(col("dd_0"))((acc, s) => acc + col(s"dd_$s"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").asc, col("n_id").asc)
    pairs.filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), r4(adc).as("adc"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("n_id"), col("adc"), col("rn"))
  }

  val annPqSql: String = {
    def sub16(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${PqSub + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"
    def d2Sql(e: String, c: String): String =
      s"(${sub16(e, e)} - 2.0 * ${sub16(e, c)} + ${sub16(c, c)})"
    val codeCols = (0 until PqM).map(s =>
      s"max(CASE WHEN s = $s THEN cluster END) AS code_$s").mkString(",\n       |         ")
    val lutJoins = (1 until PqM).map(s =>
      s"JOIN lut l$s ON l$s.q_id = l0.q_id AND l$s.s = $s AND l$s.c_id = e.code_$s")
      .mkString("\n       |  ")
    val adc = (1 until PqM).foldLeft("l0.dd")((acc, s) => s"($acc + l$s.dd)")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
       |           FROM embeddings),
       |sub AS (
       |  SELECT vec_id, s,
       |         list_transform(range(1, ${PqSub + 1}), i -> emb[s * $PqSub + i]) AS subv
       |  FROM e, (SELECT unnest(range(0, $PqM)) AS s) m),
       |c0 AS (SELECT s, vec_id AS c_id, subv AS cv FROM sub WHERE vec_id < $PqK),
       |a1 AS (
       |  SELECT vec_id, s, subv, c_id AS cluster FROM (
       |    SELECT sub.vec_id, sub.s, sub.subv, c.c_id,
       |           row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |             ORDER BY ${d2Sql("sub.subv", "c.cv")} ASC, c.c_id ASC) AS rn
       |    FROM sub JOIN c0 c USING (s)) WHERE rn = 1),
       |cb AS (
       |  SELECT s, cluster AS c_id, list(m ORDER BY pos) AS cv FROM (
       |    SELECT s, cluster, i AS pos, ${Portable.r4Sql("avg(subv[i])")} AS m
       |    FROM a1, (SELECT unnest(range(1, ${PqSub + 1})) AS i) r
       |    GROUP BY 1, 2, 3)
       |  GROUP BY 1, 2),
       |enc AS (
       |  SELECT vec_id, s, c_id AS cluster FROM (
       |    SELECT sub.vec_id, sub.s, c.c_id,
       |           row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |             ORDER BY ${d2Sql("sub.subv", "c.cv")} ASC, c.c_id ASC) AS rn
       |    FROM sub JOIN cb c USING (s)) WHERE rn = 1),
       |codes AS (
       |  SELECT vec_id,
       |         $codeCols
       |  FROM enc GROUP BY 1),
       |lut AS (
       |  SELECT q.vec_id AS q_id, c.s, c.c_id, ${d2Sql("q.subv", "c.cv")} AS dd
       |  FROM sub q JOIN cb c USING (s) WHERE q.vec_id < $NQueries),
       |pairs AS (
       |  SELECT l0.q_id, e.vec_id AS n_id, $adc AS adc
       |  FROM codes e
       |  JOIN lut l0 ON l0.s = 0 AND l0.c_id = e.code_0
       |  $lutJoins
       |  WHERE l0.q_id <> e.vec_id),
       |ranked AS (
       |  SELECT q_id, n_id, ${Portable.r4Sql("adc")} AS adc,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY ${Portable.r4Sql("adc")} ASC, n_id ASC) AS rn
       |  FROM pairs)
       |SELECT q_id, n_id, adc, rn::INT AS rn
       |FROM ranked WHERE rn <= $K""".stripMargin
  }
}
