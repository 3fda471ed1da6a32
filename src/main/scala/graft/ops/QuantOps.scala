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

  /** The trained artifact pair shared by q178 and the q180 composition:
    * (codes: one row per vector with M code columns; lut: Q×M×K per-query
    * centroid distances).
    */
  private[ops] def pqCodesAndLut(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame) = {
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
    (codes, lut)
  }

  /** q178: PQ-ADC top-k — train codebooks, encode the corpus to M code
    * columns, score the [[NQueries]] query vectors against the codes via
    * the per-query distance lookup table, rank by the r4'd ADC distance.
    */
  def annPq(spark: SparkSession, sfDir: String): DataFrame = {
    val (codes, lut) = pqCodesAndLut(spark, sfDir)

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

  private def sub16Sql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${PqSub + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"
  private def d2SubSql(e: String, c: String): String =
    s"(${sub16Sql(e, e)} - 2.0 * ${sub16Sql(e, c)} + ${sub16Sql(c, c)})"

  /** ADC sum over the M per-subspace lookups, fixed association order. */
  private def adcSumSql: String =
    (1 until PqM).foldLeft("l0.dd")((acc, s) => s"($acc + l$s.dd)")

  /** Shared oracle CTE prefix — training, encoding and the query lookup
    * table (everything q178 and the q180 composition have in common).
    */
  private[ops] val pqCoreSql: String = {
    val codeCols = (0 until PqM).map(s =>
      s"max(CASE WHEN s = $s THEN cluster END) AS code_$s").mkString(",\n       |         ")
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
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
       |             ORDER BY ${d2SubSql("sub.subv", "c.cv")} ASC, c.c_id ASC) AS rn
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
       |             ORDER BY ${d2SubSql("sub.subv", "c.cv")} ASC, c.c_id ASC) AS rn
       |    FROM sub JOIN cb c USING (s)) WHERE rn = 1),
       |codes AS (
       |  SELECT vec_id,
       |         $codeCols
       |  FROM enc GROUP BY 1),
       |lut AS (
       |  SELECT q.vec_id AS q_id, c.s, c.c_id, ${d2SubSql("q.subv", "c.cv")} AS dd
       |  FROM sub q JOIN cb c USING (s) WHERE q.vec_id < $NQueries)""".stripMargin
  }

  val annPqSql: String = {
    val lutJoins = (1 until PqM).map(s =>
      s"JOIN lut l$s ON l$s.q_id = l0.q_id AND l$s.s = $s AND l$s.c_id = e.code_$s")
      .mkString("\n       |  ")
    val adc = adcSumSql
    s"""WITH $pqCoreSql,
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

  // ------------------------------------------------- q180 IVF-PQ composition

  /** Coarse lists per query probe (shared with q37's IVF geometry). */
  val IvfCentroids: Int = ExtraOps.IvfCentroids
  val IvfProbes: Int = ExtraOps.IvfProbes

  /** q180: IVF-PQ — the production ANN shape (Faiss `IVFx,PQy` with
    * by-residual off): q37's inverted-file coarse quantizer prunes WHERE
    * to look (each query probes its [[IvfProbes]] nearest of
    * [[IvfCentroids]] cosine lists), and q178's product codes replace the
    * raw floats in the scoring of the surviving candidates.
    *
    * Scale shape — why this composition is what a 100 TB index actually
    * runs: the corpus is touched by (a) the coarse assignment (broadcast
    * of [[IvfCentroids]] rows + map-side argmax, shuffle-free), (b) the
    * PQ encode (broadcast M·K centroids), and (c) the candidate probe —
    * an equi-join on the coarse list id that moves only the probed lists.
    * The ADC scoring then reads nothing but the M code columns of those
    * candidates plus the broadcast Q×M×K lookup table: at production
    * geometry the per-query work is |probed lists| · 16 bytes/vector,
    * with neither the raw vectors nor the unprobed lists ever leaving
    * their partitions.
    *
    * Parity: coarse assignment/probing replay q37's exact r4'd-cosine
    * argmax (tie → lowest centroid id); candidate scoring replays q178's
    * ADC arithmetic; the oracle composes the same two proven CTE blocks.
    */
  def annIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    val (codes, lut) = pqCodesAndLut(spark, sfDir)

    val e = Tables.embeddings(spark, sfDir)
    val cent = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    def cos(a: Column, b: Column): Column =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

    // coarse assignment: argmax r4'd cosine over the broadcast centroids
    val assigned = e.join(broadcast(cent), col("vec_id") =!= lit(-1))
      .select(col("vec_id"), col("c_id"),
        r4(cos(col("embedding"), col("cv"))).as("c_cos"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("c_cos"), (-col("c_id")).as("neg_c"))).as("best"))
      .select(col("vec_id"), (-col("best.neg_c")).as("c_id"))

    // per-query probe lists: top-IvfProbes centroids by the same ordering
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("c_id").asc)
    val probed = q.join(broadcast(cent), col("q_id") =!= lit(-1))
      .select(col("q_id"), col("c_id"), r4(cos(col("qv"), col("cv"))).as("c_cos"))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= IvfProbes)
      .select(col("q_id"), col("c_id"))

    // candidates = members of the probed lists: the Q×IvfProbes probe frame
    // broadcasts by construction; the corpus side streams through the join
    val cand = broadcast(probed).join(assigned, Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id")).distinct()

    // ADC over the candidates only: M broadcast lookups on (q_id, code_s)
    var pairs = cand.join(codes, Seq("vec_id"))
    for (s <- 0 until PqM)
      pairs = pairs.join(
        broadcast(lut.filter(col("s") === s)
          .select(col("q_id"), col("c_id").as(s"code_$s"), col("dd").as(s"dd_$s"))),
        Seq("q_id", s"code_$s"))
    val adc = (1 until PqM).foldLeft(col("dd_0"))((acc, s) => acc + col(s"dd_$s"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").asc, col("n_id").asc)
    pairs.select(col("q_id"), col("vec_id").as("n_id"), r4(adc).as("adc"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("n_id"), col("adc"), col("rn"))
  }

  val annIvfPqSql: String = {
    val dotF = (a: String, b: String) => Portable.dotSql(a, b)
    val cosF = (a: String, b: String) =>
      s"${dotF(a, b)} / (sqrt(${dotF(a, a)}) * sqrt(${dotF(b, b)}))"
    val lutJoins = (0 until PqM).map(s =>
      s"JOIN lut l$s ON l$s.q_id = c.q_id AND l$s.s = $s AND l$s.c_id = e.code_$s")
      .mkString("\n       |  ")
    val adc = adcSumSql
    s"""WITH $pqCoreSql,
       |cent AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings
       |         WHERE vec_id < $IvfCentroids),
       |assigned AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT v.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY ${Portable.r4Sql(cosF("v.embedding", "c.cv"))} DESC,
       |                      c.c_id ASC) AS rn
       |    FROM embeddings v CROSS JOIN cent c) WHERE rn = 1),
       |probed AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT v.vec_id AS q_id, c.c_id,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY ${Portable.r4Sql(cosF("v.embedding", "c.cv"))} DESC,
       |                      c.c_id ASC) AS pr
       |    FROM embeddings v CROSS JOIN cent c
       |    WHERE v.vec_id < $NQueries) WHERE pr <= $IvfProbes),
       |cand AS (
       |  SELECT DISTINCT p.q_id, a.vec_id
       |  FROM probed p JOIN assigned a USING (c_id)
       |  WHERE p.q_id <> a.vec_id),
       |pairs AS (
       |  SELECT c.q_id, c.vec_id AS n_id, $adc AS adc
       |  FROM cand c
       |  JOIN codes e ON e.vec_id = c.vec_id
       |  $lutJoins),
       |ranked AS (
       |  SELECT q_id, n_id, ${Portable.r4Sql("adc")} AS adc,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY ${Portable.r4Sql("adc")} ASC, n_id ASC) AS rn
       |  FROM pairs)
       |SELECT q_id, n_id, adc, rn::INT AS rn
       |FROM ranked WHERE rn <= $K""".stripMargin
  }
}
