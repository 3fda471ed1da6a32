package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Checkpointing.LineageSyntax
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

  val Dim: Int = graft.functions.PortableHash.Dim
  val K = 3
  val NQueries = 8
  val LshBits: Int = graft.functions.PortableHash.LshBits
  /** The synthetic embeddings are i.i.d. random (max pairwise cosine ≈ 0.48
    * at sf0.001), so the "near-dup" threshold is set where the data actually
    * has tail mass; on a real corpus this would be ~0.9+.
    */
  val NearDupThreshold = 0.35

  /** Deterministic pseudo-random hyperplanes: component d of plane i derives
    * from md5("hp_<i>_<d>") — same values recomputable anywhere. Defined
    * next to the native HyperplaneBucket expression (graft.functions) so the
    * Spark plan and the inlined oracle-SQL literals share one array.
    */
  val Hyperplanes: Seq[Seq[Double]] =
    graft.functions.PortableHash.Hyperplanes.toSeq.map(_.toSeq)

  private def r4(c: Column): Column = Portable.r4(c)

  /** Σ aᵢ·bᵢ in list order, all-double — native codegen'd VecDot expression
    * (graft.functions): the interpreted aggregate(zip_with(…)) HOF form paid
    * per-element Catalyst eval ×3 dots per pair (score + both norms);
    * compiled loop + precomputed norms cut q25/q26 ≈ 3× at sf0.1.
    */
  private def dot(a: Column, b: Column): Column = graft.functions.chess.vecDot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** LSH bucket id: sign-bit pattern over the fixed hyperplanes — native
    * HyperplaneBucket expression. The previous literal element_at chain
    * (8×64 multiply-adds + CASEs) generated a ~4600-node tree whose janino
    * compile time dominated q26/q27 at bench scale.
    */
  private def bucket(v: Column): Column = graft.functions.chess.hyperplaneBucket(v)

  /** q25: exact brute-force top-k cosine neighbors for queries vec_id < 8.
    * Norms are computed once per vector before the pair fan-out, not per
    * pair.
    */
  def knnBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val scored = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(
        col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qv"), col("embedding")) /
          (col("qn") * col("nrm"))).as("score"))
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
      .select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bkt"),
        norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("bkt"),
        col("nrm").as("qn"))
    val scored = q.join(e, Seq("bkt"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(
        col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qv"), col("embedding")) /
          (col("qn") * col("nrm"))).as("score"))
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
      .select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bkt"),
        norm(col("embedding")).as("nrm"))
    // pairs-within-buckets (no exchange reuse across self-joins — see
    // Dedup.ngramJaccard): one bucket computation, ordered pairs from each
    // bucket's postings list; norms ride along in the struct
    val pairs = e
      .groupBy(col("bkt"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding"), col("nrm"))))
        .as("vs"))
      .filter(size(col("vs")) > 1)
      .select(posexplode(col("vs")).as(Seq("i", "a")), col("vs"))
      .select(col("a.vec_id").as("id_a"), col("a.embedding").as("ea"),
        col("a.nrm").as("na"),
        explode(slice(col("vs"), col("i") + 2, size(col("vs")))).as("b"))
      .select(
        col("id_a"), col("b.vec_id").as("id_b"),
        r4(dot(col("ea"), col("b.embedding")) /
          (col("na") * col("b.nrm"))).as("score"))
    pairs.filter(col("score") >= NearDupThreshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  // ---- generated oracle SQL ----

  private def r4Sql(x: String) = Portable.r4Sql(x)

  /** Σ aᵢ·bᵢ in index order (double) — shared oracle helper. */
  private def dotSql(a: String, b: String) = Portable.dotSql(a, b, Dim)

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

  /** q70: per-dimension corpus statistics over the embedding column — the
    * feature-normalization pass (mean/scale per dimension) every embedding
    * pipeline runs before training or quantizing. One posexplode + one hash
    * aggregation keyed by dimension index: shuffle volume O(dim × tasks)
    * after map-side combine, independent of row count. Variance via
    * E[x²]−E[x]² with both moments floor-rounded (sum order differs across
    * engines; r4 pins the comparison).
    */
  def embeddingStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("pos0", "x")))
      // dimensions past the contract width are ignored on BOTH engines (the
      // oracle's fixed range(1, Dim+1) never generates them); without this
      // filter a ragged over-long embedding would emit rows DuckDB cannot
      .filter(col("pos0") < Dim)
      .groupBy((col("pos0") + 1).as("pos"))
      .agg(
        Portable.r4(avg(col("x"))).as("mean"),
        Portable.r4(avg(col("x") * col("x"))).as("mean_sq"),
        // count non-null VALUES (avg skips them; counting exploded rows
        // would diverge from the oracle's count(emb[i]) on NULL elements)
        count(col("x")).as("n"))
      // a position that is NULL in every vector has no stats on either
      // engine (mirrors the oracle's HAVING)
      .filter(col("n") > 0)

  /** `count(emb[i])`, not `count(*)`: a too-short embedding yields NULL at
    * the missing positions, which avg skips and the non-null count skips
    * with it — matching Spark's posexplode, which never emits those rows.
    */
  val embeddingStatsSql: String =
    s"""SELECT i::INT AS pos,
       |  ${Portable.r4Sql("avg(emb[i])")} AS mean,
       |  ${Portable.r4Sql("avg(emb[i] * emb[i])")} AS mean_sq,
       |  count(emb[i]) AS n
       |FROM (SELECT list_transform(embedding, x -> x::DOUBLE) AS emb FROM embeddings),
       |     range(1, ${Dim + 1}) r(i)
       |GROUP BY 1 HAVING count(emb[i]) > 0""".stripMargin

  /** q73: symmetric int8 quantization of the embedding column — the 4×
    * memory/bandwidth reduction an ANN serving index applies before
    * shipping vectors. Per-vector scale = floor-rounded max |x| (rounded on
    * BOTH engines so the division parity is exact); code = round(x/scale·
    * 127) clamped to [-127, 127]; zero vectors quantize to all-zero codes.
    * One narrow map over the table; the gate emits the per-vector scale and
    * code aggregates (sum/min/max) — a full-codes equality compressed to
    * three integers per vector.
    *
    * The scale column is materialized by a SELECT before the code lambda
    * captures it: a lambda capturing the whole max-abs expression would
    * re-evaluate it per element (the measured 30× HOF trap).
    */
  def quantizeInt8(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = col("embedding").cast("array<double>")
    val scaled = Tables.embeddings(spark, sfDir).select(
      col("vec_id"), emb.as("emb"),
      r4(array_max(transform(emb, x => abs(x)))).as("scale"))
    val code = (x: Column) => coalesce(
      greatest(lit(-127L), least(lit(127L),
        floor(x / nullif(col("scale"), lit(0.0)) * 127 + 0.5).cast("long"))),
      lit(0L))
    // materialize the codes array ONCE — aggregating over three separate
    // transform(...) copies would quantize every vector three times (and
    // CollapseProject would happily inline a repeated alias of a cheap
    // expression; a HOF is not cheap, so this projection survives)
    scaled.select(col("vec_id"), col("scale"),
        transform(col("emb"), code).as("codes"))
      .select(
        col("vec_id"), col("scale"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        array_min(col("codes")).as("code_min"),
        array_max(col("codes")).as("code_max"))
  }

  val quantizeInt8Sql: String = {
    val codes = "list_transform(emb, x -> coalesce(greatest(-127, " +
      "least(127, floor(x / nullif(scale, 0) * 127 + 0.5)::BIGINT)), 0))"
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
       |           FROM embeddings),
       |s AS (SELECT vec_id, emb,
       |             ${r4Sql("list_max(list_transform(emb, x -> abs(x)))")} AS scale
       |      FROM e),
       |c AS (SELECT vec_id, scale, $codes AS codes FROM s)
       |SELECT vec_id, scale,
       |       coalesce(list_sum(codes), 0)::BIGINT AS code_sum,
       |       list_min(codes)::BIGINT AS code_min,
       |       list_max(codes)::BIGINT AS code_max
       |FROM c""".stripMargin
  }

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

  // -------------------------------------------- q111 embedding covariance

  /** Leading dimensions covered by the covariance estimate (full 64×64
    * would be 2080 aggregate columns; the leading block demonstrates the
    * pattern at report size) and the fixed-point scale for element
    * quantization.
    */
  val CovDim = 8
  val CovScale = 1000000L

  /** q111: embedding covariance block — Σ-free exact estimation of
    * cov(xᵢ, xⱼ) for the leading [[CovDim]] dimensions, the statistic a
    * whitening/PCA pass (or an embedding-drift monitor) aggregates over
    * the corpus. ONE aggregation computes every moment: n, per-dim sums,
    * and all i≤j cross-products; one row per (i, j) is then unpivoted out
    * of the single result row (the q76 profile shape).
    *
    * Parity: a float sum over an unordered corpus is summation-order-
    * dependent, so each element is floor-quantized to integer
    * [[CovScale]]-units FIRST; sums of integers are exact and associative
    * on both engines (cross-products accumulate in decimal(38,0) —
    * Spark's BIGINT sum would overflow past ~5·10⁵ rows; DuckDB's native
    * HUGEINT sum is already exact), and the covariance is assembled from
    * the exact moments with one r4 at the end. Scale shape: map-side
    * combinable single agg, no shuffle beyond the 1-row combine; output
    * is CovDim·(CovDim+1)/2 rows at any corpus size.
    */
  def embeddingCovariance(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = col("embedding")
    def q(i: Int): Column =
      floor(emb.getItem(i).cast("double") * CovScale + 0.5).cast("long")
    val quantized = Tables.embeddings(spark, sfDir)
      .select(col("vec_id") +: (0 until CovDim).map(i => q(i).as(s"q$i")): _*)
    val pairs = for { i <- 0 until CovDim; j <- i until CovDim } yield (i, j)
    val aggs =
      count(lit(1)).as("_n") +:
      ((0 until CovDim).map(i => sum(col(s"q$i")).as(s"s$i")) ++
        pairs.map { case (i, j) =>
          sum((col(s"q$i") * col(s"q$j")).cast("decimal(38,0)")).as(s"p${i}_$j")
        })
    val one = quantized.agg(aggs.head, aggs.tail: _*)
    val n = col("_n").cast("double")
    val rows = pairs.map { case (i, j) =>
      struct(
        lit(i).as("i"), lit(j).as("j"),
        Portable.r4(
          (col(s"p${i}_$j").cast("double") / n -
            (col(s"s$i").cast("double") / n) * (col(s"s$j").cast("double") / n))
            / (CovScale.toDouble * CovScale.toDouble)).as("cov"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.i").as("i"), col("r.j").as("j"), col("r.cov").as("cov"))
  }

  // ---------------------------------------------- q115 semantic dedup

  /** Centroid count for the semantic-dedup clustering stage. At this SF a
    * handful of fixed centroids suffices; a production run sizes K ∝ N so
    * expected cluster size stays constant (the SemDeDup regime, ~N/1000),
    * which is what keeps the within-cluster stage sub-quadratic — the knob
    * is data, not code.
    */
  val SemClusters = 8

  /** Session-conf key selecting q115's cluster count K — the SemDeDup
    * data knob made a MEASURED conf (the q125/Ndv discipline, after the
    * r6 sf2.5 refresh measured q115 at 4.0× for ×2.5 data under the
    * fixed gate geometry): block population ~ N/(K·2^bits), so K ∝ N
    * keeps the within-block pair stage flat. Default = [[SemClusters]]
    * (the oracle-mirrored gate geometry; the conf is the scale path).
    * Read at plan-construction time; swept by ModeBench (wall +
    * candidate volume per K, committed in `modebench.json`).
    *
    * ORACLE CAVEAT: the committed [[semanticDedupSql]] mirrors the
    * DEFAULT K only (object-init string, gate runs with the conf unset).
    * A conf-tuned session must not be hash-compared against it — the
    * knob changes the blocking geometry, which is exactly the point.
    */
  val SemClustersKey = "graft.semdedup.k"

  def semClusters(spark: SparkSession): Int = {
    val k = spark.conf.getOption(SemClustersKey).map(_.toInt)
      .getOrElse(SemClusters)
    require(k >= 1 && k <= 65536, s"$SemClustersKey must be in [1, 65536]; got $k")
    k
  }

  /** Cosine at/above which two co-clustered, co-bucketed vectors are
    * semantic duplicates (same corpus-calibrated level as
    * [[NearDupThreshold]] — the synthetic embeddings are i.i.d.).
    */
  val SemThreshold = 0.35

  /** q115: SemDeDup-style semantic deduplication — cluster the corpus,
    * prune near-duplicate pairs WITHIN clusters, keep the lowest-id member
    * of each duplicate pair (first-wins, the same keep rule as the q22/q63
    * lexical dedups). Emits the full keep-list: one row per vector with its
    * cluster and a kept/dropped flag, which is the artifact a curation
    * pipeline joins back onto the corpus.
    *
    * Scale shape — two-level blocking: (1) nearest-centroid assignment is a
    * broadcast of K centroid rows + one argmax aggregation (no fact
    * shuffle beyond the groupBy on vec_id); (2) candidate pairs form only
    * within (cluster, LSH-bucket) blocks via the sorted-postings
    * posexplode+slice idiom with the family-wide [[Dedup.MaxPostings]]
    * cap. The sub-bucket matters: cluster populations grow O(N/K), so
    * pairing inside raw clusters is quadratic-in-cluster-size; the
    * 2^[[LshBits]] hyperplane split bounds the block population
    * independently of K (at 100 TB you'd widen bits, and the pair stage
    * stays flat). Every join is an equi-join; nothing is all-pairs.
    * K itself is a session conf since r6 ([[SemClustersKey]] — the
    * measured mitigation for the 4.0× sf2.5 growth under the fixed gate
    * geometry; ModeBench sweeps it with candidate-volume probes).
    *
    * Parity: assignment and pair cosines are r4-floor-rounded before any
    * comparison; ties in assignment break to the lowest centroid id on
    * both engines.
    */
  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = semAssigned(spark, sfDir)
    // pairs within (cluster, bucket) blocks; first-wins drop set = every
    // id that appears as the larger side of a verified pair
    val dropped = assigned
      .groupBy(col("c_id"), col("bkt"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding"), col("nrm"))))
        .as("vs"))
      .filter(size(col("vs")).between(2, Dedup.MaxPostings))
      .select(posexplode(col("vs")).as(Seq("i", "a")), col("vs"))
      .select(col("a.embedding").as("ea"), col("a.nrm").as("na"),
        explode(slice(col("vs"), col("i") + 2, size(col("vs")))).as("b"))
      .filter(r4(dot(col("ea"), col("b.embedding")) /
        (col("na") * col("b.nrm"))) >= SemThreshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    assigned
      .join(dropped.withColumn("hit", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("c_id").cast("int").as("c_id"),
        col("hit").isNull.as("is_kept"))
  }

  /** The (vec_id, embedding, c_id, bkt, nrm) assignment frame shared by
    * [[semanticDedup]] and the candidate-volume probe, at the session's
    * [[semClusters]] K: broadcast K centroid rows, argmax r4(cos) with
    * lowest-c_id tie-break (the q37 assignment kernel).
    */
  private def semAssigned(spark: SparkSession, sfDir: String): DataFrame = {
    val k = semClusters(spark)
    val e = Tables.embeddings(spark, sfDir)
    val cent = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    def cos(a: Column, b: Column): Column =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    e.join(broadcast(cent), col("vec_id") =!= lit(-1))
      .select(col("vec_id"), col("embedding"), col("c_id"),
        r4(cos(col("embedding"), col("cv"))).as("c_cos"))
      .groupBy(col("vec_id"))
      .agg(
        max(struct(col("c_cos"), (-col("c_id")).as("neg_c"))).as("best"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), (-col("best.neg_c")).as("c_id"),
        bucket(col("embedding")).as("bkt"), norm(col("embedding")).as("nrm"))
  }

  /** Candidate pair volume (pre-verify, Σ C(block, 2) over capped blocks)
    * at the session's K — the ModeBench probe: candidate volume is what
    * grows when the block geometry saturates (the r6-measured q115 4.0×),
    * so it is published per-K next to wall, like the q125 arity sweep.
    */
  def semanticCandidateCount(spark: SparkSession, sfDir: String): Long = {
    val n = col("n")
    // sum n·(n−1) in integers and halve once on the driver (SQL `/` is
    // fractional; every term is even so the halving is exact)
    val r = semAssigned(spark, sfDir)
      .groupBy(col("c_id"), col("bkt")).agg(count(lit(1)).as("n"))
      .filter(n.between(2, Dedup.MaxPostings))
      .agg(sum(n * (n - 1))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0) / 2
  }

  val semanticDedupSql: String = {
    val cos = (a: String, b: String) =>
      s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    s"""WITH cent AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings
       |              WHERE vec_id < $SemClusters),
       |assigned AS (
       |  SELECT vec_id, embedding, c_id, ${bucketSql("embedding")} AS bkt FROM (
       |    SELECT e.vec_id, e.embedding, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${r4Sql(cos("e.embedding", "c.cv"))} DESC, c.c_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN cent c)
       |  WHERE rn = 1),
       |blocks AS (
       |  SELECT c_id, bkt, count(*) AS sz FROM assigned GROUP BY 1, 2
       |  HAVING count(*) BETWEEN 2 AND ${Dedup.MaxPostings}),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM assigned a
       |  JOIN assigned b ON a.c_id = b.c_id AND a.bkt = b.bkt
       |                 AND a.vec_id < b.vec_id
       |  JOIN blocks k ON a.c_id = k.c_id AND a.bkt = k.bkt
       |  WHERE ${r4Sql(cos("a.embedding", "b.embedding"))} >= $SemThreshold)
       |SELECT a.vec_id, a.c_id::INT AS c_id, d.vec_id IS NULL AS is_kept
       |FROM assigned a LEFT JOIN dropped d USING (vec_id)""".stripMargin
  }

  val embeddingCovarianceSql: String = {
    val pairs = for { i <- 0 until CovDim; j <- i until CovDim } yield (i, j)
    def q(i: Int) =
      s"floor(embedding[${i + 1}]::DOUBLE * $CovScale + 0.5)::BIGINT"
    val quantized = (0 until CovDim).map(i => s"${q(i)} AS q$i").mkString(", ")
    val moments =
      ("count(*) AS n" +:
        ((0 until CovDim).map(i => s"sum(q$i)::DOUBLE AS s$i") ++
          pairs.map { case (i, j) => s"sum(q$i * q$j)::DOUBLE AS p${i}_$j" }))
        .mkString(", ")
    val unions = pairs.map { case (i, j) =>
      // ONE division by CovScale² (exactly representable), mirroring the
      // Spark side — dividing by CovScale twice would differ by an ulp
      val cov = s"(p${i}_$j / n - (s$i / n) * (s$j / n)) / ${CovScale * CovScale}.0"
      s"SELECT $i AS i, $j AS j, ${r4Sql(cov)} AS cov FROM m"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT $quantized FROM embeddings),
       |m AS (SELECT $moments FROM e)
       |$unions""".stripMargin
  }

  // ------------------------------------------------- q138 ANN recall audit

  /** q138: ANN recall@k evaluation — per query, how many of the exact
    * brute-force top-k (q25) the LSH index (q26) actually returned. Every
    * ANN deployment needs this measured, not assumed: it is the number that
    * justifies replacing the O(Q·N) scan with the bucketed index, and the
    * number you re-check after re-drawing hyperplanes or changing bit
    * width. SimilaritySpec asserts a recall floor; this operator publishes
    * the per-query audit as data.
    *
    * Scale shape: composes the two audited operators and adds one
    * equi-join on (q_id, n_id) plus two Q-row aggregations — the adder is
    * negligible next to the brute-force baseline it evaluates (which is
    * the point: you compute recall on a SAMPLE of queries at 100 TB, and Q
    * here is exactly that bounded query sample).
    *
    * Parity: both inputs are independently hash-matched against the same
    * SQL used here as CTEs; ties at the k-th rank break on (score DESC,
    * n_id ASC) identically, so the joined hit sets agree row-for-row.
    */
  def annRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = knnBrute(spark, sfDir).select(col("q_id"), col("n_id"))
    val ann = annLsh(spark, sfDir).select(col("q_id"), col("n_id"))
    val hits = truth.join(ann, Seq("q_id", "n_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    truth.groupBy(col("q_id")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("q_id"), "left")
      .select(
        col("q_id"), col("n_true"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        r4(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_true").cast("double")).as("recall"))
  }

  val annRecallSql: String =
    s"""WITH truth AS (SELECT q_id, n_id FROM ($knnBruteSql)),
       |ann AS (SELECT q_id, n_id FROM ($annLshSql)),
       |hits AS (
       |  SELECT q_id, count(*) AS n_hit
       |  FROM truth JOIN ann USING (q_id, n_id) GROUP BY 1),
       |tot AS (SELECT q_id, count(*) AS n_true FROM truth GROUP BY 1)
       |SELECT t.q_id, t.n_true,
       |       coalesce(h.n_hit, 0)::BIGINT AS n_hit,
       |       ${r4Sql("coalesce(h.n_hit, 0)::DOUBLE / t.n_true::DOUBLE")} AS recall
       |FROM tot t LEFT JOIN hits h USING (q_id)""".stripMargin

  // --------------------------------------- q221 Matryoshka truncation audit

  /** Prefix dimensions audited by q221 (the full [[Dim]] row is the free
    * self-check: recall 1.0 by construction).
    */
  val MatryoshkaDims: Seq[Int] = Seq(8, 16, 32, Dim)

  /** q221: Matryoshka-truncation recall audit — how much of the exact
    * full-dimension top-[[K]] survives when similarity is computed on a
    * PREFIX of the embedding (Kusupati et al. 2022: MRL-trained
    * embeddings are consumed truncated to cut index cost; even for
    * non-MRL vectors this measures what prefix search loses). Per
    * audited prefix width: the query count, the summed hits, and the
    * average recall@K against the full-dim ranking — the table that
    * decides which truncation an index tier can afford. The [[Dim]] row
    * reports 1.0 by construction (self-check).
    *
    * Scale shape: the q138 audit class — Q = [[NQueries]] is the
    * BOUNDED query sample, broadcast; per width one Q×N narrow scoring
    * scan (prefix dot on sliced arrays) + per-query top-K + one Q-row
    * join against the full-dim truth. Cost is widths × the q25 scan; at
    * 100 TB the scan swaps for the bucketed probe per tier, same
    * downstream audit.
    *
    * Parity: prefix dots/norms are index-ordered sums over the SAME
    * elements on both engines (oracle replays `dotSql` at each width);
    * scores r4'd before ranking with (score DESC, n_id) ties; recall is
    * an exact integer ratio r4'd once.
    */
  def matryoshkaRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.embeddings(spark, sfDir)
    def topk(d: Int): DataFrame = {
      val emb =
        if (d == Dim) col("embedding") else slice(col("embedding"), 1, d)
      val e = base.select(col("vec_id"), emb.as("v"))
        .select(col("vec_id"), col("v"), norm(col("v")).as("nrm"))
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val scored = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          r4(dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
            .as("score"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("n_id").asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= K)
        .select(col("q_id"), col("n_id"))
    }
    // the full-dim truth is consumed 2×|dims| times (one hits join + one
    // n_queries agg per width) — materialize it ONCE (Q·K rows; the
    // survivorFlags eager-checkpoint discipline) instead of re-running
    // the most expensive scan in the query per consumer
    val truth = topk(Dim).lineageCheckpoint()
    val nq = truth.select(col("q_id")).distinct()
      .agg(count(lit(1)).as("n_queries"))
    MatryoshkaDims.map { d =>
      val prefix = if (d == Dim) truth else topk(d) // self-check row reuses it
      val hits = prefix.join(truth, Seq("q_id", "n_id"))
        .agg(count(lit(1)).as("n_hit"))
      hits.crossJoin(nq).select(
        lit(d).as("dim"), col("n_queries"), col("n_hit"),
        r4(col("n_hit").cast("double") /
          (col("n_queries") * K).cast("double")).as("avg_recall"))
    }.reduce(_ unionByName _)
  }

  val matryoshkaRecallSql: String = {
    def sideSql(d: Int, name: String) =
      s"""$name AS (
         |  SELECT q.q_id, e.vec_id AS n_id,
         |         row_number() OVER (
         |           PARTITION BY q.q_id
         |           ORDER BY ${r4Sql(
             Portable.dotSql("q.qv", "e.embedding", d) +
               s" / (q.qn * e.nrm)")} DESC, e.vec_id) AS rn
         |  FROM (SELECT vec_id, embedding,
         |               sqrt(${Portable.dotSql("embedding", "embedding", d)})
         |                 AS nrm
         |        FROM embeddings) e
         |  JOIN (SELECT vec_id AS q_id, embedding AS qv,
         |               sqrt(${Portable.dotSql("embedding", "embedding", d)})
         |                 AS qn
         |        FROM embeddings WHERE vec_id < $NQueries) q
         |    ON q.q_id <> e.vec_id)""".stripMargin
    // NOTE the oracle ranks on the UN-r4'd expression wrapped in r4Sql —
    // identical to the Spark side, which r4's the score before ranking
    val dims = MatryoshkaDims
    val ctes = (sideSql(Dim, "truth") +: dims.map(d => sideSql(d, s"p$d")))
      .mkString(",\n")
    val rows = dims.map { d =>
      s"""SELECT $d AS dim,
         |  (SELECT count(DISTINCT q_id) FROM truth WHERE rn <= $K)
         |    AS n_queries,
         |  (SELECT count(*) FROM p$d a
         |   JOIN truth t ON t.q_id = a.q_id AND t.n_id = a.n_id
         |   WHERE a.rn <= $K AND t.rn <= $K) AS n_hit,
         |  ${r4Sql(
           s"""(SELECT count(*) FROM p$d a
              | JOIN truth t ON t.q_id = a.q_id AND t.n_id = a.n_id
              | WHERE a.rn <= $K AND t.rn <= $K)::DOUBLE
              | / ((SELECT count(DISTINCT q_id) FROM truth WHERE rn <= $K)
              |    * $K)::DOUBLE""".stripMargin)} AS avg_recall""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $ctes\n$rows"
  }

  // ------------------------------------------------- q163 ANN MRR audit

  /** q163: ANN mean-reciprocal-rank — per query, 1/rank of the TRUE
    * nearest neighbor (q25's top-1) inside the ANN result list (q26),
    * zero when the index misses it entirely; plus the corpus MRR as a
    * rolled-up row (q_id = −1). Recall@k (q138) says how much of the
    * top-k survives; MRR says whether the single best answer surfaces
    * FIRST — the metric that matters when only one retrieved item is
    * shown or fed to a reranker.
    *
    * Scale shape: the two audited pipelines + one left equi-join of the
    * Q-row truth top-1 against the ANN list + a 1-row rollup union — the
    * q138 adder class. The reciprocal is exact (1/rank of an integer
    * ≤ k), summed over Q queries after integer-exactness, divided once.
    */
  def annMrr(spark: SparkSession, sfDir: String): DataFrame = {
    val truth1 = knnBrute(spark, sfDir).filter(col("rn") === 1)
      .select(col("q_id"), col("n_id"))
    val ann = annLsh(spark, sfDir).select(col("q_id"), col("n_id"), col("rn"))
    val perQuery = truth1.join(ann, Seq("q_id", "n_id"), "left")
      .select(col("q_id"),
        coalesce(col("rn"), lit(0)).cast("int").as("rank_of_true"),
        when(col("rn").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("rn").cast("double")).as("rr"))
    val summary = perQuery.agg(
      count(lit(1)).as("n"),
      sum((col("rr") * lit(RrScale)).cast("long")).as("srr"))
      .select(lit(-1L).as("q_id"), lit(0).as("rank_of_true"),
        r4(col("srr").cast("double") / RrScale / col("n").cast("double")).as("rr"))
    perQuery.select(col("q_id"), col("rank_of_true"), r4(col("rr")).as("rr"))
      .unionByName(summary)
  }

  /** Integer scale for the reciprocal-rank sum (exact: rr ∈ {0, 1, 1/2,
    * 1/3}·Scale are whole numbers for k ≤ 3 except 1/3 — floor-rounded
    * identically on both engines before the sum).
    */
  val RrScale = 1000000L

  val annMrrSql: String =
    s"""WITH truth1 AS (
       |  SELECT q_id, n_id FROM ($knnBruteSql) WHERE rn = 1),
       |ann AS (SELECT q_id, n_id, rn FROM ($annLshSql)),
       |pq AS (
       |  SELECT t.q_id,
       |         coalesce(a.rn, 0)::INT AS rank_of_true,
       |         CASE WHEN a.rn IS NULL THEN 0.0 ELSE 1.0 / a.rn::DOUBLE END AS rr
       |  FROM truth1 t LEFT JOIN ann a USING (q_id, n_id))
       |SELECT q_id, rank_of_true, ${r4Sql("rr")} AS rr FROM pq
       |UNION ALL
       |SELECT -1::BIGINT, 0,
       |       ${r4Sql(
             s"sum(floor(rr * $RrScale)::BIGINT)::DOUBLE / $RrScale / count(*)::DOUBLE")}
       |FROM pq""".stripMargin

  // --------------------------------------------- q148 power-iteration PCA

  /** Fixed power-iteration count (it is a fixed-k iteration by contract,
    * not an until-converged loop — identical output on any engine).
    */
  val PowerIters = 10

  /** q148: leading principal direction of the embedding covariance by
    * power iteration — the eigen-solve a whitening/PCA pass (or an
    * embedding-drift monitor tracking the dominant variance direction)
    * runs on top of q111's covariance block. Output: per-dimension loading
    * of the top eigenvector plus the Rayleigh-quotient eigenvalue.
    *
    * Scale shape: THE central pattern for linear algebra on a cluster —
    * the corpus is touched ONCE (q111's single map-side-combinable moment
    * aggregation); everything after runs on the [[CovDim]]² summary
    * (dimension-sized, never corpus-sized): ten chained matvec/normalize
    * steps over an 8-row frame with 1-row broadcast crosses. At 100 TB
    * the moment pass dominates and nothing else grows.
    *
    * Parity: the covariance entries are r4-rounded by q111 (bit-identical
    * across engines — q111's own hash-match proves it); every matvec and
    * norm is an INDEX-ORDERED list dot (native VecDot ≡ the oracle's
    * list_sum(list_transform(...)) — the Portable.dotSql contract), so
    * the float op sequence is identical on both engines and the iteration
    * stays bit-equal all the way down; r4 at the output is belt and
    * braces. v₀ = 1/√d in every component (one Scala constant interpolated
    * into both plans); the covariance is PSD so the sign convention is
    * stable.
    */
  def powerIteration(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE corpus-touching job: q111's moment aggregation, collected as the
    // CovDim² (= dimension-sized, corpus-independent) covariance block —
    // the same driver-scalar legitimacy class as the logreg gradient
    // collects and q85's node-count probe. The ten matvec/normalize steps
    // then run as plain Scala doubles (r15): they previously ran as ten
    // chained 1-row DataFrame broadcasts — ~24 scheduler jobs and two
    // dozen exchanges to iterate an 8×8 matrix. Bit-equality: the Scala
    // loop performs the IDENTICAL IEEE op sequence the Spark/native-VecDot
    // form performed — index-ordered dots (VecDot is a sequential
    // index-order sum), per-element x / sqrt(dot(w,w)) normalization, v₀ =
    // 1/√d — over the same r4-rounded covariance entries, so every
    // intermediate double is the same bit pattern (SimilaritySpec's driver-side
    // eigen reference pins exactly this sequence, and the DuckDB oracle
    // still unrolls the full iteration independently).
    val d = CovDim
    val m = Array.ofDim[Double](d, d)
    embeddingCovariance(spark, sfDir).collect().foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      m(i)(j) = c
      if (i != j) m(j)(i) = c
    }
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += m(i)(j) * v(j); j += 1 }
        s
      }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var k = 0
      while (k < d) { s += a(k) * b(k); k += 1 }
      s
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to PowerIters) {
      val w = matvec(v)
      val n = math.sqrt(dot(w, w))
      v = w.map(_ / n)
    }
    val wFin = matvec(v)
    val lambda = dot(wFin, v)
    val s = spark
    import s.implicits._
    v.toSeq.zipWithIndex
      .map { case (loading, dim) => (dim, o4(loading), o4(lambda)) }
      .toDF("dim", "loading", "eigenvalue")
  }

  /** Driver-side r4 (round-half-up on the 1e4 grid) — the scalar twin of
    * [[Portable.r4]]'s column form, bit-identical on doubles.
    */
  private def o4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  val powerIterationSql: String = {
    val d = CovDim
    def dot(a: String, b: String) = Portable.dotSql(a, b, d)
    val v0 = 1.0 / math.sqrt(d.toDouble)
    val sb = new StringBuilder
    sb ++= s"WITH cfull AS (\n"
    sb ++= s"  SELECT i, j, cov FROM ($embeddingCovarianceSql)\n"
    sb ++= s"  UNION ALL\n"
    sb ++= s"  SELECT j, i, cov FROM ($embeddingCovarianceSql) WHERE i <> j),\n"
    sb ++= s"crow AS (SELECT i, list(cov ORDER BY j) AS row FROM cfull GROUP BY i),\n"
    sb ++= s"v0 AS (SELECT [${Seq.fill(d)(v0).mkString(", ")}]::DOUBLE[] AS v),\n"
    for (k <- 1 to PowerIters) {
      sb ++= s"w$k AS (SELECT list(wi ORDER BY i) AS w FROM (\n"
      sb ++= s"  SELECT c.i, ${dot("c.row", "p.v")} AS wi FROM crow c, v${k - 1} p)),\n"
      sb ++= s"v$k AS (SELECT list_transform(w, x -> x / sqrt(${dot("w", "w")})) AS v FROM w$k),\n"
    }
    sb ++= s"wf AS (SELECT list(wi ORDER BY i) AS w FROM (\n"
    sb ++= s"  SELECT c.i, ${dot("c.row", "p.v")} AS wi FROM crow c, v$PowerIters p)),\n"
    sb ++= s"fin AS (SELECT v, w FROM v$PowerIters, wf)\n"
    sb ++= s"SELECT (k - 1)::INT AS dim, ${r4Sql("v[k]")} AS loading,\n"
    sb ++= s"       ${r4Sql(dot("w", "v"))} AS eigenvalue\n"
    sb ++= s"FROM fin CROSS JOIN (SELECT unnest(range(1, ${d + 1})) AS k) ks"
    sb.result()
  }

  // ------------------------------------------------ q187 hard negatives

  /** q187: hard-negative mining for contrastive training — for each query
    * vector, the top-[[K]] most-similar SAME-label neighbors (positives)
    * and the top-[[K]] most-similar DIFFERENT-label neighbors (hard
    * negatives: the items an embedding model currently confuses with the
    * query, which is exactly what a contrastive batch should contain —
    * random negatives are too easy to carry gradient signal). This is the
    * mining pass behind every dual-encoder / CLIP-style training pipeline;
    * it runs over the corpus each epoch, so its join shape matters.
    *
    * Scale shape: the query set broadcasts (a training batch's queries are
    * bounded, not corpus-sized); candidates stream map-side against it
    * with norms precomputed per vector, then ONE window partitioned by
    * (query, kind) takes each top-k — per-partition heaps over ≤|corpus|
    * rows per query. At 100 TB the exact scan becomes the q26/q55
    * bucketed probe (score only LSH-bucket or IVF-probe candidates —
    * same downstream shape, SimilaritySpec's recall bound applies);
    * mining is embarrassingly parallel over query shards either way.
    */
  def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"),
        norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("label").as("q_label"), col("nrm").as("qn"))
    val scored = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"),
        when(col("label") === col("q_label"), "pos").otherwise("neg").as("kind"),
        col("vec_id").as("n_id"),
        r4(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")))
          .as("score"))
    val w = Window.partitionBy(col("q_id"), col("kind"))
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("kind"), col("n_id"), col("score"), col("rn"))
  }

  val hardNegativesSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, label,
       |         sqrt(${Portable.dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, label AS q_label,
       |             nrm AS qn
       |      FROM e WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT q.q_id,
       |         CASE WHEN e.label = q.q_label THEN 'pos' ELSE 'neg' END AS kind,
       |         e.vec_id AS n_id,
       |         ${r4Sql(Portable.dotSql("q.qv", "e.embedding") + " / (q.qn * e.nrm)")} AS score
       |  FROM q JOIN e ON q.q_id <> e.vec_id),
       |ranked AS (
       |  SELECT q_id, kind, n_id, score,
       |         row_number() OVER (PARTITION BY q_id, kind
       |                            ORDER BY score DESC, n_id) AS rn
       |  FROM scored)
       |SELECT q_id, kind, n_id, score, rn::INT AS rn
       |FROM ranked WHERE rn <= $K""".stripMargin

  // --------------------------------------- q208 semantic decontamination

  /** Eval-membership modulus (the q81 convention) and the cosine flag
    * threshold — set where this corpus's i.i.d. tail has mass (the
    * [[NearDupThreshold]] rationale; a real deployment runs ~0.9+).
    */
  val SemDecontamModulus = 97
  val SemDecontamTau = 0.35

  /** q208: SEMANTIC decontamination — flag training vectors whose best
    * cosine against the benchmark/eval set reaches [[SemDecontamTau]],
    * with that best eval neighbor and score. Completes the
    * decontamination ladder: q81 catches exact 3-gram overlap, q170/q173
    * verified 13-gram verbatim spans — this catches PARAPHRASED
    * contamination (reworded benchmark items share no n-gram but sit next
    * to the original in embedding space), which is what modern eval-
    * hygiene audits add on top of string matching. Output: one row per
    * flagged train vector (best eval neighbor, r4'd cosine).
    *
    * Scale shape: the eval side is a FIXED benchmark suite (the q81/q170
    * broadcast assumption made literal): it broadcasts, and the corpus is
    * touched by ONE narrow scan — cosine against the broadcast set + a
    * per-vector argmax aggregation keyed on the train id. No shuffle of
    * the corpus beyond the argmax's own hash agg; at a production τ the
    * q26/q55 bucketed probe replaces the scan with the same downstream
    * shape.
    *
    * Parity: norms/dots index-ordered doubles (bit-equal both engines);
    * the argmax orders on the RAW cosine with eval-id ties; r4 only at
    * the output.
    */
  def semanticDecontam(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val isEval = pmod(col("vec_id"), lit(SemDecontamModulus.toLong)) === 0L
    val evals = e.filter(isEval)
      .select(col("vec_id").as("eval_id"), col("embedding").as("ev"),
        col("nrm").as("en"))
    val train = e.filter(!isEval)
    // Written as cross-join + filter-on-the-projected-column; note the
    // OPTIMIZED plan is the same either way — Catalyst substitutes the
    // deterministic `cos` alias and pushes the predicate back into the
    // join condition (verified via optimizedPlan), so the Dim-wide dot
    // product runs once per (train, eval) pair in the BNLJ condition and
    // is RE-evaluated only for the surviving pairs in the projection —
    // a cost bounded by the (τ-small) flag set, not the N·M scan.
    val scored = train.crossJoin(broadcast(evals))
      .select(col("vec_id"), col("eval_id"),
        (dot(col("embedding"), col("ev")) / (col("nrm") * col("en")))
          .as("cos"))
      .filter(col("cos") >= SemDecontamTau)
    scored.groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("eval_id")).as("ne"))).as("m"))
      .select(col("vec_id"), (-col("m.ne")).as("eval_id"),
        r4(col("m.cos")).as("cosine"))
  }

  val semanticDecontamSql: String = {
    val cos = s"${Portable.dotSql("t.embedding", "v.ev")} / (t.nrm * v.en)"
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${Portable.dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |ev AS (SELECT vec_id AS eval_id, embedding AS ev, nrm AS en
       |       FROM e WHERE vec_id % $SemDecontamModulus = 0),
       |scored AS (
       |  SELECT t.vec_id, v.eval_id, $cos AS cos
       |  FROM (SELECT * FROM e WHERE vec_id % $SemDecontamModulus <> 0) t
       |  JOIN ev v ON $cos >= $SemDecontamTau),
       |best AS (
       |  SELECT vec_id, eval_id, cos,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY cos DESC, eval_id) AS rn
       |  FROM scored)
       |SELECT vec_id, eval_id, ${r4Sql("cos")} AS cosine
       |FROM best WHERE rn = 1""".stripMargin
  }

  // ------------------------------------------------ q197 k-center coreset

  /** Selected coreset size (fixed-k by contract, like PowerIters). */
  val KCenterK = 6

  /** q197: greedy k-center coreset selection over the embedding space —
    * farthest-point traversal (Gonzalez 1985; a 2-approximation to the
    * k-center objective). THE diverse-subset primitive of data selection:
    * coreset construction for active learning, seed picking for balanced
    * annotation batches, and the diversity half of quality×diversity
    * curation — where q49's k-means compresses toward cluster MEANS,
    * k-center maximizes COVERAGE (every vector ends within the final
    * radius of a pick). Output: one row per pick — selection step, the
    * chosen vec_id, and the max-min squared distance at selection time
    * (the coverage radius² the corpus had BEFORE that pick, a monotone
    * non-increasing curve a data-budget owner reads directly: step k's
    * dist2 is the worst-case representation error of a (k−1)-point
    * coreset).
    *
    * Scale shape: inherently k sequential passes (each pick must see the
    * previous), but each pass is the MINIMAL distributed shape — one
    * narrow map (dot against one broadcast-literal center + `least` with
    * the carried dmin) and a top-1 TakeOrdered reduce; no shuffle, no
    * pair fan-out, O(N·Dim·k) total. The running min-distance frame is
    * localCheckpointed per round (the q57/q148 lineage cap), so round r's
    * plan holds one literal center, not r of them. Seed = min vec_id
    * (deterministic on both engines).
    *
    * Parity: dist² = ((n2 − 2·dot) + c2) with norms precomputed — every
    * op IEEE, textually ordered identically in the oracle; ties on dmin
    * break by vec_id on both sides; r4 only at the output.
    */
  def kcenterCoreset(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"),
        dot(col("embedding"), col("embedding")).as("n2"))
      .lineageCheckpoint()
    val seed = e.orderBy(col("vec_id")).limit(1).collect()(0)
    var centerV = seed.getSeq[Float](1)
    var centerN2 = seed.getDouble(2)
    val picks = Seq.newBuilder[(Int, Long, Double)]
    picks += ((1, seed.getLong(0), 0.0))
    def distToCenter = (col("n2") - lit(2.0) *
      dot(col("v"), typedLit(centerV))) + lit(centerN2)
    var cur = e.select(col("vec_id"), col("v"), col("n2"),
      distToCenter.as("dmin")).lineageCheckpoint()
    for (r <- 2 to KCenterK) {
      val next = cur.orderBy(col("dmin").desc, col("vec_id")).limit(1)
        .collect()(0)
      picks += ((r, next.getLong(0),
        math.floor(next.getDouble(3) * 1e4 + 0.5) / 1e4))
      centerV = next.getSeq[Float](1)
      centerN2 = next.getDouble(2)
      if (r < KCenterK)
        cur = cur.select(col("vec_id"), col("v"), col("n2"),
          least(col("dmin"), distToCenter).as("dmin")).lineageCheckpoint()
    }
    val s = spark
    import s.implicits._
    picks.result().toDF("step", "vec_id", "dist2")
  }

  val kcenterCoresetSql: String = {
    val k = KCenterK
    def dotE(a: String, b: String) = Portable.dotSql(a, b, Dim)
    val sb = new StringBuilder
    sb ++= s"WITH n AS (SELECT vec_id, embedding AS v,\n"
    sb ++= s"  ${dotE("embedding", "embedding")} AS n2 FROM embeddings),\n"
    sb ++= s"c1 AS (SELECT vec_id, v, n2 FROM n ORDER BY vec_id LIMIT 1),\n"
    sb ++= s"d1 AS (SELECT a.vec_id, a.v, a.n2,\n"
    sb ++= s"  ((a.n2 - 2.0 * ${dotE("a.v", "c.v")}) + c.n2) AS dmin FROM n a, c1 c),\n"
    for (r <- 2 to k) {
      sb ++= s"c$r AS (SELECT vec_id, v, n2, dmin FROM d${r - 1}\n"
      sb ++= s"  ORDER BY dmin DESC, vec_id LIMIT 1)"
      if (r < k) {
        sb ++= s",\nd$r AS (SELECT a.vec_id, a.v, a.n2,\n"
        sb ++= s"  least(a.dmin, ((a.n2 - 2.0 * ${dotE("a.v", "c.v")}) + c.n2))"
        sb ++= s" AS dmin\n  FROM d${r - 1} a, c$r c),\n"
      } else sb ++= "\n"
    }
    sb ++= s"SELECT 1::INT AS step, vec_id, 0.0 AS dist2 FROM c1\n"
    for (r <- 2 to k)
      sb ++= s"UNION ALL\nSELECT $r::INT, vec_id, ${r4Sql("dmin")} FROM c$r\n"
    sb.result()
  }

  // ----------------------------------------- q225 filtered vector search

  /** q225: FILTERED ANN with its recall audit — each query retrieves the
    * top-[[K]] most-similar vectors restricted to candidates carrying the
    * query's own label (the "filtered vector search" every production
    * vector store exposes: metadata predicate + similarity, e.g. "nearest
    * docs in my tenant/language/category"), through the q37 IVF probe
    * path, and the output is the per-query audit against the exact
    * filtered brute-force truth. This is THE known failure mode of
    * filtered ANN measured as data: a selective filter empties the probed
    * lists (the survivors live in lists the probe never visits), so
    * post-filter recall collapses exactly where the filter bites —
    * `n_cand` says how many candidates survived the probe∩filter, and
    * `recall` is the number that decides probe width (or a label-
    * partitioned index) for that selectivity.
    *
    * Scale shape: centroids broadcast (16 rows); assignment is one narrow
    * scan (the q37 kernel); the label filter is applied BEFORE the
    * per-query top-k window, so the ranked stream is probe∩filter-sized,
    * not corpus-sized. The exact side scans label-matching vectors only —
    * the audit truth over a bounded query sample, exactly how recall is
    * measured at 100 TB. No new shuffle beyond q37's.
    *
    * Parity: same r4'd-cosine/tie-break discipline as q37/q138, both
    * sides replayed from the same constants; counts exact.
    */
  def filteredAnn(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.ExtraOps.{IvfCentroids, IvfProbes}
    val e = Tables.embeddings(spark, sfDir)
    val cent = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    def cos(a: Column, b: Column): Column =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    // nearest-centroid assignment: broadcast 16 rows, argmax r4'd cosine
    val assigned = e.join(broadcast(cent), col("vec_id") =!= lit(-1))
      .select(col("vec_id"), col("embedding"), col("label"), col("c_id"),
        r4(cos(col("embedding"), col("cv"))).as("c_cos"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("c_cos"), (-col("c_id")).as("neg_c"))).as("best"),
        first(col("embedding")).as("embedding"), first(col("label")).as("label"))
      .select(col("vec_id"), col("embedding"), col("label"),
        (-col("best.neg_c")).as("c_id"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("label").as("q_label"))
    // probed lists per query (top-IvfProbes centroids by r4'd cosine)
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("c_id").asc)
    val probed = q.join(broadcast(cent), col("q_id") =!= lit(-1))
      .select(col("q_id"), col("qv"), col("q_label"), col("c_id"),
        r4(cos(col("qv"), col("cv"))).as("c_cos"))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= IvfProbes)
      .select(col("q_id"), col("qv"), col("q_label"), col("c_id"))
    // probe ∩ filter BEFORE ranking: the filtered candidate stream
    val cands = probed.join(assigned, Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id") && col("label") === col("q_label"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        r4(cos(col("qv"), col("embedding"))).as("score"))
    val wk = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    val approx = cands.withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= K).select(col("q_id"), col("n_id"))
    val nCand = cands.groupBy(col("q_id")).agg(count(lit(1)).as("n_cand"))
    // exact filtered truth: brute force over label-matching candidates
    val exact = broadcast(q).join(e,
        col("q_id") =!= col("vec_id") && col("q_label") === col("label"))
      .select(col("q_id"),
        col("vec_id").as("n_id"),
        r4(cos(col("qv"), col("embedding"))).as("score"))
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= K).select(col("q_id"), col("n_id"))
    val hits = exact.join(approx, Seq("q_id", "n_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    q.select(col("q_id"), col("q_label").as("label"))
      .join(exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_true")),
        Seq("q_id"), "left")
      .join(nCand, Seq("q_id"), "left")
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("label"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        when(coalesce(col("n_true"), lit(0L)) > 0L,
          r4(coalesce(col("n_hit"), lit(0L)).cast("double") /
            col("n_true").cast("double"))).otherwise(lit(0.0)).as("recall"))
  }

  val filteredAnnSql: String = {
    import graft.ops.ExtraOps.{IvfCentroids, IvfProbes}
    val cos = (a: String, b: String) =>
      s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    s"""WITH cent AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings
       |              WHERE vec_id < $IvfCentroids),
       |assigned AS (
       |  SELECT vec_id, embedding, label, c_id FROM (
       |    SELECT e.vec_id, e.embedding, e.label, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${r4Sql(cos("e.embedding", "c.cv"))} DESC,
       |                      c.c_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN cent c)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, label AS q_label
       |      FROM embeddings WHERE vec_id < $NQueries),
       |probed AS (
       |  SELECT q_id, qv, q_label, c_id FROM (
       |    SELECT q.q_id, q.qv, q.q_label, c.c_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${r4Sql(cos("q.qv", "c.cv"))} DESC, c.c_id ASC) AS pr
       |    FROM q CROSS JOIN cent c)
       |  WHERE pr <= $IvfProbes),
       |cands AS (
       |  SELECT p.q_id, a.vec_id AS n_id,
       |         ${r4Sql(cos("p.qv", "a.embedding"))} AS score
       |  FROM probed p JOIN assigned a USING (c_id)
       |  WHERE p.q_id <> a.vec_id AND a.label = p.q_label),
       |approx AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY score DESC, n_id ASC) AS rn FROM cands)
       |  WHERE rn <= $K),
       |ncand AS (SELECT q_id, count(*) AS n_cand FROM cands GROUP BY 1),
       |exact AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.q_id, e.vec_id AS n_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${r4Sql(cos("q.qv", "e.embedding"))} DESC,
       |                      e.vec_id ASC) AS rn
       |    FROM q JOIN embeddings e
       |      ON q.q_id <> e.vec_id AND e.label = q.q_label)
       |  WHERE rn <= $K),
       |hits AS (
       |  SELECT q_id, count(*) AS n_hit
       |  FROM exact JOIN approx USING (q_id, n_id) GROUP BY 1),
       |tru AS (SELECT q_id, count(*) AS n_true FROM exact GROUP BY 1)
       |SELECT q.q_id, q.q_label AS label,
       |       coalesce(nc.n_cand, 0)::BIGINT AS n_cand,
       |       coalesce(t.n_true, 0)::BIGINT AS n_true,
       |       coalesce(h.n_hit, 0)::BIGINT AS n_hit,
       |       CASE WHEN coalesce(t.n_true, 0) > 0
       |            THEN ${r4Sql("coalesce(h.n_hit, 0)::DOUBLE / t.n_true::DOUBLE")}
       |            ELSE 0.0 END AS recall
       |FROM q LEFT JOIN tru t USING (q_id)
       |       LEFT JOIN ncand nc USING (q_id)
       |       LEFT JOIN hits h USING (q_id)""".stripMargin
  }

  // ------------------------------------------ q226 IVF maintenance delta

  /** Append membership for the q226 maintenance audit (the q216/q207
    * synthetic-batch convention: `vec_id % modulus = 0` is "the appended
    * batch"; production replaces the predicate with the real batch id).
    */
  val IvfDeltaModulus = 5L

  /** q226: incremental ANN index maintenance — the appended vector batch
    * is assigned to the FROZEN centroids (trained on the base corpus;
    * here the first 16 base vectors, the q37 convention), and the output
    * is the per-list maintenance audit: base size, appended count, growth
    * ratio, and the `hot` flag for lists that crossed 2× the mean —
    * the signal that triggers re-training/list-splitting. This is how a
    * production vector index actually lives: appends are a broadcast
    * argmin scan over the NEW data only (re-clustering 100 TB per batch
    * is not a plan); drift concentrates appends into few lists, probe
    * latency on those lists degrades, and THIS table is what pages the
    * index owner before it does.
    *
    * Scale shape: one narrow scan over base (once, amortized — in steady
    * state the standing assignment is a materialized column) and one over
    * the delta; output is [[graft.ops.ExtraOps.IvfCentroids]] rows; the
    * mean crosses via one broadcast scalar. Nothing scales with corpus
    * size except the two scans.
    *
    * Parity: the q37 r4'd-cosine assignment kernel on both sides; counts
    * and the flag exact; growth is one r4'd division.
    */
  def ivfDelta(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.ExtraOps.IvfCentroids
    val e = Tables.embeddings(spark, sfDir)
    val isNew = pmod(col("vec_id"), lit(IvfDeltaModulus)) === 0L
    val base = e.filter(!isNew)
    // frozen centroids: the first IvfCentroids BASE vectors (vec_id < 20,
    // vec_id % 5 != 0 is exactly 16 rows — the appended batch can never
    // shift them, which is the maintenance contract under audit)
    val cent = base.filter(col("vec_id") < IvfCentroids + IvfCentroids / 4)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    def cos(a: Column, b: Column): Column =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    def assign(side: DataFrame): DataFrame = side
      .join(broadcast(cent), col("vec_id") =!= lit(-1))
      .select(col("vec_id"), col("c_id"),
        r4(cos(col("embedding"), col("cv"))).as("c_cos"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("c_cos"), (-col("c_id")).as("neg_c"))).as("best"))
      .select(col("vec_id"), (-col("best.neg_c")).as("c_id"))
    val nBase = assign(base).groupBy(col("c_id")).agg(count(lit(1)).as("n_base"))
    val nNew = assign(e.filter(isNew))
      .groupBy(col("c_id")).agg(count(lit(1)).as("n_new"))
    val lists = cent.select(col("c_id"))
      .join(nBase, Seq("c_id"), "left")
      .join(nNew, Seq("c_id"), "left")
      .select(col("c_id"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("n_total", col("n_base") + col("n_new"))
    val mean = lists.agg(
      (sum(col("n_total")).cast("double") / count(lit(1)).cast("double"))
        .as("mean_total"))
    lists.crossJoin(broadcast(mean))
      .select(col("c_id"), col("n_base"), col("n_new"), col("n_total"),
        when(col("n_base") > 0L,
          r4(col("n_new").cast("double") / col("n_base").cast("double")))
          .otherwise(lit(0.0)).as("growth"),
        (col("n_total").cast("double") > lit(2.0) * col("mean_total"))
          .cast("int").as("hot"))
  }

  val ivfDeltaSql: String = {
    import graft.ops.ExtraOps.IvfCentroids
    val cos = (a: String, b: String) =>
      s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    def assignCte(name: String, pred: String) =
      s"""$name AS (
         |  SELECT vec_id, c_id FROM (
         |    SELECT e.vec_id, c.c_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${r4Sql(cos("e.embedding", "c.cv"))} DESC,
         |                      c.c_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cent c
         |    WHERE $pred)
         |  WHERE rn = 1)"""
    s"""WITH cent AS (
       |  SELECT vec_id AS c_id, embedding AS cv FROM embeddings
       |  WHERE vec_id < ${IvfCentroids + IvfCentroids / 4}
       |    AND vec_id % $IvfDeltaModulus <> 0),
       |${assignCte("ab", s"e.vec_id % $IvfDeltaModulus <> 0")},
       |${assignCte("an", s"e.vec_id % $IvfDeltaModulus = 0")},
       |nb AS (SELECT c_id, count(*) AS n_base FROM ab GROUP BY 1),
       |nn AS (SELECT c_id, count(*) AS n_new FROM an GROUP BY 1),
       |lists AS (
       |  SELECT c.c_id,
       |         coalesce(nb.n_base, 0)::BIGINT AS n_base,
       |         coalesce(nn.n_new, 0)::BIGINT AS n_new,
       |         (coalesce(nb.n_base, 0) + coalesce(nn.n_new, 0))::BIGINT
       |           AS n_total
       |  FROM cent c LEFT JOIN nb USING (c_id) LEFT JOIN nn USING (c_id)),
       |m AS (SELECT sum(n_total)::DOUBLE / count(*)::DOUBLE AS mean_total
       |      FROM lists)
       |SELECT l.c_id, l.n_base, l.n_new, l.n_total,
       |       CASE WHEN l.n_base > 0
       |            THEN ${r4Sql("l.n_new::DOUBLE / l.n_base::DOUBLE")}
       |            ELSE 0.0 END AS growth,
       |       (l.n_total::DOUBLE > 2.0 * m.mean_total)::INT AS hot
       |FROM lists l CROSS JOIN m""".stripMargin
  }

  // -------------------------------------- q255 Rocchio feedback retrieval

  /** Rocchio mixing weights (the classic α=1, β=0.75 of SMART/IR
    * textbooks) and the pseudo-relevance feedback depth.
    */
  val RocchioAlpha = 1.0
  val RocchioBeta = 0.75
  val RocchioFb = 5

  /** q255: Rocchio pseudo-relevance feedback over the embedding index —
    * retrieve top-[[RocchioFb]] per query, move each query toward its
    * feedback centroid (q' = α·q + β·mean(top-Fb)), retrieve again, and
    * report per query how the top-[[K]] list changed: the overlap with
    * the original list and the mean-score lift. The query-EXPANSION side
    * of the retrieval family (q179 fuses rankers, q240 diversifies, q187
    * mines negatives — this improves the query itself), and the standard
    * first move when a RAG/retrieval stack underperforms: one extra
    * round trip, no model change.
    *
    * Scale shape: two broadcast-probe scans of the corpus (queries and
    * expanded queries are both bounded, never corpus-sized) + per-query
    * top-k windows — exactly q25's shape twice; the feedback centroid is
    * a (query × Dim) cell aggregation over Fb·|queries| rows. At
    * production τ both scans become the q26/q55 bucketed probes.
    *
    * Parity: round-1 ranking on the r4'd cosine (the q25 contract);
    * feedback components quantized to the [[CovScale]] grid → centroid
    * sums exact integers; q' components are deterministic per-row doubles
    * (identical textual order), so round-2 cosines are bit-equal; means
    * sum r4-grid scores as exact scaled integers.
    */
  def rocchio(spark: SparkSession, sfDir: String): DataFrame = {
    val cs = CovScale
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val scored = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")))
          .as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    // one ranking pass serves both the feedback set (rn ≤ Fb) and the
    // baseline top-K (rn ≤ K); the frame is |queries|·Fb rows — tiny
    val ranked = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= math.max(RocchioFb, K)).lineageCheckpoint()
    val cells = ranked.filter(col("rn") <= RocchioFb)
      .join(e.select(col("vec_id").as("n_id"), col("embedding").as("nv")), "n_id")
      .select(col("q_id"), posexplode(col("nv")).as(Seq("pos", "v")))
      .select(col("q_id"), col("pos"),
        floor(col("v").cast("double") * cs + 0.5).cast("long").as("qc"))
      .groupBy(col("q_id"), col("pos"))
      .agg(sum(col("qc")).as("s"), count(lit(1)).as("cnt"))
    val cent = cells.groupBy(col("q_id"))
      .agg(sort_array(collect_list(struct(col("pos"),
        (col("s").cast("double") / (col("cnt").cast("double") * cs.toDouble))
          .as("m")))).as("ps"))
      .select(col("q_id"), transform(col("ps"), p => p.getField("m")).as("cv"))
    val qp = q.join(cent, "q_id")
      .select(col("q_id"),
        zip_with(col("qv").cast("array<double>"), col("cv"),
          (a, b) => lit(RocchioAlpha) * a + lit(RocchioBeta) * b).as("qp"))
      .select(col("q_id"), col("qp"), sqrt(dot(col("qp"), col("qp"))).as("qpn"))
    val scored2 = broadcast(qp).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qp"), col("embedding").cast("array<double>")) /
          (col("qpn") * col("nrm"))).as("score"))
    val top2 = scored2.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
    val base = ranked.filter(col("rn") <= K)
    def meanScaled(c: Column) = floor(c * 10000.0 + 0.5).cast("long")
    val baseAgg = base.groupBy(col("q_id"))
      .agg(sum(meanScaled(col("score"))).as("bs"), count(lit(1)).as("bn"))
    val fbAgg = top2.groupBy(col("q_id"))
      .agg(sum(meanScaled(col("score"))).as("fs"), count(lit(1)).as("fn"))
    val ov = base.select(col("q_id"), col("n_id"))
      .join(top2.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    baseAgg.join(fbAgg, "q_id")
      .join(ov, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_overlap"), lit(0L)).cast("int").as("n_overlap"),
        r4(col("bs").cast("double") / (col("bn").cast("double") * 10000.0))
          .as("base_mean"),
        r4(col("fs").cast("double") / (col("fn").cast("double") * 10000.0))
          .as("fb_mean"),
        r4(col("fs").cast("double") / (col("fn").cast("double") * 10000.0) -
          col("bs").cast("double") / (col("bn").cast("double") * 10000.0))
          .as("gain"))
  }

  val rocchioSql: String = {
    val cs = CovScale
    val d = Dim
    val fbMax = math.max(RocchioFb, K)
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn
       |      FROM e WHERE vec_id < $NQueries),
       |ranked AS (
       |  SELECT q_id, n_id, score, rn FROM (
       |    SELECT q.q_id, e.vec_id AS n_id,
       |           ${r4Sql(dotSql("q.qv", "e.embedding") + " / (q.qn * e.nrm)")} AS score,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${r4Sql(dotSql("q.qv", "e.embedding") + " / (q.qn * e.nrm)")} DESC,
       |                      e.vec_id ASC) AS rn
       |    FROM q JOIN e ON q.q_id <> e.vec_id) WHERE rn <= $fbMax),
       |cells AS (
       |  SELECT r.q_id, i AS pos,
       |         sum(floor(e.embedding[i]::DOUBLE * $cs + 0.5)::BIGINT)::BIGINT AS s,
       |         count(*)::BIGINT AS cnt
       |  FROM ranked r JOIN e ON r.n_id = e.vec_id, range(1, ${d + 1}) r2(i)
       |  WHERE r.rn <= $RocchioFb
       |  GROUP BY 1, 2),
       |qp AS (
       |  SELECT c.q_id,
       |         list($RocchioAlpha * qv_i + $RocchioBeta *
       |              (c.s::DOUBLE / (c.cnt::DOUBLE * $cs.0)) ORDER BY c.pos)
       |           AS qp
       |  FROM (SELECT c0.*, q.qv[c0.pos]::DOUBLE AS qv_i
       |        FROM cells c0 JOIN q ON c0.q_id = q.q_id) c
       |  GROUP BY 1),
       |qpn AS (SELECT q_id, qp, sqrt(${dotSql("qp", "qp")}) AS qpn FROM qp),
       |top2 AS (
       |  SELECT q_id, n_id, score FROM (
       |    SELECT p.q_id, e.vec_id AS n_id,
       |           ${r4Sql(dotSql("p.qp", "e.embedding") + " / (p.qpn * e.nrm)")} AS score,
       |           row_number() OVER (PARTITION BY p.q_id
       |             ORDER BY ${r4Sql(dotSql("p.qp", "e.embedding") + " / (p.qpn * e.nrm)")} DESC,
       |                      e.vec_id ASC) AS rn
       |    FROM qpn p JOIN e ON p.q_id <> e.vec_id) WHERE rn <= $K),
       |base AS (SELECT q_id, n_id, score FROM ranked WHERE rn <= $K),
       |ba AS (SELECT q_id, sum(floor(score * 10000.0 + 0.5)::BIGINT)::BIGINT AS bs,
       |              count(*)::BIGINT AS bn FROM base GROUP BY 1),
       |fa AS (SELECT q_id, sum(floor(score * 10000.0 + 0.5)::BIGINT)::BIGINT AS fs,
       |              count(*)::BIGINT AS fn FROM top2 GROUP BY 1),
       |ov AS (SELECT b.q_id, count(*)::BIGINT AS n_overlap
       |       FROM base b JOIN top2 t ON b.q_id = t.q_id AND b.n_id = t.n_id
       |       GROUP BY 1)
       |SELECT ba.q_id, coalesce(ov.n_overlap, 0)::INT AS n_overlap,
       |       ${r4Sql("ba.bs::DOUBLE / (ba.bn::DOUBLE * 10000.0)")} AS base_mean,
       |       ${r4Sql("fa.fs::DOUBLE / (fa.fn::DOUBLE * 10000.0)")} AS fb_mean,
       |       ${r4Sql(
          "fa.fs::DOUBLE / (fa.fn::DOUBLE * 10000.0) - ba.bs::DOUBLE / (ba.bn::DOUBLE * 10000.0)")}
       |         AS gain
       |FROM ba JOIN fa ON ba.q_id = fa.q_id
       |LEFT JOIN ov ON ba.q_id = ov.q_id""".stripMargin
  }

  // ------------------------------------------------- q258 MAP@K retrieval

  /** MAP cutoff and the fixed-point scale for per-position precision
    * terms before the per-query sum (the q109 discipline).
    */
  val MapK = 10
  val MapScale = 1000000000L

  /** q258: mean-average-precision@K over the embedding index with the
    * q187 label-relevance convention (a neighbor is relevant iff it
    * shares the query's label) — AP@K = Σ_{rel i ≤ K} P@i / min(R, K),
    * one row per query with its corpus-wide relevant count, relevant@K,
    * and AP. Fills the last slot of the ranking-eval suite: q138 recall@k
    * (did the truth arrive), q163 MRR (how early did the FIRST hit
    * arrive), q229 nDCG (graded usefulness), q258 AP (position-weighted
    * precision over ALL hits — the metric that punishes mid-list junk).
    *
    * Scale shape: one q25-shaped broadcast-probe scan feeds BOTH the
    * per-query relevant total (a hash agg) and the top-K window; the AP
    * arithmetic runs on K-bounded per-query frames. At production τ the
    * scan becomes the q26/q55 bucketed probe.
    *
    * Parity: ranks on the r4'd cosine with id ties (the q25 contract);
    * P@i = exact-integer prefix ratios quantized to the [[MapScale]]
    * grid, so the per-query AP numerator is an EXACT integer; the R=0
    * corner pins AP to 0.0 on both engines.
    */
  def mapAtK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"),
        norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("label").as("q_label"), col("nrm").as("qn"))
    val scored = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (col("label") === col("q_label")).cast("long").as("rel"),
        r4(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")))
          .as("score"))
    val totals = scored.groupBy(col("q_id")).agg(sum(col("rel")).as("n_rel"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    val wp = Window.partitionBy(col("q_id")).orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sc = MapScale
    val top = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= MapK)
      .withColumn("cum_rel", sum(col("rel")).over(wp))
      .select(col("q_id"), col("rel"), col("cum_rel"),
        when(col("rel") === 1L,
          floor(col("cum_rel").cast("double") / col("rn").cast("double") *
            sc + 0.5).cast("long")).otherwise(0L).as("pi"))
    top.groupBy(col("q_id"))
      .agg(sum(col("rel")).as("n_rel_topk"), sum(col("pi")).as("sp"))
      .join(totals, "q_id")
      .select(col("q_id"), col("n_rel"), col("n_rel_topk"),
        r4(when(col("n_rel") === 0L, 0.0)
          .otherwise(col("sp").cast("double") /
            (least(col("n_rel"), lit(MapK.toLong)).cast("double") *
              sc.toDouble))).as("ap"))
  }

  val mapAtKSql: String = {
    val sc = MapScale
    val cos = s"${dotSql("q.qv", "e.embedding")} / (q.qn * e.nrm)"
    s"""WITH e AS (
       |  SELECT vec_id, embedding, label,
       |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, label AS q_label,
       |             nrm AS qn
       |      FROM e WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT q.q_id, e.vec_id AS n_id,
       |         (e.label = q.q_label)::BIGINT AS rel,
       |         ${r4Sql(cos)} AS score
       |  FROM q JOIN e ON q.q_id <> e.vec_id),
       |totals AS (SELECT q_id, sum(rel)::BIGINT AS n_rel
       |           FROM scored GROUP BY 1),
       |top AS (
       |  SELECT q_id, rel,
       |         sum(rel) OVER (PARTITION BY q_id ORDER BY rn
       |                        ROWS UNBOUNDED PRECEDING) AS cum_rel,
       |         rn
       |  FROM (SELECT q_id, n_id, rel, score,
       |               row_number() OVER (PARTITION BY q_id
       |                 ORDER BY score DESC, n_id ASC) AS rn
       |        FROM scored) WHERE rn <= $MapK),
       |ap AS (
       |  SELECT q_id, sum(rel)::BIGINT AS n_rel_topk,
       |         sum(CASE WHEN rel = 1
       |                  THEN floor(cum_rel::DOUBLE / rn::DOUBLE * $sc + 0.5)::BIGINT
       |                  ELSE 0 END)::BIGINT AS sp
       |  FROM top GROUP BY 1)
       |SELECT a.q_id, t.n_rel, a.n_rel_topk,
       |       ${r4Sql(
          s"CASE WHEN t.n_rel = 0 THEN 0.0 ELSE a.sp::DOUBLE / (least(t.n_rel, $MapK)::DOUBLE * $sc.0) END")}
       |         AS ap
       |FROM ap a JOIN totals t ON a.q_id = t.q_id""".stripMargin
  }

  // ------------------------------------ q261 binary-quantization recall

  /** q261: binary (sign) quantization recall audit — pack each
    * [[Dim]]=64-dim embedding into ONE 64-bit signature (bit k = sign of
    * component k), rank by Hamming distance, and report per query the
    * recall@[[K]] against the exact cosine top-K. The cheapest
    * quantization a vector store offers (64 bits per vector, 512×
    * smaller than float32; candidate scoring is one XOR+POPCNT) and the
    * third rung of the repo's quantization ladder: q73 prices int8, q178
    * PQ codebooks, q221 matryoshka prefixes — this prices 1 bit/dim.
    * Production uses it as a PREFILTER (binary top-C, exact rescore);
    * the recall measured here is that prefilter's floor at C = K.
    *
    * Scale shape: signatures are one narrow in-array fold (no explode
    * reaches the exchange — the per-row sum of distinct sign bits IS the
    * pack); both rankings are bounded broadcast probes (the q25 shape);
    * at 100 TB the Hamming probe is the one you keep — XOR+POPCNT on a
    * long, no float math, 8 bytes of index per vector.
    *
    * Parity: sign bits from `v > 0` on identical float→double values;
    * the pack sums DISTINCT powers of two (no carries — the sum IS the
    * bitwise OR, exact on both engines incl. the sign bit); Hamming is
    * exact-integer XOR+POPCNT; ranks tie on n_id; recall an exact ratio
    * r4'd.
    */
  def binaryQuantRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val packed = aggregate(
      transform(sequence(lit(0), lit(Dim - 1)),
        i => when(element_at(col("embedding"), i + 1).cast("double") > 0.0,
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), packed.as("sig"),
        norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("sig").as("qsig"), col("nrm").as("qn"))
    val wCos = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    val exact = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")))
          .as("score"))
      .withColumn("rn", row_number().over(wCos)).filter(col("rn") <= K)
    val wHam = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col("n_id").asc)
    val bq = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        bit_count(col("qsig").bitwiseXOR(col("sig"))).as("hamming"))
      .withColumn("rn", row_number().over(wHam)).filter(col("rn") <= K)
    val hits = exact.select(col("q_id"), col("n_id"))
      .join(bq.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hit"), lit(0L)).cast("int").as("n_hit"),
        r4(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("k").cast("double")).as("recall"))
  }

  val binaryQuantRecallSql: String = {
    // DuckDB's << range-checks (1 << 63 errors), so the sign bit is the
    // Long.MinValue literal; Spark's shiftleft(1L, 63) produces the same
    // value by wraparound
    val pack = (e: String) =>
      s"""list_sum(list_transform(range(1, ${Dim + 1}),
         |  i -> CASE WHEN $e[i]::DOUBLE <= 0.0 THEN 0::BIGINT
         |            WHEN i = 64 THEN (-9223372036854775807 - 1)::BIGINT
         |            ELSE 1::BIGINT << (i - 1) END))::BIGINT""".stripMargin
    val cos = s"${dotSql("q.qv", "e.embedding")} / (q.qn * e.nrm)"
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         ${pack("embedding").replace("\n", "\n         ")} AS sig,
       |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, sig AS qsig, nrm AS qn
       |      FROM e WHERE vec_id < $NQueries),
       |exact AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.q_id, e.vec_id AS n_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${r4Sql(cos)} DESC, e.vec_id ASC) AS rn
       |    FROM q JOIN e ON q.q_id <> e.vec_id) WHERE rn <= $K),
       |bq AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.q_id, e.vec_id AS n_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY bit_count(xor(q.qsig, e.sig)) ASC,
       |                      e.vec_id ASC) AS rn
       |    FROM q JOIN e ON q.q_id <> e.vec_id) WHERE rn <= $K),
       |hits AS (
       |  SELECT x.q_id, count(*)::BIGINT AS n_hit
       |  FROM exact x JOIN bq b ON x.q_id = b.q_id AND x.n_id = b.n_id
       |  GROUP BY 1),
       |ks AS (SELECT q_id, count(*)::BIGINT AS k FROM exact GROUP BY 1)
       |SELECT ks.q_id, coalesce(hits.n_hit, 0)::INT AS n_hit,
       |       ${r4Sql("coalesce(hits.n_hit, 0)::DOUBLE / ks.k::DOUBLE")} AS recall
       |FROM ks LEFT JOIN hits ON ks.q_id = hits.q_id""".stripMargin
  }

  // ----------------------------------------- q265 IVF probe-count sweep

  /** Probe counts swept by q265 (powers of two up to half the
    * [[graft.ops.ExtraOps.IvfCentroids]] lists).
    */
  val IvfSweepProbes: Seq[Int] = Seq(1, 2, 4, 8)

  /** q265: IVF operating curve — recall@[[K]] and candidate volume per
    * query at every probe count in [[IvfSweepProbes]], against the exact
    * brute-force top-K. q37 ships ONE geometry and q138 audits ONE recall
    * point; this is the nprobe dial a serving deployment actually turns
    * (latency ∝ candidates scanned, recall ∝ probes) made explicit —
    * the measured sibling of q263's analytic LSH table, for the IVF side
    * of the index family.
    *
    * Scale shape: centroid assignment and probe ranking are broadcast
    * probes against a 16-row dimension; the candidate stream is
    * probe-bounded and the sweep EXPLODES IT ONCE over the probe grid
    * (a candidate row appears once per probe count that admits it — ≤
    * \|sweep\| copies of a probe-bounded frame, never a corpus rescan per
    * probe point); per-(query, nprobe) top-K windows are K-bounded.
    *
    * Parity: the q37/q138 r4'd-cosine/tie-break discipline throughout;
    * counts exact; recall an exact ratio r4'd, 0-truth corner pinned.
    */
  def ivfSweep(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.ExtraOps.IvfCentroids
    val e = Tables.embeddings(spark, sfDir)
    val cent = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    def cos(a: Column, b: Column): Column =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    val assigned = e.join(broadcast(cent), col("vec_id") =!= lit(-1))
      .select(col("vec_id"), col("embedding"), col("c_id"),
        r4(cos(col("embedding"), col("cv"))).as("c_cos"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("c_cos"), (-col("c_id")).as("neg_c"))).as("best"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), (-col("best.neg_c")).as("c_id"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("c_id").asc)
    val maxProbe = IvfSweepProbes.max
    val probed = q.join(broadcast(cent), col("q_id") =!= lit(-1))
      .select(col("q_id"), col("qv"), col("c_id"),
        r4(cos(col("qv"), col("cv"))).as("c_cos"))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= maxProbe)
      .select(col("q_id"), col("qv"), col("c_id"), col("pr"))
    // score each probe-bounded candidate ONCE, then explode over the
    // sweep's admitting probe counts
    val cands = probed.join(assigned, Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("pr"), col("vec_id").as("n_id"),
        r4(cos(col("qv"), col("embedding"))).as("score"))
    val sweep = cands.select(col("q_id"), col("n_id"), col("score"),
      explode(array(IvfSweepProbes.map(lit): _*)).as("nprobe"))
      .filter(col("pr") <= col("nprobe"))
    val wk = Window.partitionBy(col("q_id"), col("nprobe"))
      .orderBy(col("score").desc, col("n_id").asc)
    val approx = sweep.withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= K).select(col("q_id"), col("nprobe"), col("n_id"))
    val nCand = sweep.groupBy(col("q_id"), col("nprobe"))
      .agg(count(lit(1)).as("n_cand"))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    val exact = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        r4(cos(col("qv"), col("embedding"))).as("score"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= K).select(col("q_id"), col("n_id"))
    val hits = exact.join(approx, Seq("q_id", "n_id"))
      .groupBy(col("q_id"), col("nprobe")).agg(count(lit(1)).as("n_hit"))
    nCand.join(hits, Seq("q_id", "nprobe"), "left")
      .select(col("q_id"), col("nprobe"), col("n_cand"),
        coalesce(col("n_hit"), lit(0L)).cast("int").as("n_hit"),
        r4(coalesce(col("n_hit"), lit(0L)).cast("double") / K.toDouble)
          .as("recall"))
  }

  val ivfSweepSql: String = {
    import graft.ops.ExtraOps.IvfCentroids
    val maxProbe = IvfSweepProbes.max
    val probesList = IvfSweepProbes.mkString(", ")
    def cosS(a: String, b: String) =
      s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, embedding AS cv FROM e
       |         WHERE vec_id < $IvfCentroids),
       |assigned AS (
       |  SELECT vec_id, embedding, c_id FROM (
       |    SELECT e.vec_id, e.embedding, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${r4Sql(cosS("e.embedding", "c.cv"))} DESC,
       |                      c.c_id ASC) AS rn
       |    FROM e CROSS JOIN cent c) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, embedding AS qv FROM e
       |      WHERE vec_id < $NQueries),
       |probed AS (
       |  SELECT q_id, qv, c_id, pr FROM (
       |    SELECT q.q_id, q.qv, c.c_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${r4Sql(cosS("q.qv", "c.cv"))} DESC,
       |                      c.c_id ASC) AS pr
       |    FROM q CROSS JOIN cent c) WHERE pr <= $maxProbe),
       |cands AS (
       |  SELECT p.q_id, p.pr, a.vec_id AS n_id,
       |         ${r4Sql(cosS("p.qv", "a.embedding"))} AS score
       |  FROM probed p JOIN assigned a USING (c_id)
       |  WHERE p.q_id <> a.vec_id),
       |sweep AS (
       |  SELECT q_id, n_id, score, nprobe
       |  FROM cands, (SELECT unnest([$probesList]) AS nprobe)
       |  WHERE pr <= nprobe),
       |approx AS (
       |  SELECT q_id, nprobe, n_id FROM (
       |    SELECT q_id, nprobe, n_id,
       |           row_number() OVER (PARTITION BY q_id, nprobe
       |             ORDER BY score DESC, n_id ASC) AS rn
       |    FROM sweep) WHERE rn <= $K),
       |ncand AS (SELECT q_id, nprobe, count(*)::BIGINT AS n_cand
       |          FROM sweep GROUP BY 1, 2),
       |exact AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.q_id, e.vec_id AS n_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${r4Sql(cosS("q.qv", "e.embedding"))} DESC,
       |                      e.vec_id ASC) AS rn
       |    FROM q JOIN e ON q.q_id <> e.vec_id) WHERE rn <= $K),
       |hits AS (
       |  SELECT a.q_id, a.nprobe, count(*)::BIGINT AS n_hit
       |  FROM approx a JOIN exact x ON a.q_id = x.q_id AND a.n_id = x.n_id
       |  GROUP BY 1, 2)
       |SELECT nc.q_id, nc.nprobe, nc.n_cand,
       |       coalesce(h.n_hit, 0)::INT AS n_hit,
       |       ${r4Sql(s"coalesce(h.n_hit, 0)::DOUBLE / $K.0")} AS recall
       |FROM ncand nc LEFT JOIN hits h
       |  ON nc.q_id = h.q_id AND nc.nprobe = h.nprobe""".stripMargin
  }

  // -------------------------------------------- q275 int8 recall audit

  /** q275: int8-quantization recall audit — rank by the cosine
    * RECONSTRUCTED from q73's symmetric int8 codes (per-vector max-abs
    * scale, codes in [−127, 127]) and report recall@[[K]] against the
    * float truth. Completes the quantization ladder's measured rungs:
    * q261/q266 price 1 bit/dim, q178/q180 price PQ codebooks, q221
    * prefix widths — this prices the 4× shrink every vector store offers
    * first (int8 with integer dot-product kernels). The candidate score
    * is (Σ ca·cb)·sa·sb/127² over the stored norms — the integer dot IS
    * the hot loop a SIMD kernel runs.
    *
    * Scale shape: both rankings are bounded broadcast probes (q25
    * shape); codes are one narrow HOF projection per vector; the integer
    * dot runs through the native VecDot on exactly-representable
    * small-integer doubles.
    *
    * Parity: codes/scales are the q73-proven exact quantization; the
    * code dot is an exact integer both engines; the reconstruction
    * multiplies it by r4'd scales and float-derived norms in identical
    * textual order, r4'd for the rank key; recall an exact ratio.
    */
  def int8Recall(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = col("embedding").cast("array<double>")
    val scale = r4(array_max(transform(emb, x => abs(x))))
    val code = (x: Column, s: Column) => coalesce(
      greatest(lit(-127L), least(lit(127L),
        floor(x / nullif(s, lit(0.0)) * 127 + 0.5).cast("long"))),
      lit(0L)).cast("double")
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), scale.as("sc"),
        norm(col("embedding")).as("nrm"))
      .select(col("vec_id"), col("embedding"), col("sc"), col("nrm"),
        transform(emb, x => code(x, col("sc"))).as("codes"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("sc").as("qsc"), col("nrm").as("qn"), col("codes").as("qc"))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    val exact = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")))
          .as("score"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= K).select(col("q_id"), col("n_id"))
    val approx = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qc"), col("codes")) * col("qsc") * col("sc") /
          (lit(127.0 * 127.0) * col("qn") * col("nrm"))).as("score"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= K).select(col("q_id"), col("n_id"))
    val hits = exact.join(approx, Seq("q_id", "n_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hit"), lit(0L)).cast("int").as("n_hit"),
        r4(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("k").cast("double")).as("recall"))
  }

  val int8RecallSql: String = {
    val codes = "list_transform(emb, x -> coalesce(greatest(-127, " +
      "least(127, floor(x / nullif(sc, 0) * 127 + 0.5)::BIGINT)), 0)::DOUBLE)"
    val cos = s"${dotSql("q.qv", "e.emb")} / (q.qn * e.nrm)"
    val acos = s"${dotSql("q.qc", "e.codes")} * q.qsc * e.sc / " +
      s"(${127.0 * 127.0} * q.qn * e.nrm)"
    s"""WITH e0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb,
       |         ${r4Sql("list_max(list_transform(list_transform(embedding, x -> x::DOUBLE), x -> abs(x)))")} AS sc,
       |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |e AS (SELECT vec_id, emb, sc, nrm, $codes AS codes FROM e0),
       |q AS (SELECT vec_id AS q_id, emb AS qv, sc AS qsc, nrm AS qn,
       |             codes AS qc
       |      FROM e WHERE vec_id < $NQueries),
       |exact AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.q_id, e.vec_id AS n_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${r4Sql(cos)} DESC, e.vec_id ASC) AS rn
       |    FROM q JOIN e ON q.q_id <> e.vec_id) WHERE rn <= $K),
       |approx AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.q_id, e.vec_id AS n_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${r4Sql(acos)} DESC, e.vec_id ASC) AS rn
       |    FROM q JOIN e ON q.q_id <> e.vec_id) WHERE rn <= $K),
       |hits AS (
       |  SELECT x.q_id, count(*)::BIGINT AS n_hit
       |  FROM exact x JOIN approx a ON x.q_id = a.q_id AND x.n_id = a.n_id
       |  GROUP BY 1),
       |ks AS (SELECT q_id, count(*)::BIGINT AS k FROM exact GROUP BY 1)
       |SELECT ks.q_id, coalesce(hits.n_hit, 0)::INT AS n_hit,
       |       ${r4Sql("coalesce(hits.n_hit, 0)::DOUBLE / ks.k::DOUBLE")} AS recall
       |FROM ks LEFT JOIN hits ON ks.q_id = hits.q_id""".stripMargin
  }

  // ----------------------------------- q266 binary prefilter + rescore

  /** Rerank depths swept by q266 (multiples of [[K]]). */
  val BqRerankDepths: Seq[Int] = Seq(1, 2, 4).map(_ * K)

  /** q266: binary-quantization prefilter + exact rescore — the way
    * production actually uses q261's 1-bit signatures: Hamming-select the
    * top-C candidates (C ∈ [[BqRerankDepths]]), rescore ONLY those with
    * exact cosine, take the top-[[K]], and report recall vs the exact
    * top-K at every depth. q261 measured the C = K floor; this is the
    * full recall-vs-rescore-cost dial — the float work drops from
    * corpus-sized to C per query while recall climbs back toward 1 with
    * C.
    *
    * Scale shape: one XOR+POPCNT probe (no float math) + per-(query,
    * depth) top-C/top-K windows over C-bounded frames; the exact-cosine
    * rescore touches ≤ max(C) rows per query. Same exact-truth side as
    * q261/q265.
    *
    * Parity: Hamming ranks exact ints with id ties; rescore on the r4'd
    * cosine; recall exact ratio r4'd.
    */
  def bqRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val packed = aggregate(
      transform(sequence(lit(0), lit(Dim - 1)),
        i => when(element_at(col("embedding"), i + 1).cast("double") > 0.0,
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), packed.as("sig"),
        norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("sig").as("qsig"), col("nrm").as("qn"))
    val maxC = BqRerankDepths.max
    val wHam = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col("n_id").asc)
    // ONE Hamming pass keeps the deepest prefilter; depths are slices of it
    val pre = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("qv"), col("qn"), col("vec_id").as("n_id"),
        col("embedding"), col("nrm"),
        bit_count(col("qsig").bitwiseXOR(col("sig"))).as("hamming"))
      .withColumn(s"hr", row_number().over(wHam))
      .filter(col("hr") <= maxC)
      .select(col("q_id"), col("hr"), col("n_id"),
        r4(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")))
          .as("score"))
    val sweep = pre.select(col("q_id"), col("hr"), col("n_id"), col("score"),
      explode(array(BqRerankDepths.map(lit): _*)).as("depth"))
      .filter(col("hr") <= col("depth"))
    val wk = Window.partitionBy(col("q_id"), col("depth"))
      .orderBy(col("score").desc, col("n_id").asc)
    val approx = sweep.withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= K).select(col("q_id"), col("depth"), col("n_id"))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    val exact = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        r4(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")))
          .as("score"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= K).select(col("q_id"), col("n_id"))
    val hits = exact.join(approx, Seq("q_id", "n_id"))
      .groupBy(col("q_id"), col("depth")).agg(count(lit(1)).as("n_hit"))
    val grid = sweep.groupBy(col("q_id"), col("depth"))
      .agg(count(lit(1)).as("n_rescored"))
    grid.join(hits, Seq("q_id", "depth"), "left")
      .select(col("q_id"), col("depth"), col("n_rescored"),
        coalesce(col("n_hit"), lit(0L)).cast("int").as("n_hit"),
        r4(coalesce(col("n_hit"), lit(0L)).cast("double") / K.toDouble)
          .as("recall"))
  }

  val bqRerankSql: String = {
    val pack = (e: String) =>
      s"""list_sum(list_transform(range(1, ${Dim + 1}),
         |  i -> CASE WHEN $e[i]::DOUBLE <= 0.0 THEN 0::BIGINT
         |            WHEN i = 64 THEN (-9223372036854775807 - 1)::BIGINT
         |            ELSE 1::BIGINT << (i - 1) END))::BIGINT""".stripMargin
    val maxC = BqRerankDepths.max
    val depths = BqRerankDepths.mkString(", ")
    val cos = s"${dotSql("q.qv", "e.embedding")} / (q.qn * e.nrm)"
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         ${pack("embedding").replace("\n", "\n         ")} AS sig,
       |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, sig AS qsig, nrm AS qn
       |      FROM e WHERE vec_id < $NQueries),
       |pre AS (
       |  SELECT q_id, hr, n_id, score FROM (
       |    SELECT q.q_id, e.vec_id AS n_id,
       |           ${r4Sql(cos)} AS score,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY bit_count(xor(q.qsig, e.sig)) ASC,
       |                      e.vec_id ASC) AS hr
       |    FROM q JOIN e ON q.q_id <> e.vec_id) WHERE hr <= $maxC),
       |sweep AS (
       |  SELECT q_id, hr, n_id, score, depth
       |  FROM pre, (SELECT unnest([$depths]) AS depth)
       |  WHERE hr <= depth),
       |approx AS (
       |  SELECT q_id, depth, n_id FROM (
       |    SELECT q_id, depth, n_id,
       |           row_number() OVER (PARTITION BY q_id, depth
       |             ORDER BY score DESC, n_id ASC) AS rn
       |    FROM sweep) WHERE rn <= $K),
       |exact AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.q_id, e.vec_id AS n_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${r4Sql(cos)} DESC, e.vec_id ASC) AS rn
       |    FROM q JOIN e ON q.q_id <> e.vec_id) WHERE rn <= $K),
       |hits AS (
       |  SELECT a.q_id, a.depth, count(*)::BIGINT AS n_hit
       |  FROM approx a JOIN exact x ON a.q_id = x.q_id AND a.n_id = x.n_id
       |  GROUP BY 1, 2),
       |grid AS (SELECT q_id, depth, count(*)::BIGINT AS n_rescored
       |         FROM sweep GROUP BY 1, 2)
       |SELECT g.q_id, g.depth, g.n_rescored,
       |       coalesce(h.n_hit, 0)::INT AS n_hit,
       |       ${r4Sql(s"coalesce(h.n_hit, 0)::DOUBLE / $K.0")} AS recall
       |FROM grid g LEFT JOIN hits h
       |  ON g.q_id = h.q_id AND g.depth = h.depth""".stripMargin
  }

  // --------------------------------- q260 lexical–semantic agreement

  /** q260: lexical–semantic agreement audit — over the q22 verified
    * near-dup candidate pairs, the Pearson correlation between n-gram
    * Jaccard (lexical similarity) and embedding cosine (semantic
    * similarity), plus both means. The cross-modal sanity check run
    * before trusting EITHER side alone: a healthy embedding gives high
    * correlation on verbatim-overlap pairs (they are paraphrases of
    * themselves); a LOW value means the embedding disagrees with surface
    * overlap — either the embedding is broken (fix before q115/q208 rely
    * on it) or the corpus has heavy templating that shares words but not
    * meaning (route to q72's boilerplate pass). One summary row.
    *
    * Scale shape: the q22 banded pipeline dominates (MaxPostings-capped,
    * never all-pairs); adds two id-keyed joins to the embedding table for
    * the candidate pairs only and ONE five-moment aggregation to a single
    * row.
    *
    * Parity: jaccard/cosine are r4'd upstream → their 1e4-grid
    * quantizations are EXACT integers; all five moments are
    * DECIMAL(38,0)/HUGEINT integer sums; Pearson is one arithmetic
    * expression over exact integers (identical textual order), with the
    * zero-variance corner pinned to 0.0 on both engines.
    */
  def lexicalSemanticCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val pairs = Dedup.minhashLsh(spark, sfDir)
    val withCos = pairs
      .join(e.select(col("vec_id").as("doc_a"), col("embedding").as("ea"),
        col("nrm").as("na")), "doc_a")
      .join(e.select(col("vec_id").as("doc_b"), col("embedding").as("eb"),
        col("nrm").as("nb")), "doc_b")
      .select(
        floor(col("jaccard") * 10000.0 + 0.5).cast("long").as("ji"),
        floor(r4(dot(col("ea"), col("eb")) / (col("na") * col("nb"))) *
          10000.0 + 0.5).cast("long").as("ci"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val m = withCos.agg(count(lit(1)).as("n"),
      sum(col("ji")).as("sx"), sum(col("ci")).as("sy"),
      sum(dec(col("ji")) * dec(col("ji"))).as("sxx"),
      sum(dec(col("ci")) * dec(col("ci"))).as("syy"),
      sum(dec(col("ji")) * dec(col("ci"))).as("sxy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(col("n").as("n_pairs"),
      r4(col("sx").cast("double") / (nD * 10000.0)).as("mean_jaccard"),
      r4(col("sy").cast("double") / (nD * 10000.0)).as("mean_cosine"),
      r4(when(vx * vy > 0.0, num / sqrt(vx * vy)).otherwise(0.0))
        .as("pearson"))
  }

  val lexicalSemanticCorrSql: String = {
    val cos = s"${dotSql("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm)"
    s"""WITH p AS (${Dedup.minhashLshSql.replace("\n", "\n  ")}),
       |e AS (SELECT vec_id, embedding,
       |             sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |      FROM embeddings),
       |g AS (
       |  SELECT floor(p.jaccard * 10000.0 + 0.5)::BIGINT AS ji,
       |         floor((${r4Sql(cos)}) * 10000.0 + 0.5)::BIGINT AS ci
       |  FROM p JOIN e ea ON p.doc_a = ea.vec_id
       |         JOIN e eb ON p.doc_b = eb.vec_id),
       |m AS (SELECT count(*)::BIGINT AS n,
       |             sum(ji)::BIGINT AS sx, sum(ci)::BIGINT AS sy,
       |             sum(ji::HUGEINT * ji)::HUGEINT AS sxx,
       |             sum(ci::HUGEINT * ci)::HUGEINT AS syy,
       |             sum(ji::HUGEINT * ci)::HUGEINT AS sxy
       |      FROM g)
       |SELECT n AS n_pairs,
       |       ${r4Sql("sx::DOUBLE / (n::DOUBLE * 10000.0)")} AS mean_jaccard,
       |       ${r4Sql("sy::DOUBLE / (n::DOUBLE * 10000.0)")} AS mean_cosine,
       |       ${r4Sql(
          "CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0.0 THEN (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) ELSE 0.0 END")}
       |         AS pearson
       |FROM m""".stripMargin
  }

  // -------------------------------------------- q251 source MMD (linear)

  /** Fixed-point scale for centroid components before the per-source
    * squared sums (the q109/q248 integer-sum discipline).
    */
  val MmdScale = 1000000000L

  /** q251: per-source embedding-space shift — the linear-kernel maximum
    * mean discrepancy MMD² = ‖μ_source − μ_corpus‖² between each source's
    * embedding distribution and the whole corpus, plus the source-centroid
    * norm. The embedding-space counterpart of q120/q124's scalar drift
    * tests and q222's funnel-shift audit: a source whose centroid sits far
    * from the corpus mean contributes a different REGION of embedding
    * space (worth its mixture slot; cf. q247's topic diversity), while a
    * centroid drifting between snapshots is the first symptom of a
    * scraper/extractor regression. Linear-kernel MMD on purpose: it is
    * exactly computable from per-component first moments — one scan, no
    * pairs.
    *
    * Scale shape: one explode of the (corpus-bounded) embedding table to
    * (source, pos) cells → hash agg to a |sources|×Dim grid; everything
    * after runs on the grid (totals are the grid re-aggregated — the
    * corpus is touched ONCE). The q111 moment-pass pattern with a source
    * key.
    *
    * Parity: components quantized to the q111 [[CovScale]] grid → SUMS
    * ARE EXACT INTEGERS; the two divisions per cell are deterministic
    * per-row doubles; centroid/diff components re-quantized to the
    * [[MmdScale]] grid so the Dim-term squared sums are exact integers in
    * DECIMAL(38,0)/HUGEINT; r4 at the output only.
    */
  def sourceMmd(spark: SparkSession, sfDir: String): DataFrame = {
    val cs = CovScale
    val ms = MmdScale
    val src = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val cells = Tables.embeddings(spark, sfDir)
      .join(src, col("vec_id") === col("doc_id"))
      .select(col("source"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("source"), col("pos"),
        floor(col("v").cast("double") * cs + 0.5).cast("long").as("q"))
      .groupBy(col("source"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
    val tot = cells.groupBy(col("pos"))
      .agg(sum(col("n")).as("nn"), sum(col("s")).as("ts"))
    val mean = (c: Column, n: Column) =>
      c.cast("double") / (n.cast("double") * cs.toDouble)
    val quant = (x: Column) => floor(x * ms + 0.5).cast("long")
    def dec(c: Column) = c.cast("decimal(38,0)")
    cells.join(broadcast(tot), "pos")
      .select(col("source"), col("n"),
        quant(mean(col("s"), col("n")) - mean(col("ts"), col("nn"))).as("di"),
        quant(mean(col("s"), col("n"))).as("ci"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n"),
        sum(dec(col("di")) * dec(col("di"))).as("d2"),
        sum(dec(col("ci")) * dec(col("ci"))).as("c2"))
      .select(col("source"), col("n"),
        r4(col("d2").cast("double") / (ms.toDouble * ms.toDouble)).as("mmd2"),
        r4(sqrt(col("c2").cast("double") / (ms.toDouble * ms.toDouble)))
          .as("centroid_norm"))
  }

  val sourceMmdSql: String = {
    val cs = CovScale
    val ms = MmdScale
    s"""WITH x AS (
       |  SELECT d.source, i AS pos,
       |         floor(e.embedding[i]::DOUBLE * $cs + 0.5)::BIGINT AS q
       |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id,
       |       range(1, ${Dim + 1}) r(i)),
       |g AS (SELECT source, pos, count(*)::BIGINT AS n, sum(q)::BIGINT AS s
       |      FROM x GROUP BY 1, 2),
       |t AS (SELECT pos, sum(n)::BIGINT AS nn, sum(s)::BIGINT AS ts
       |      FROM g GROUP BY 1),
       |ds AS (
       |  SELECT g.source, g.n,
       |         floor((g.s::DOUBLE / (g.n::DOUBLE * $cs.0)
       |                - t.ts::DOUBLE / (t.nn::DOUBLE * $cs.0)) * $ms + 0.5)::BIGINT AS di,
       |         floor((g.s::DOUBLE / (g.n::DOUBLE * $cs.0)) * $ms + 0.5)::BIGINT AS ci
       |  FROM g JOIN t USING (pos))
       |SELECT source, max(n) AS n,
       |       ${r4Sql(s"sum(di::HUGEINT * di)::DOUBLE / ${ms.toDouble * ms.toDouble}")} AS mmd2,
       |       ${r4Sql(s"sqrt(sum(ci::HUGEINT * ci)::DOUBLE / ${ms.toDouble * ms.toDouble})")}
       |         AS centroid_norm
       |FROM ds GROUP BY 1""".stripMargin
  }
}
