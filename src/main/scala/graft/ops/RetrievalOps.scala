package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpointing.LineageSyntax
import graft.Tables

/** Hybrid-retrieval composition: reciprocal-rank fusion (Cormack, Clarke &
  * Buettcher 2009) of the two first-stage rankers the repo already gates —
  * BM25 lexical scoring (q141) and embedding cosine similarity (the q25
  * family) — into the single list a RAG / curation pipeline actually
  * consumes. RRF is the standard fusion because it needs no score
  * calibration between rankers: only ranks enter, score = Σ 1/(k + rank).
  *
  * The retrieval key: `documents.doc_id` and `embeddings.vec_id` are
  * parallel tables in the testdata (row i's embedding encodes document i),
  * so the fusion join is doc_id = vec_id — exactly the layout a production
  * corpus keeps (text and vectors sharded by the same key, so this join
  * co-locates and never shuffles the corpus side).
  *
  * Scale shape: each ranker contributes a top-[[RrfPoolK]] POOL, cut by a
  * distributed TakeOrdered (orderBy + limit — no global window; the
  * suite-wide partition-less-window invariant holds by construction).
  * Rank positions are then assigned by sorting the pool INSIDE one
  * collected array (constant-size: [[RrfPoolK]] structs) and posexploding
  * — the block-local-sort discipline of the SNM family, on a block whose
  * size is a config constant, not data. The fusion itself is a full-outer
  * join of two 20-row frames: nothing corpus-sized moves.
  *
  * Parity: both pool orderings use values already r4-floored (BM25 scores,
  * cosine), with doc-id tie-breaks; the RRF sum is two fixed-order double
  * terms, r4'd. Rank ties after rounding (1/(60+a)+1/(60+b) collisions at
  * 4 decimals) don't exist in the OUTPUT because ranks, not fused scores,
  * are the published columns next to the rounded score.
  */
object RetrievalOps {

  /** Standard RRF damping constant (TREC convention). */
  val RrfK = 60

  /** Per-ranker candidate pool size. */
  val RrfPoolK = 20

  /** The fixed semantic query: embedding row [[RrfQueryVec]] stands in for
    * the encoded user query (the lexical side's query is [[TextOps.Bm25Terms]]).
    */
  val RrfQueryVec = 0L

  private def r4(c: Column) = Portable.r4(c)
  private def dot(a: Column, b: Column): Column = graft.functions.chess.vecDot(a, b)

  /** Positions 1..n of a pool DataFrame (id, score) sorted by (score desc,
    * id asc) — collect the bounded pool, sort in-array, posexplode.
    */
  private def rankPool(pool: DataFrame, rankCol: String): DataFrame =
    pool
      .agg(sort_array(collect_list(struct((col("score") * lit(-1.0)).as("negs"),
        col("doc_id")))).as("ps"))
      .select(posexplode(col("ps")).as(Seq("pos", "x")))
      .select(col("x.doc_id").as("doc_id"), (col("pos") + 1).cast("int").as(rankCol))

  /** q179: RRF fusion of the BM25 top pool and the cosine top pool.
    * Output: doc_id, each ranker's rank (0 = not in that ranker's pool),
    * and the fused RRF score.
    */
  def rrfFusion(spark: SparkSession, sfDir: String): DataFrame = {
    val lexPool = TextOps.bm25(spark, sfDir)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(RrfPoolK)
    val lex = rankPool(lexPool, "r_lex")

    val e = Tables.embeddingsPar(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val q = e.filter(col("vec_id") === RrfQueryVec)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val semPool = e.filter(col("vec_id") =!= RrfQueryVec).crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        r4(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm"))).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(RrfPoolK)
    val sem = rankPool(semPool, "r_sem")

    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("r_lex"), lit(0)).as("r_lex"),
        coalesce(col("r_sem"), lit(0)).as("r_sem"),
        r4(coalesce(lit(1.0) / (lit(RrfK) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("r_sem")), lit(0.0))).as("rrf"))
  }

  val rrfFusionSql: String = {
    val cos = Portable.dotSql("q.embedding", "e.embedding")
    val qn = s"sqrt(${Portable.dotSql("q.embedding", "q.embedding")})"
    val en = s"sqrt(${Portable.dotSql("e.embedding", "e.embedding")})"
    s"""WITH lexr AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r_lex
       |  FROM (${TextOps.bm25Sql})
       |  QUALIFY r_lex <= $RrfPoolK),
       |sem AS (
       |  SELECT e.vec_id AS doc_id,
       |         ${Portable.r4Sql(s"$cos / ($qn * $en)")} AS score
       |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = $RrfQueryVec) q
       |  WHERE e.vec_id <> $RrfQueryVec),
       |semr AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r_sem
       |  FROM sem
       |  QUALIFY r_sem <= $RrfPoolK)
       |SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
       |       coalesce(l.r_lex, 0)::INT AS r_lex,
       |       coalesce(s.r_sem, 0)::INT AS r_sem,
       |       ${Portable.r4Sql(
              s"coalesce(1.0 / ($RrfK + l.r_lex), 0.0) + coalesce(1.0 / ($RrfK + s.r_sem), 0.0)")} AS rrf
       |FROM lexr l FULL JOIN semr s ON l.doc_id = s.doc_id""".stripMargin
  }

  // --------------------------------------------------- q229 graded nDCG

  /** Evaluation depth of the graded ranking metric. */
  val NdcgK = 10

  /** Prefix width of the truncated-embedding ranker under evaluation (the
    * q221 Matryoshka serving configuration).
    */
  val NdcgTruncDim = 16

  /** Graded-relevance bands derived from the EXACT full-dim cosine
    * ranking: ranks 1..5 → grade 3, 6..20 → grade 2, 21..50 → grade 1,
    * beyond → 0. Gain = 2^grade − 1 (7/3/1/0), the standard exponential
    * gain.
    */
  val NdcgGradeCuts: Seq[(Int, Int)] = Seq(5 -> 3, 20 -> 2, 50 -> 1)

  /** q229: nDCG@k of the serving-stack rankers against exact semantic
    * truth (Järvelin & Kekäläinen 2002) — the GRADED companion to the
    * flat recall/MRR audits (q138/q163): relevance bands come from the
    * exact full-dimension cosine ranking, and each production ranker —
    * BM25 lexical (q141), the Matryoshka-truncated 16-dim cosine (q221's
    * serving config), and the RRF hybrid (q179) — is scored by how much
    * graded gain its top-k retains, position-discounted by log2(pos+1).
    * This is the number a retrieval stack owner actually tracks: recall@k
    * treats rank 1 and rank k the same; nDCG charges for putting the
    * grade-3 docs late.
    *
    * Scale shape: the only corpus-sized work is the three score scans
    * (each one broadcast-query map + TakeOrdered pool cut — no global
    * window on the Spark side, the q179 discipline). Everything after
    * operates on ≤ 50-row pools: grades, ideal gains, and the per-ranker
    * join are constant-size regardless of corpus, so the metric costs
    * three scans at 100 TB, not a sort.
    *
    * Parity: grades and gains are exact integers from r4'd-score
    * orderings with doc_id tie-breaks; the DCG sum is ≤ k double terms,
    * r4'd once (log2 vs ln/ln(2) libm skew is far inside the grid).
    */
  def ndcg(spark: SparkSession, sfDir: String): DataFrame = {
    val gradeMax = NdcgGradeCuts.map(_._1).max
    val e = Tables.embeddingsPar(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val q = e.filter(col("vec_id") === RrfQueryVec)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))

    // exact full-dim cosine → graded pool (top-50, rank → grade)
    val exactPool = e.filter(col("vec_id") =!= RrfQueryVec)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        r4(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")))
          .as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(gradeMax)
    val grades = rankPool(exactPool, "xr")
      .select(col("doc_id"),
        NdcgGradeCuts.foldRight(lit(0)) { case ((cut, g), rest) =>
          when(col("xr") <= cut, lit(g)).otherwise(rest) }.as("grade"))
      .lineageCheckpoint() // 50 rows; feeds IDCG + all three rankers

    val gain = // 2^grade - 1 as an exact integer map
      when(col("grade") === 3, 7L).when(col("grade") === 2, 3L)
        .when(col("grade") === 1, 1L).otherwise(0L)
    val idcg = grades
      .agg(sort_array(collect_list(col("grade")), asc = false).as("gs"))
      .select(posexplode(slice(col("gs"), 1, NdcgK)).as(Seq("p", "grade")))
      .agg(r4(sum(gain.cast("double") /
        log(2.0, col("p").cast("double") + 2.0))).as("idcg"))

    // the three rankers' top-k pools
    val lexPool = TextOps.bm25(spark, sfDir)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(NdcgK)
    val truncPool = e.filter(col("vec_id") =!= RrfQueryVec)
      .select(col("vec_id"),
        slice(col("embedding"), 1, NdcgTruncDim).as("tv"))
      .crossJoin(broadcast(q
        .select(slice(col("qv"), 1, NdcgTruncDim).as("tq"))))
      .select(col("vec_id").as("doc_id"),
        r4(dot(col("tq"), col("tv")) /
          (sqrt(dot(col("tq"), col("tq"))) * sqrt(dot(col("tv"), col("tv")))))
          .as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(NdcgK)
    val rrfPool = rrfFusion(spark, sfDir)
      .select(col("doc_id"), col("rrf").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(NdcgK)

    def dcgOf(name: String, pool: DataFrame): DataFrame =
      rankPool(pool, "pos")
        .join(grades, Seq("doc_id"), "left")
        .agg(
          sum(when(col("grade").isNotNull && col("grade") > 0, 1L)
            .otherwise(0L)).as("n_graded"),
          r4(sum(coalesce(gain, lit(0L)).cast("double") /
            log(2.0, col("pos").cast("double") + 1.0))).as("dcg"))
        .select(lit(name).as("ranker"), lit(NdcgK).as("k"),
          col("n_graded"), col("dcg"))

    Seq("bm25" -> lexPool, "trunc16" -> truncPool, "rrf" -> rrfPool)
      .map { case (n, p) => dcgOf(n, p) }
      .reduce(_ unionByName _)
      .crossJoin(broadcast(idcg))
      .select(col("ranker"), col("k"), col("n_graded"), col("dcg"),
        col("idcg"), r4(col("dcg") / col("idcg")).as("ndcg"))
  }

  // ------------------------------------------- q240 MMR diversification

  /** MMR pool size, picks, and the relevance/diversity mix. λ and (1−λ)
    * are SEPARATE constants interpolated into both plans: computing
    * `1 − 0.7` at runtime yields 0.30000000000000004 on either engine
    * but only if BOTH compute it — pinning 0.3 as a literal removes the
    * question.
    */
  val MmrPoolK = 10
  val MmrK = 5
  val MmrLambda = 0.7
  val MmrOneMinusLambda = 0.3

  /** q240: Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) — the serving-side twin of the dedup stack: the q179 fused
    * pool routinely carries near-duplicate documents (this corpus is
    * FULL of them by construction), and a RAG context window filled
    * with five copies of the same passage wastes four slots. MMR picks
    * [[MmrK]] results greedily, each maximizing λ·relevance −
    * (1−λ)·max-similarity-to-already-picked, so every slot pays for
    * marginal information, not repeated relevance. Output: pick rank,
    * the document, its relevance, its max similarity to the prior
    * picks, and the MMR score it won with.
    *
    * Scale shape: the corpus-sized work is q179's two ranker scans; MMR
    * itself runs on a [[MmrPoolK]]-row pool — the pool and its pairwise
    * cosine matrix (≤ K·(K−1)/2 values) collect to the driver (the
    * rankPool bounded-frame discipline, same class as the BPE round
    * probes) and the greedy loop is O(K²·picks) scalar work. At 100 TB
    * nothing changes: pool size is a config constant.
    *
    * Parity: relevance is the r4'd RRF score; similarities r4 before
    * the loop; the selection score λ·rel − (1−λ)·maxsim combines r4'd
    * inputs with shared literals, so both engines compare identical
    * doubles, ties broken by doc_id. The oracle unrolls the same greedy
    * as [[MmrK]] SQL stages.
    */
  def mmrRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val pool = rrfFusion(spark, sfDir)
      .select(col("doc_id"), col("rrf").as("rel"))
      .orderBy(col("rel").desc, col("doc_id").asc).limit(MmrPoolK)
    val e = Tables.embeddingsPar(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val withVec = pool.join(e, pool("doc_id") === e("vec_id"))
      .select(col("doc_id"), col("rel"), col("embedding"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Float](2).toArray, r.getDouble(3)))
      .sortBy(t => (-t._2, t._1))
    def r4d(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    def cos(a: (Long, Double, Array[Float], Double),
        b: (Long, Double, Array[Float], Double)): Double = {
      // index-ordered double sum — the VecDot contract
      var s = 0.0
      var i = 0
      while (i < a._3.length) { s += a._3(i).toDouble * b._3(i).toDouble; i += 1 }
      r4d(s / (a._4 * b._4))
    }
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Double, Double, Double)]
    var remaining = withVec.toList
    var picked = List.empty[(Long, Double, Array[Float], Double)]
    (1 to math.min(MmrK, withVec.length)).foreach { rank =>
      val scored = remaining.map { cand =>
        val ms = if (picked.isEmpty) 0.0 else picked.map(p => cos(cand, p)).max
        val score = MmrLambda * cand._2 - MmrOneMinusLambda * ms
        (cand, ms, score)
      }
      val best = scored.minBy { case (c, _, s) => (-s, c._1) }
      selected += ((rank, best._1._1, best._1._2, r4d(best._2),
        r4d(best._3)))
      picked = best._1 :: picked
      remaining = remaining.filterNot(_._1 == best._1._1)
    }
    import spark.implicits._
    selected.toSeq.toDF("pick", "doc_id", "rel", "max_sim_prev", "mmr")
  }

  val mmrRerankSql: String = {
    val cosAB = Portable.dotSql("ea.embedding", "eb.embedding")
    val na = s"sqrt(${Portable.dotSql("ea.embedding", "ea.embedding")})"
    val nb = s"sqrt(${Portable.dotSql("eb.embedding", "eb.embedding")})"
    // greedy unroll: selK = the k-th pick; each stage scores the pool
    // minus prior picks against the union of prior picks
    val stages = (2 to MmrK).map { k =>
      val prior = (1 until k).map(j => s"SELECT * FROM sel$j")
        .mkString(" UNION ALL ")
      s"""cand$k AS (
         |  SELECT p.doc_id, p.rel,
         |         (SELECT max(s.sim) FROM sim s
         |          WHERE (s.da = p.doc_id AND s.db IN (SELECT doc_id FROM ($prior)))
         |             OR (s.db = p.doc_id AND s.da IN (SELECT doc_id FROM ($prior))))
         |           AS ms
         |  FROM pool p
         |  WHERE p.doc_id NOT IN (SELECT doc_id FROM ($prior))),
         |sel$k AS (
         |  SELECT $k AS pick, doc_id, rel, ms,
         |         $MmrLambda * rel - $MmrOneMinusLambda * ms AS score
         |  FROM cand$k
         |  ORDER BY score DESC, doc_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to MmrK).map(k => s"SELECT * FROM sel$k")
      .mkString("\nUNION ALL\n")
    s"""WITH pool AS (
       |  SELECT doc_id, rrf AS rel FROM (${rrfFusionSql.replace("\n", "\n  ")})
       |  ORDER BY rrf DESC, doc_id ASC LIMIT $MmrPoolK),
       |sim AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db,
       |         ${Portable.r4Sql(s"$cosAB / ($na * $nb)")} AS sim
       |  FROM pool a JOIN pool b ON a.doc_id < b.doc_id
       |  JOIN embeddings ea ON ea.vec_id = a.doc_id
       |  JOIN embeddings eb ON eb.vec_id = b.doc_id),
       |sel1 AS (
       |  SELECT 1 AS pick, doc_id, rel, 0.0 AS ms,
       |         $MmrLambda * rel AS score
       |  FROM pool ORDER BY rel DESC, doc_id ASC LIMIT 1),
       |$stages
       |SELECT pick::INT AS pick, doc_id, ${Portable.r4Sql("rel")} AS rel,
       |       ${Portable.r4Sql("ms")} AS max_sim_prev,
       |       ${Portable.r4Sql("score")} AS mmr
       |FROM ($unionAll)""".stripMargin
  }

  val ndcgSql: String = {
    val gradeMax = NdcgGradeCuts.map(_._1).max
    val cos = Portable.dotSql("q.embedding", "e.embedding")
    val qn = s"sqrt(${Portable.dotSql("q.embedding", "q.embedding")})"
    val en = s"sqrt(${Portable.dotSql("e.embedding", "e.embedding")})"
    val tdot = Portable.dotSql("tq.v", "te.v", NdcgTruncDim)
    val tqn = s"sqrt(${Portable.dotSql("tq.v", "tq.v", NdcgTruncDim)})"
    val ten = s"sqrt(${Portable.dotSql("te.v", "te.v", NdcgTruncDim)})"
    val gradeCase = NdcgGradeCuts
      .map { case (cut, g) => s"WHEN xr <= $cut THEN $g" }
      .mkString("CASE ", " ", " ELSE 0 END")
    val gainOf = "CASE grade WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END"
    def dcgSel(name: String, pool: String) =
      s"""SELECT '$name' AS ranker, $NdcgK AS k,
         |       sum(CASE WHEN g.grade > 0 THEN 1 ELSE 0 END)::BIGINT
         |         AS n_graded,
         |       ${Portable.r4Sql(
              s"sum(coalesce($gainOf, 0)::DOUBLE / log2(pos::DOUBLE + 1.0))")}
         |         AS dcg
         |FROM $pool p LEFT JOIN grades g USING (doc_id)""".stripMargin
    s"""WITH ex AS (
       |  SELECT e.vec_id AS doc_id,
       |         ${Portable.r4Sql(s"$cos / ($qn * $en)")} AS score
       |  FROM embeddings e,
       |       (SELECT embedding FROM embeddings WHERE vec_id = $RrfQueryVec) q
       |  WHERE e.vec_id <> $RrfQueryVec),
       |grades AS (
       |  SELECT doc_id, $gradeCase AS grade FROM (
       |    SELECT doc_id,
       |           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS xr
       |    FROM ex QUALIFY xr <= $gradeMax)),
       |idcg AS (
       |  SELECT ${Portable.r4Sql(
            s"sum($gainOf::DOUBLE / log2(rn::DOUBLE + 1.0))")} AS idcg
       |  FROM (SELECT grade, row_number() OVER (ORDER BY grade DESC) AS rn
       |        FROM grades QUALIFY rn <= $NdcgK)),
       |lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC)
       |           AS pos
       |  FROM (${TextOps.bm25Sql}) QUALIFY pos <= $NdcgK),
       |tv AS (SELECT vec_id, embedding[1:$NdcgTruncDim] AS v
       |       FROM embeddings),
       |trunc AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC)
       |           AS pos
       |  FROM (
       |    SELECT te.vec_id AS doc_id,
       |           ${Portable.r4Sql(s"$tdot / ($tqn * $ten)")} AS score
       |    FROM tv te, (SELECT v FROM tv WHERE vec_id = $RrfQueryVec) tq
       |    WHERE te.vec_id <> $RrfQueryVec)
       |  QUALIFY pos <= $NdcgK),
       |rrfq AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY rrf DESC, doc_id ASC)
       |           AS pos
       |  FROM (${rrfFusionSql.replace("\n", "\n  ")})
       |  QUALIFY pos <= $NdcgK),
       |d AS (
       |  ${dcgSel("bm25", "lex")}
       |  UNION ALL
       |  ${dcgSel("trunc16", "trunc")}
       |  UNION ALL
       |  ${dcgSel("rrf", "rrfq")})
       |SELECT ranker, k, n_graded, dcg, idcg.idcg,
       |       ${Portable.r4Sql("dcg / idcg.idcg")} AS ndcg
       |FROM d, idcg""".stripMargin
  }

  // ------------------------------------------ q276 ranker Kendall tau-b

  /** Rank assigned to a pool member the OTHER ranker did not retrieve
    * (one past the pool: "beyond my top-[[RrfPoolK]]" — ties among all
    * missing items, handled by τ-b's tie terms).
    */
  val KendallMissRank = RrfPoolK + 1

  /** q276: Kendall τ-b between the two q179 rankers (BM25 lexical vs
    * dense cosine) over their pool UNION. q179 fuses the rankers and
    * q229 grades each against truth; τ-b measures how much they AGREE
    * with each other — the fusion-design diagnostic (RRF only helps when
    * the rankers disagree enough to be complementary; τ → 1 means one
    * ranker is redundant), with the tie-aware form because out-of-pool
    * members tie at [[KendallMissRank]]. One summary row with the full
    * pair accounting.
    *
    * Scale shape: corpus work = q179's two scans (pool building); the τ
    * computation is a self-join over the ≤ 2·[[RrfPoolK]]-row pool
    * union — a bounded constant frame (the q240 pool discipline).
    *
    * Parity: ranks/concordance counts exact integers; τ-b is one
    * expression over exact ints with the zero-variance corner pinned.
    */
  def kendallRankers(spark: SparkSession, sfDir: String): DataFrame = {
    val fused = rrfFusion(spark, sfDir)
      .select(col("doc_id"),
        when(col("r_lex") === 0, KendallMissRank).otherwise(col("r_lex"))
          .as("rl"),
        when(col("r_sem") === 0, KendallMissRank).otherwise(col("r_sem"))
          .as("rs"))
    val b = fused.select(col("doc_id").as("doc_b"), col("rl").as("rl2"),
      col("rs").as("rs2"))
    val pairs = fused.join(b, col("doc_id") < col("doc_b"))
      .select(
        signum(col("rl") - col("rl2")).as("dx"),
        signum(col("rs") - col("rs2")).as("dy"))
    val agg = pairs.agg(count(lit(1)).as("n0"),
      sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L)).as("c"),
      sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L)).as("d"),
      sum(when(col("dx") === 0 && col("dy") =!= 0, 1L).otherwise(0L)).as("tx"),
      sum(when(col("dy") === 0 && col("dx") =!= 0, 1L).otherwise(0L)).as("ty"),
      sum(when(col("dx") === 0 && col("dy") === 0, 1L).otherwise(0L)).as("txy"))
    val den = sqrt((col("n0") - col("tx") - col("txy")).cast("double") *
      (col("n0") - col("ty") - col("txy")).cast("double"))
    agg.select(col("n0").as("n_pairs"), col("c").as("concordant"),
      col("d").as("discordant"), col("tx").as("ties_lex"),
      col("ty").as("ties_sem"), col("txy").as("ties_both"),
      Portable.r4(when(den > 0.0,
        (col("c") - col("d")).cast("double") / den).otherwise(0.0))
        .as("tau_b"))
  }

  val kendallRankersSql: String = {
    val m = KendallMissRank
    val den = "sqrt((n0 - tx - txy)::DOUBLE * (n0 - ty - txy)::DOUBLE)"
    s"""WITH f AS (${rrfFusionSql.replace("\n", "\n  ")}),
       |r AS (SELECT doc_id,
       |             CASE WHEN r_lex = 0 THEN $m ELSE r_lex END AS rl,
       |             CASE WHEN r_sem = 0 THEN $m ELSE r_sem END AS rs
       |      FROM f),
       |p AS (
       |  SELECT sign(a.rl - b.rl) AS dx, sign(a.rs - b.rs) AS dy
       |  FROM r a JOIN r b ON a.doc_id < b.doc_id),
       |agg AS (
       |  SELECT count(*)::BIGINT AS n0,
       |         sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END)::BIGINT AS c,
       |         sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END)::BIGINT AS d,
       |         sum(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END)::BIGINT AS tx,
       |         sum(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END)::BIGINT AS ty,
       |         sum(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END)::BIGINT AS txy
       |  FROM p)
       |SELECT n0 AS n_pairs, c AS concordant, d AS discordant,
       |       tx AS ties_lex, ty AS ties_sem, txy AS ties_both,
       |       ${Portable.r4Sql(
          s"CASE WHEN $den > 0.0 THEN (c - d)::DOUBLE / $den ELSE 0.0 END")}
       |         AS tau_b
       |FROM agg""".stripMargin
  }
}
