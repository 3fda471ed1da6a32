package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

    val e = Tables.embeddings(spark, sfDir)
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
}
