package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a ×N scale factor from an existing testdata directory — the
  * measured second point behind SURVEY §9's scale audit (sf1 ≈ 6M lineitem
  * rows / 50k documents from sf0.1 × 10).
  *
  * Replication is key-disjoint (every id column gets a per-replica stride
  * of 10⁷, far above any base key) so FK joins keep exactly ×N fan-out and
  * uniqueness invariants hold. Dimensions region/nation are FK targets
  * shared by all replicas and are copied as-is. Replica content is
  * DECORRELATED, not duplicated: document text goes through a per-replica
  * alphabet rotation (token structure, lengths and within-replica dup
  * relations preserved; cross-replica similarity destroyed) and embeddings
  * get per-(replica, dimension) sign flips — a naive byte-copy would make
  * every row a near-duplicate of its 9 clones and measure a pathological
  * O(N²·d²) dedup corpus instead of a scaled-up normal one.
  *
  * Usage: `runMain graft.tools.ScaleData <inDir> <outDir> [factor]
  * [redundant]`. The optional `redundant` mode additionally injects
  * SHARED passages into every [[RedundantEvery]]-th document (chosen from
  * [[RedundantPassages]] fixed [[RedundantPassageToks]]-token passages,
  * appended AFTER decorrelation so they are byte-identical across
  * replicas): each passage's occurrence count then grows linearly with
  * the corpus, so the q168/q169/q171 span family's OUTPUT grows with the
  * input instead of staying at the base corpus's constant duplicated mass
  * — the honest growth-curve stress the plain mode deliberately avoids
  * for every other operator. Passage length covers both span widths
  * (8-token q168 windows and 13-token q170 windows fit inside).
  */
object ScaleData {

  val Stride = 10000000L

  /** Redundant-mode knobs: 1 in `RedundantEvery` docs carries one of
    * `RedundantPassages` shared passages of `RedundantPassageToks` tokens.
    *
    * Every = 5 ON PURPOSE: injected ids land on BOTH sides of the mod-10
    * decontamination split (ids ≡ 0 and ≡ 5), so shared passages stress
    * the q170/q173 train×eval families too. The original Every = 10
    * coincided with `Dedup.DecontamEvalModulus` — every injected passage
    * fell in the eval split and the decontam growth curve measured a
    * structurally-zero hit set (flat by construction, not by merit).
    */
  val RedundantEvery = 5L
  val RedundantPassages = 40
  val RedundantPassageToks = 16

  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val n = if (args.length > 2) args(2).toInt else 10
    val redundant = args.length > 3 && args(3) == "redundant"
    val spark = graft.functions.chess.session("graft-scaledata",
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, in, out, n, redundant)
    spark.stop()
  }

  def generate(spark: SparkSession, in: String, out: String, n: Int,
      redundant: Boolean = false): Unit = {
    // the alphabet rotation is mod 26: replica k+26 would get byte-identical
    // text to replica k, silently building the pathological all-near-dup
    // corpus this tool exists to avoid
    require(n >= 1 && n <= 26,
      s"factor must be in [1, 26] (alphabet-rotation decorrelation), got $n")
    // Tables.table so events.ts lands in the int64-nanos contract (and the
    // scaled output is written back as plain int64 — self-describing)
    def read(t: String): DataFrame = graft.Tables.table(spark, in, t)
    def write(df: DataFrame, t: String, files: Int = 8): Unit =
      df.repartition(files).write.mode("overwrite").parquet(s"$out/$t.parquet")

    // FK-target dimensions: shared by every replica, copied as-is
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    def reps(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(n).toDF("rep"))
    def off(c: String): org.apache.spark.sql.Column =
      col(c) + col("rep") * Stride

    write(reps(read("customer")).select(
      off("c_custkey").as("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")), "customer")

    write(reps(read("supplier")).select(
      off("s_suppkey").as("s_suppkey"), col("s_name"), col("s_nationkey"),
      col("s_acctbal")), "supplier")

    write(reps(read("part")).select(
      off("p_partkey").as("p_partkey"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")), "part")

    write(reps(read("orders")).select(
      off("o_orderkey").as("o_orderkey"), off("o_custkey").as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")

    write(reps(read("lineitem")).select(
      off("l_orderkey").as("l_orderkey"), off("l_partkey").as("l_partkey"),
      off("l_suppkey").as("l_suppkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")), "lineitem", 16)

    // events.ts is int64 epoch-nanos under NanosFlag; replicas are new users
    // with the same activity pattern, so session/as-of state grows ×N in
    // users, not in per-user depth (the realistic shape)
    write(reps(read("events")).select(
      off("event_id").as("event_id"), col("ts"), off("user_id").as("user_id"),
      col("event_type"), col("value"), col("props")), "events")

    // alphabet rotation per replica: token i of replica k ≠ token i of
    // replica 0, but |tokens|, lengths, and within-replica equality are
    // preserved — replica 0 is the original corpus
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val rotations = (0 until n).map { k =>
      val rot = alpha.drop(k % 26) + alpha.take(k % 26)
      (rot + rot.toUpperCase)
    }
    val rotExpr = (0 until n).foldLeft(col("text")) { case (acc, k) =>
      when(col("rep") === k,
        translate(col("text"), alpha + alpha.toUpperCase, rotations(k))).otherwise(acc)
    }
    val docsPlain = reps(read("documents")).select(
      off("doc_id").as("doc_id"), rotExpr.as("text"), col("lang"),
      col("source"), col("n_chars"))
    val docs = if (!redundant) docsPlain else {
      // shared passages are injected AFTER rotation (byte-identical across
      // replicas) and keyed off the GLOBAL doc_id, so each of the P
      // passages lands in ~|docs|/(Every·P) documents spread over every
      // replica — occurrence counts grow linearly with corpus size.
      // Tokens contain digits, outside the rotation alphabet by design.
      val passages = array((0 until RedundantPassages).map { j =>
        lit((0 until RedundantPassageToks).map(t => s"sp${j}x$t").mkString(" "))
      }: _*)
      val injected = when(pmod(col("doc_id"), lit(RedundantEvery)) === 0L,
        concat_ws(" ", col("text"),
          element_at(passages,
            (pmod(call_function("div", col("doc_id"), lit(RedundantEvery)),
              lit(RedundantPassages.toLong)) + 1).cast("int"))))
        .otherwise(col("text"))
      docsPlain.select(col("doc_id"), injected.as("text"), col("lang"),
        col("source"),
        length(injected).cast(docsPlain.schema("n_chars").dataType).as("n_chars"))
    }
    write(docs, "documents")

    // per-(replica, dim) deterministic sign flips decorrelate replica
    // vectors (≈ orthogonal in expectation) while keeping norms identical
    write(reps(read("embeddings")).select(
      off("vec_id").as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(pmod(hash(col("rep"), i), lit(2)) === 1, -x).otherwise(x))
        .cast("array<float>").as("embedding"),
      col("label")), "embeddings")
  }
}
