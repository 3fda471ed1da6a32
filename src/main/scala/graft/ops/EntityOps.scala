package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Entity-resolution operators — canonical-key blocking + edit-distance
  * verification, the string-side sibling of the shingle/LSH dedup stack
  * (which finds near-dup DOCUMENTS; this finds variant spellings of the
  * same ENTITY NAME).
  */
object EntityOps {

  /** q87: entity canonicalization — block part names on their sorted word
    * multiset (finds reordered/duplicated names in one equi-shuffle), pick
    * the min-string representative per block, and measure surface spread
    * as levenshtein distance to the representative (both engines implement
    * the classic integer DP — exact parity).
    *
    * Deliberately NOT pair-shaped: within-block all-pairs levenshtein is
    * O(b²) per block and blocks grow with the corpus — distance-to-
    * representative is O(b) and answers the curation question (how noisy
    * is this entity's surface form?). Two shuffles on the canonical key
    * (rep election + spread agg), no fan-out, no cap needed.
    */
  def canonicalize(spark: SparkSession, sfDir: String): DataFrame =
    canonicalizeNames(Tables.part(spark, sfDir), "p_name")

  /** The generic kernel of q87 (any table, any name column) — also the
    * spec surface: the gate data's names carry no typos (dist 0
    * everywhere), so EntityOpsSpec drives this with real variant
    * spellings to pin rep election and distance semantics.
    */
  def canonicalizeNames(df: DataFrame, nameCol: String): DataFrame = {
    val named = df.select(
      col(nameCol).as("name"),
      array_join(array_sort(split(col(nameCol), " ")), " ").as("ck"))
    val reps = named.groupBy(col("ck")).agg(
      min(col("name")).as("rep"),
      count(lit(1)).as("n_variants"),
      countDistinct(col("name")).as("n_names"))
    named.join(reps, "ck")
      .select(col("ck"), col("rep"), col("n_variants"), col("n_names"),
        levenshtein(col("name"), col("rep")).as("d"))
      .groupBy(col("ck"), col("rep"), col("n_variants"), col("n_names"))
      .agg(max(col("d")).as("max_dist"),
        Portable.r4(avg(col("d"))).as("avg_dist"))
      .filter(col("n_variants") >= 2)
  }

  val canonicalizeSql: String =
    s"""WITH named AS (
       |  SELECT p_partkey, p_name,
       |         list_aggr(list_sort(string_split(p_name, ' ')),
       |                   'string_agg', ' ') AS ck
       |  FROM part),
       |reps AS (
       |  SELECT ck, min(p_name) AS rep, count(*) AS n_variants,
       |         count(DISTINCT p_name) AS n_names
       |  FROM named GROUP BY 1)
       |SELECT ck, rep, n_variants, n_names,
       |       max(levenshtein(p_name, rep))::INT AS max_dist,
       |       ${Portable.r4Sql("avg(levenshtein(p_name, rep))")} AS avg_dist
       |FROM named JOIN reps USING (ck)
       |GROUP BY 1, 2, 3, 4
       |HAVING n_variants >= 2""".stripMargin

  // ------------------------------------------------ q130 golden record

  /** Which customers exist in the second source system (constant shared
    * with the oracle): every key not divisible by 3.
    */
  val GoldenSrcBMod = 3

  /** q130: golden-record survivorship — merge each entity's records from
    * two source systems into one master record under explicit
    * per-attribute survivorship rules: longest-then-max name (prefers the
    * richer surface form deterministically), max account balance, any
    * non-null segment (source B doesn't track it). This is the MDM step
    * AFTER matching: q87/q121 decide which records are the same entity;
    * this decides what the merged record SAYS. The second source is
    * synthesized deterministically (upper-cased name, +1% balance, null
    * segment for keys ∉ 3ℤ) so all rules are exercised, nulls included.
    *
    * Scale shape: one union + ONE hash aggregation keyed by the entity id
    * — every rule is an argmax/max/count aggregate (max(struct) for the
    * composite name rule, the q06 kernel), map-side combinable, no
    * window, no join after the union. Null attributes lose to any
    * non-null under max on both engines by SQL aggregate semantics.
    */
  def goldenRecord(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val srcA = c.select(col("c_custkey"), col("c_name"),
      col("c_acctbal"), col("c_mktsegment"))
    val srcB = c.filter(col("c_custkey") % GoldenSrcBMod =!= 0)
      .select(col("c_custkey"), upper(col("c_name")).as("c_name"),
        (floor(col("c_acctbal") * 1.01 * 100.0 + 0.5) / 100.0).as("c_acctbal"),
        lit(null).cast("string").as("c_mktsegment"))
    srcA.unionByName(srcB)
      .groupBy(col("c_custkey"))
      .agg(
        max(struct(length(col("c_name")).as("l"), col("c_name").as("n"))).as("best"),
        max(col("c_acctbal")).as("acctbal"),
        max(col("c_mktsegment")).as("mktsegment"),
        count(lit(1)).as("n_sources"))
      .select(col("c_custkey"), col("best.n").as("name"),
        col("acctbal"), col("mktsegment"), col("n_sources"))
  }

  val goldenRecordSql: String =
    s"""WITH recs AS (
       |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
       |  UNION ALL
       |  SELECT c_custkey, upper(c_name),
       |         floor(c_acctbal * 1.01 * 100.0 + 0.5) / 100.0,
       |         NULL
       |  FROM customer WHERE c_custkey % $GoldenSrcBMod <> 0)
       |SELECT c_custkey,
       |       struct_extract(max({'l': length(c_name), 'n': c_name}), 'n') AS name,
       |       max(c_acctbal) AS acctbal,
       |       max(c_mktsegment) AS mktsegment,
       |       count(*) AS n_sources
       |FROM recs GROUP BY 1""".stripMargin
}
