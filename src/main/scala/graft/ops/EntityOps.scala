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
}
