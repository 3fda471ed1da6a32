package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Distinct-count aggregation with a switchable execution mode — the
  * [[Quantiles]] discipline applied to the NDV family (q76 profile, q112
  * dup-rate report, q114 join-cardinality audit).
  *
  * - `exact` (default): Spark `count_distinct` ≡ DuckDB
  *   `count(DISTINCT …)` — bit-parity with the oracles. Spark plans it as
  *   a two-phase EXPAND + hash aggregation: correct and skew-tolerant,
  *   but the distinct keys themselves shuffle — on a 100 TB corpus whose
  *   audited column is near-unique (fingerprints, order keys) that is a
  *   corpus-sized exchange per audited column.
  * - `approx`: Spark `approx_count_distinct` — HLL++ with relative error
  *   ≤ [[Rsd]], a CONSTANT-size mergeable sketch per group, map-side
  *   combinable, no distinct-key shuffle at all. The q56 sketch suite
  *   already proves the estimator's bounds against exact values;
  *   NdvSpec asserts the same contract on these operators' own columns
  *   and runs the family end-to-end in approx mode.
  *
  * Same session-conf contract as [[Quantiles]]: the mode is read at
  * plan-construction time, so one code path serves the correctness gate
  * (exact) and the scale deployment (`graft.ndv.mode=approx`) — every
  * family member switches together.
  */
object Ndv {

  /** Session-conf key selecting the distinct-count implementation:
    * "exact" (default) or "approx".
    */
  val ModeKey = "graft.ndv.mode"

  /** approx_count_distinct maximum estimation error (HLL++ relative
    * standard deviation).
    */
  val Rsd = 0.01

  def isApprox(spark: SparkSession): Boolean =
    spark.conf.getOption(ModeKey).exists(_.equalsIgnoreCase("approx"))

  /** Distinct-count aggregate in the session's mode. Result is BIGINT in
    * both modes.
    */
  def countDistinct(spark: SparkSession, c: Column): Column =
    if (isApprox(spark)) approx_count_distinct(c, Rsd) else count_distinct(c)
}
