package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Percentile aggregation with a switchable execution mode — the one knob
  * that separates "passes the oracle at sf1" from "the plan you'd ship at
  * 100 TB" for the quantile-broadcast family (q86 winsorize, q88 equi-depth,
  * q105 adaptive quality, q119 MAD, q149 dataset card, q162 conversion
  * latency).
  *
  * - `exact` (default): Spark `percentile` ≡ DuckDB `quantile_cont` —
  *   bit-parity with the oracles, but the aggregator buffers every value of
  *   the group. At TPC-H scale factors that is fine; on an arbitrary 100 TB
  *   corpus it is the one remaining per-group value-buffering shape in the
  *   suite.
  * - `approx`: Spark `approx_percentile` — a mergeable quantile sketch
  *   (Greenwald–Khanna style) with bounded rank error ≤ 1/[[Accuracy]] and
  *   CONSTANT memory per group, the same partial-aggregation plan shape
  *   (map-side combinable, broadcastable one-row-per-group cut table).
  *   No cross-engine oracle exists for the sketch (the q56 precedent);
  *   QuantilesSpec instead asserts the rank-error contract against the
  *   exact cut on the same data.
  *
  * The mode is read from the session conf at plan-construction time, so the
  * SAME operator code path serves both the correctness gate (exact) and the
  * scale deployment (approx) — set `graft.quantiles.mode=approx` on the
  * cluster session and every family member switches together.
  */
object Quantiles {

  /** Session-conf key selecting the percentile implementation:
    * "exact" (default) or "approx".
    */
  val ModeKey = "graft.quantiles.mode"

  /** approx_percentile accuracy: rank error ≤ 1/Accuracy (1e-4 here), at
    * ~Accuracy buffered samples per group — constant in the corpus size.
    */
  val Accuracy = 10000

  def isApprox(spark: SparkSession): Boolean =
    spark.conf.getOption(ModeKey).exists(_.equalsIgnoreCase("approx"))

  /** Single-fraction percentile aggregate in the session's mode. Result is
    * DOUBLE in both modes (approx_percentile returns the input type — an
    * actual data value, no interpolation — and is cast up).
    */
  def pct(spark: SparkSession, c: Column, frac: Double): Column =
    if (isApprox(spark))
      approx_percentile(c, lit(frac), lit(Accuracy)).cast("double")
    else percentile(c, lit(frac))

  /** Multi-fraction percentile aggregate (array result) in the session's
    * mode.
    */
  def pcts(spark: SparkSession, c: Column, fracs: Seq[Double]): Column =
    if (isApprox(spark))
      approx_percentile(c, array(fracs.map(lit): _*), lit(Accuracy))
        .cast("array<double>")
    else percentile(c, array(fracs.map(lit): _*))
}
