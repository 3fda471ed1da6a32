package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Semi-structured + reshaping operators: JSON extraction over the `events`
  * props column and pivot tables.
  */
object SemiStructuredOps {

  /** q43: JSON field extraction + aggregation — `props` is a JSON string
    * (`{"k": 87}`); extract k, bucket it, aggregate. get_json_object is
    * codegen'd path extraction (no UDF, no full from_json schema needed for
    * one field).
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))

  val jsonExtractSql: String =
    """SELECT event_type, json_extract(props, '$.k')::BIGINT % 10 AS k_mod,
      |       count(*) AS n, max(json_extract(props, '$.k')::BIGINT) AS max_k
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q44: pivot — order counts reshaped to one column per status. Explicit
    * pivot values keep the output schema static (required for a stable
    * oracle and for any production sink); the oracle mirrors with
    * conditional aggregation, which is exactly how Spark executes a pivot
    * (single shuffle, one agg per cell).
    */
  val PivotStatuses = Seq("F", "O", "P")

  def pivotStatus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", PivotStatuses)
      .agg(count(lit(1)))
      .na.fill(0L, PivotStatuses)

  val pivotStatusSql: String = {
    val cells = PivotStatuses.map { s =>
      s"""coalesce(count(*) FILTER (o_orderstatus = '$s'), 0) AS "$s""""
    }.mkString(", ")
    s"""SELECT o_orderpriority, $cells
       |FROM orders GROUP BY 1""".stripMargin
  }

  /** q45: window frame spec — per-user rolling mean over the 4-row event
    * window (3 preceding + current), ordered by event time. Covers the
    * ROWS-BETWEEN frame class (running/rolling aggregates).
    */
  def rollingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // order on µs-truncated time to match DuckDB's timestamp precision
    // (same rationale as EventOps.sessionize)
    val tsUs = (col("ts") - pmod(col("ts"), lit(1000L))).as("ts_us")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(-3, 0)
    Tables.events(spark, sfDir)
      .withColumn("ts_us", tsUs)
      .select(
        col("user_id"), col("event_id"),
        (floor(avg(col("value")).over(w) * 10000.0 + 0.5) / 10000.0).as("rolling_avg"))
  }

  val rollingWindowSql: String =
    """SELECT user_id, event_id,
      |  floor(avg(value) OVER (PARTITION BY user_id
      |                         ORDER BY epoch_us(ts::TIMESTAMP), event_id
      |                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |        * 10000.0 + 0.5) / 10000.0 AS rolling_avg
      |FROM events""".stripMargin

  // ------------------------------------------------ q147 dead-letter audit

  /** Corruption modulus for the synthetic malformed-payload injection. */
  val DeadLetterMod = 17

  /** q147: dead-letter routing audit — per event type, how many payloads
    * fail JSON parsing and would route to the dead-letter sink instead of
    * the typed pipeline. Every production ingest job needs this split
    * (parse errors must never kill the job OR silently vanish — the same
    * contract as the PGN source's parse_error column, P3). Corruption is
    * injected deterministically (truncate the payload of every
    * [[DeadLetterMod]]-th event) so both engines audit the identical
    * stream; on real data the corrupt rows arrive corrupt.
    *
    * Scale shape: one narrow scan — parse-validate + conditional count per
    * type; no shuffle beyond the |types|-row aggregation. Parse failure is
    * detected by the engine's null-on-malformed JSON path extraction, with
    * STRING-valued extraction on both sides so the two engines agree even
    * on a literal `{"k": null}` payload: Spark get_json_object and DuckDB
    * json_extract_string both return SQL NULL for a null value, a missing
    * key, and a malformed payload (bare json_extract would return the
    * non-NULL JSON value 'null' in DuckDB and silently diverge).
    */
  def deadLetter(spark: SparkSession, sfDir: String): DataFrame = {
    val corrupted = when(col("event_id") % DeadLetterMod === 0,
      col("props").substr(lit(1), length(col("props")) - 2))
      .otherwise(col("props"))
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(corrupted, "$.k").isNull.as("dead"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("dead").cast("long")).as("n_dead"))
      .select(col("event_type"), col("n_events"), col("n_dead"),
        graft.ops.Portable.r4(col("n_dead").cast("double") /
          col("n_events").cast("double")).as("dead_rate"))
  }

  val deadLetterSql: String =
    s"""WITH c AS (
       |  SELECT event_type,
       |         CASE WHEN event_id % $DeadLetterMod = 0
       |              THEN substr(props, 1, length(props) - 2)
       |              ELSE props END AS payload
       |  FROM events),
       |f AS (
       |  SELECT event_type,
       |         (json_extract_string(try_cast(payload AS JSON), '$$.k') IS NULL)::INT AS dead
       |  FROM c)
       |SELECT event_type, count(*) AS n_events,
       |       sum(dead)::BIGINT AS n_dead,
       |       ${graft.ops.Portable.r4Sql("sum(dead)::DOUBLE / count(*)::DOUBLE")} AS dead_rate
       |FROM f GROUP BY 1""".stripMargin
}
