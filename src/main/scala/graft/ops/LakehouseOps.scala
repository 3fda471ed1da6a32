package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Table-maintenance operators a lakehouse runs ON its tables (as opposed
  * to queries over their contents): slowly-changing-dimension history
  * builds and friends. Sits next to [[AdvancedOps.mergeUpsertOrders]]
  * (MERGE, q50) and [[AdvancedOps.snapshotDiffOrders]] (CDC diff, q69) —
  * q116 is the third leg: turning a SERIES of snapshots into validity
  * intervals (SCD type 2), which is how a dimension keeps history without
  * mutating rows.
  */
object LakehouseOps {

  private def r2(c: Column): Column = floor(c * 100.0 + 0.5) / 100.0
  private def r2Sql(x: String) = s"floor(($x) * 100.0 + 0.5) / 100.0"

  /** Synthetic churn for the three snapshot versions (constants shared
    * with the oracle SQL): v1 bumps every 5th key's price +5%, v2 then
    * cuts every 7th key's −10% — so keys divisible by 35 change twice,
    * by 5 or 7 once, the rest never (interval counts 1/2/3 all appear).
    */
  val Scd2BumpMod = 5
  val Scd2CutMod = 7

  /** q116: SCD type-2 history build — given versioned snapshots of the
    * (o_orderkey, o_totalprice) dimension, collapse consecutive equal
    * values and emit one row per value EPISODE with its validity interval
    * [valid_from, valid_to) and an is_current flag. This is the write-side
    * shape behind every `MERGE … WHEN MATCHED AND changed` dimension load;
    * q50 applies one delta, q69 diffs two snapshots, this derives the full
    * interval history from n of them.
    *
    * Scale shape: one union of the snapshots, then two window passes both
    * partitioned BY KEY (per-key history is a handful of versions, so
    * partitions are tiny and the shuffle is one hash exchange on the
    * dimension key — no global sort anywhere): lag() to keep only
    * change rows, lead() to close each episode's interval. Parity: prices
    * are r2-rounded at construction; interval bounds are exact ints;
    * the open interval's valid_to is NULL on both engines.
    */
  def scd2Orders(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val v0 = base.select(col("o_orderkey"), col("o_totalprice"), lit(0).as("version"))
    val p1 = when(col("o_orderkey") % Scd2BumpMod === 0, r2(col("o_totalprice") * 1.05))
      .otherwise(col("o_totalprice"))
    val v1 = base.select(col("o_orderkey"), p1.as("o_totalprice"), lit(1).as("version"))
    val p2 = when(col("o_orderkey") % Scd2CutMod === 0, r2(p1 * 0.9)).otherwise(p1)
    val v2 = base.select(col("o_orderkey"), p2.as("o_totalprice"), lit(2).as("version"))

    val all = v0.unionByName(v1).unionByName(v2)
    val byKey = Window.partitionBy(col("o_orderkey")).orderBy(col("version"))
    // keep only rows that OPEN an episode (first version, or value changed
    // vs the previous version); <=> is null-safe like the oracle's
    // IS DISTINCT FROM
    val opens = all
      .withColumn("prev", lag(col("o_totalprice"), 1).over(byKey))
      .filter(!(col("o_totalprice") <=> col("prev")))
    opens
      .withColumn("valid_to", lead(col("version"), 1).over(byKey))
      .select(
        col("o_orderkey"), col("o_totalprice"),
        col("version").as("valid_from"),
        col("valid_to").cast("int").as("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  val scd2OrdersSql: String =
    s"""WITH v1p AS (
       |  SELECT o_orderkey,
       |         CASE WHEN o_orderkey % $Scd2BumpMod = 0
       |              THEN ${r2Sql("o_totalprice * 1.05")}
       |              ELSE o_totalprice END AS p1
       |  FROM orders),
       |snaps AS (
       |  SELECT o_orderkey, o_totalprice, 0 AS version FROM orders
       |  UNION ALL
       |  SELECT o_orderkey, p1, 1 FROM v1p
       |  UNION ALL
       |  SELECT o_orderkey,
       |         CASE WHEN o_orderkey % $Scd2CutMod = 0
       |              THEN ${r2Sql("p1 * 0.9")} ELSE p1 END, 2
       |  FROM v1p),
       |opens AS (
       |  SELECT * FROM (
       |    SELECT o_orderkey, o_totalprice, version,
       |           lag(o_totalprice) OVER (PARTITION BY o_orderkey
       |                                   ORDER BY version) AS prev
       |    FROM snaps)
       |  WHERE o_totalprice IS DISTINCT FROM prev)
       |SELECT o_orderkey, o_totalprice,
       |       version::INT AS valid_from,
       |       (lead(version) OVER (PARTITION BY o_orderkey
       |                            ORDER BY version))::INT AS valid_to,
       |       lead(version) OVER (PARTITION BY o_orderkey
       |                           ORDER BY version) IS NULL AS is_current
       |FROM opens""".stripMargin

  // ---------------------------------------------------- q127 zone maps

  /** Orderkey span per synthetic "file", and the two probe predicates the
    * skip report evaluates: `l_orderkey >= ZoneKeyCutoff` (aligned with
    * the file layout) and `l_shipdate >= ZoneDateCutoff` (uncorrelated
    * with it).
    */
  val ZoneFileSpan = 1000L
  val ZoneKeyCutoff = 1200L
  val ZoneDateCutoff = "1997-01-01 00:00:00"

  /** q127: zone-map skip report — per-file min/max statistics plus the
    * skip verdict for two probe predicates: a file can be pruned when its
    * max over the predicate column falls below the cutoff. This is the
    * data-skipping bookkeeping behind every lakehouse format (parquet
    * row-group stats, Delta/Iceberg file stats): the engine CONSUMES it
    * in §4's pushdown path; this operator is the producer/audit side.
    *
    * The two predicates are the point: files span contiguous orderkey
    * ranges, so the key predicate prunes cleanly — while shipdate is
    * uncorrelated with the layout, so its bounds cover everything and
    * nothing skips. That asymmetry IS the production diagnostic: zone
    * maps are only as good as the physical clustering, and the fix the
    * report motivates is exactly q68's z-order (multi-column layouts
    * bound BOTH columns per file — LayoutSpec proves it on this engine).
    *
    * Scale shape: ONE hash aggregation keyed by file id (count/min/max,
    * map-side combinable); one row per file at any corpus size; verdicts
    * derived from aggregated bounds with exact integer/int64-micros
    * comparisons on both engines.
    */
  def zoneMapSkipping(spark: SparkSession, sfDir: String): DataFrame = {
    val dateCutoff = to_timestamp(lit(ZoneDateCutoff))
    Tables.lineitem(spark, sfDir)
      .groupBy(expr(s"l_orderkey div $ZoneFileSpan").as("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
      .select(col("file_id"), col("n_rows"), col("min_key"), col("max_key"),
        col("min_ship"), col("max_ship"),
        (col("max_key") < ZoneKeyCutoff).as("skip_by_key"),
        (col("max_ship") < dateCutoff).as("skip_by_date"),
        when(col("max_key") < ZoneKeyCutoff, col("n_rows")).otherwise(lit(0L))
          .as("rows_skipped_key"))
  }

  val zoneMapSkippingSql: String =
    s"""SELECT l_orderkey // $ZoneFileSpan AS file_id,
       |       count(*) AS n_rows,
       |       min(l_orderkey) AS min_key,
       |       max(l_orderkey) AS max_key,
       |       min(l_shipdate) AS min_ship,
       |       max(l_shipdate) AS max_ship,
       |       max(l_orderkey) < $ZoneKeyCutoff AS skip_by_key,
       |       max(l_shipdate) < TIMESTAMP '$ZoneDateCutoff' AS skip_by_date,
       |       CASE WHEN max(l_orderkey) < $ZoneKeyCutoff
       |            THEN count(*) ELSE 0 END::BIGINT AS rows_skipped_key
       |FROM lineitem GROUP BY 1""".stripMargin

  // -------------------------------------------------- q142 CDC apply

  /** Deterministic synthetic changelog over the orders snapshot (same
    * derivation discipline as q69/q116): four sequenced operations —
    * UPDATE, DELETE, INSERT, then a late UPDATE that collides with the
    * DELETE on keys divisible by both moduli.
    */
  val CdcUpdMod = 5
  val CdcDelMod = 7
  val CdcInsMod = 400

  /** q142: CDC changelog apply — materialize the current table from a base
    * snapshot plus an ordered stream of I/U/D change events, compacted-
    * topic style: per key, the HIGHEST-sequence operation wins; a winning
    * DELETE removes the row, a winning UPDATE/INSERT upserts its value
    * (so an UPDATE sequenced after a DELETE resurrects the key — the
    * standard Kafka-compaction / CDC-upsert contract, which is exactly
    * the case the q50 single-shot MERGE cannot express). This is the
    * lakehouse ingestion primitive: Debezium/binlog feeds land as exactly
    * this shape.
    *
    * Scale shape: ONE argmax hash aggregation over the changelog (the q06
    * max(struct) kernel keyed by sequence — no per-key window sort), one
    * equi-join of the compacted heads against the base snapshot (full
    * outer on the key), and a null-structured projection. Changelog volume
    * shuffles once; the base shuffles once; both on the uniform key.
    *
    * Parity: prices are r2-rounded at construction; the op/sequence
    * tie-break never fires (sequences are distinct per key by
    * construction, asserted in LakehouseOpsSpec). The oracle's head
    * selection is a single struct-valued arg_max — structurally identical
    * to Spark's max(struct(...)) — so a key whose highest-sequence op is a
    * DELETE (NULL price) selects the SAME row on both engines (per-column
    * arg_max(price, seq) would skip NULL prices in DuckDB and fall back to
    * an earlier change).
    */
  def cdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val log = base.filter(col("o_orderkey") % CdcUpdMod === 0)
      .select(col("o_orderkey"), lit(1L).as("seq"), lit("U").as("op"),
        r2(col("o_totalprice") * 1.1).as("price"))
      .unionByName(base.filter(col("o_orderkey") % CdcDelMod === 0)
        .select(col("o_orderkey"), lit(2L).as("seq"), lit("D").as("op"),
          lit(null).cast("double").as("price")))
      .unionByName(base.filter(col("o_orderkey") % CdcInsMod === 0)
        .select((-col("o_orderkey") - 1L).as("o_orderkey"), lit(3L).as("seq"),
          lit("I").as("op"), lit(99.0).as("price")))
      .unionByName(base.filter(col("o_orderkey") % (CdcUpdMod * CdcDelMod) === 0)
        .select(col("o_orderkey"), lit(4L).as("seq"), lit("U").as("op"),
          r2(col("o_totalprice") * 1.2).as("price")))
    // compacted head per key: highest sequence wins (argmax, no window)
    val head = log
      .groupBy(col("o_orderkey"))
      .agg(max(struct(col("seq"), col("op"), col("price"))).as("h"))
      .select(col("o_orderkey"), col("h.op").as("op"), col("h.price").as("price"))
    base.join(head, Seq("o_orderkey"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(
        col("o_orderkey"),
        coalesce(col("price"), col("o_totalprice")).as("o_totalprice"),
        when(col("op").isNull, "base").otherwise(col("op")).as("provenance"))
  }

  val cdcApplySql: String =
    s"""WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
       |log AS (
       |  SELECT o_orderkey, 1 AS seq, 'U' AS op,
       |         ${r2Sql("o_totalprice * 1.1")} AS price
       |  FROM base WHERE o_orderkey % $CdcUpdMod = 0
       |  UNION ALL
       |  SELECT o_orderkey, 2, 'D', NULL::DOUBLE
       |  FROM base WHERE o_orderkey % $CdcDelMod = 0
       |  UNION ALL
       |  SELECT -o_orderkey - 1, 3, 'I', 99.0
       |  FROM base WHERE o_orderkey % $CdcInsMod = 0
       |  UNION ALL
       |  SELECT o_orderkey, 4, 'U', ${r2Sql("o_totalprice * 1.2")}
       |  FROM base WHERE o_orderkey % ${CdcUpdMod * CdcDelMod} = 0),
       |head AS (
       |  SELECT o_orderkey,
       |         arg_max({'op': op, 'price': price}, seq) AS h
       |  FROM log GROUP BY 1)
       |SELECT coalesce(b.o_orderkey, hd.o_orderkey) AS o_orderkey,
       |       coalesce(hd.h.price, b.o_totalprice) AS o_totalprice,
       |       coalesce(hd.h.op, 'base') AS provenance
       |FROM base b FULL OUTER JOIN head hd USING (o_orderkey)
       |WHERE coalesce(hd.h.op, '') <> 'D'""".stripMargin

  // ------------------------------------------------ q182 compaction planner

  /** Target group size (rows as the byte proxy) — a deployment constant:
    * at 100 TB this is ~the 128 MiB–1 GiB file-size sweet spot expressed
    * in rows.
    */
  val CompactTarget = 5000L

  /** q182: small-file compaction planning — the table-maintenance pass
    * every partitioned lakehouse (Delta OPTIMIZE / Iceberg rewrite_data_files)
    * schedules: given the per-partition file manifest (here the monthly
    * orders cells the S8 publish discipline writes), assign partitions to
    * compaction groups of ≈ [[CompactTarget]] rows by greedy size-descending
    * sequential packing — bin = (running_sum − size) div target, the
    * standard one-pass approximation (oversized partitions land alone in
    * their own groups, as a rewrite task would).
    *
    * Scale shape: the corpus collapses to the MANIFEST (one hash agg to
    * |partitions| rows — the only corpus-sized work); the packing itself
    * runs on the constant-bounded manifest inside ONE collected array
    * (q179's pool discipline — no global window, suite invariant intact),
    * with the running sum an O(|parts|²) in-array fold over exact BIGINTs
    * — |parts| is a layout constant (~80 months), not data. At a real
    * deployment the manifest comes from the transaction log, not a scan,
    * and the identical plan applies.
    */
  def compactionPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val manifest = Tables.orders(spark, sfDir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("part_key"))
      .agg(count(lit(1)).as("n_rows"))
    manifest
      .agg(sort_array(collect_list(struct((-col("n_rows")).as("negsz"),
        col("part_key"), col("n_rows")))).as("ps"))
      .select(posexplode(col("ps")).as(Seq("pos", "x")), col("ps"))
      .select(
        col("x.part_key").as("part_key"),
        col("x.n_rows").as("n_rows"),
        aggregate(slice(col("ps"), lit(1), col("pos") + 1),
          lit(0L), (acc, e) => acc + e.getField("n_rows")).as("cum"))
      .select(col("part_key"), col("n_rows"),
        ((col("cum") - col("n_rows")) / CompactTarget).cast("long").as("bin"))
  }

  val compactionPlanSql: String =
    s"""WITH m AS (
       |  SELECT strftime(o_orderdate, '%Y-%m') AS part_key, count(*)::BIGINT AS n_rows
       |  FROM orders GROUP BY 1),
       |arr AS (
       |  SELECT list({'negsz': -n_rows, 'part_key': part_key, 'n_rows': n_rows}
       |              ORDER BY -n_rows, part_key) AS ps
       |  FROM m),
       |e AS (
       |  SELECT ps[i].part_key AS part_key, ps[i].n_rows AS n_rows,
       |         list_sum(list_transform(ps[1:i], x -> x.n_rows))::BIGINT AS cum
       |  FROM arr, (SELECT unnest(range(1, (SELECT len(ps) FROM arr) + 1)) AS i) r)
       |SELECT part_key, n_rows, ((cum - n_rows) // $CompactTarget)::BIGINT AS bin
       |FROM e""".stripMargin
}
