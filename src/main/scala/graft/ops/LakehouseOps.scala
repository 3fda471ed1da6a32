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

  // ------------------------------------------------ q183 layout audit

  /** Cells per layout (= 2^[[LayoutCellBits]] z-prefix cells; the linear
    * layout cuts the SAME count of equal-width key ranges so the two
    * manifests are size-comparable).
    */
  val LayoutCellBits = 8

  /** The probe rectangle, in quantized (16-bit residue) coordinates: a
    * 1/16-wide slice on EACH dimension, aligned to the z-cell grid so the
    * best case is exactly one z-cell — the selective two-column filter a
    * BI dashboard or a feature-store point lookup issues.
    */
  val LayoutProbeALo = 8192L
  val LayoutProbeAHi = 12287L
  val LayoutProbeBLo = 20480L
  val LayoutProbeBHi = 24575L

  /** q183: comparative layout-pruning audit — the measurement that closes
    * the q68→q127 story: q68 produces the z-order clustering key, q127
    * audits zone maps under the EXISTING (single-column) layout; this
    * operator builds the per-file min/max manifest under BOTH layouts
    * (z-prefix cells vs equal-width single-key cells, same file count) and
    * scores the same two-column probe rectangle against each. The output
    * is the per-file skip verdict and the rows a scan would actually read
    * — the number a table-layout decision (Delta OPTIMIZE ZORDER BY vs
    * plain sort) should be made on, produced BEFORE rewriting 100 TB.
    *
    * Scale shape: one narrow projection computes both cell ids (pure
    * integer shift/mask arithmetic, whole-stage codegen), then ONE hash
    * aggregation per layout keyed by the 2^[[LayoutCellBits]]-bounded cell
    * id (count/min/max — map-side combinable; output is 2·cells rows at
    * any corpus size). Skip verdicts are exact integer bound comparisons
    * on the aggregated manifest. No sort, no join, no window: auditing a
    * layout does NOT require materializing it.
    */
  def layoutAudit(spark: SparkSession, sfDir: String): DataFrame =
    layoutAuditAt(spark, sfDir, LayoutCellBits)

  /** [[layoutAudit]] at an arbitrary cell-bit width — the ModeBench sweep
    * entry (the gate query and its oracle stay pinned to
    * [[LayoutCellBits]]). `cellBits` must be even: the z prefix splits
    * it across the two dims.
    */
  def layoutAuditAt(spark: SparkSession, sfDir: String, cellBits: Int)
      : DataFrame = {
    require(cellBits > 0 && cellBits % 2 == 0 &&
      cellBits <= ScaleOps.ZorderBits, s"bad cellBits $cellBits")
    val m = 1L << ScaleOps.ZorderBits
    val cellW = m / (1L << cellBits) // linear cell width
    val zShift = 2 * ScaleOps.ZorderBits - cellBits // z-prefix shift
    // dim A = the key, dim B = the rounded price: a measure whose
    // magnitude spans the full 16-bit residue range at every scale
    // factor (partkey/suppkey occupy a sliver of it at small SF, which
    // would make the two layouts indistinguishable)
    val priceQ = floor(col("l_extendedprice")).cast("long")
    val base = Tables.lineitem(spark, sfDir).select(
      pmod(col("l_orderkey").cast("long"), lit(m)).as("qa"),
      pmod(priceQ, lit(m)).as("qb"),
      ScaleOps.zorder2(col("l_orderkey"), priceQ).as("z"))
    def manifest(tagged: DataFrame, layout: String, cell: Column): DataFrame =
      tagged
        .groupBy(cell.as("cell"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("qa")).as("min_a"), max(col("qa")).as("max_a"),
          min(col("qb")).as("min_b"), max(col("qb")).as("max_b"))
        .select(lit(layout).as("layout"), col("cell"), col("n_rows"),
          col("min_a"), col("max_a"), col("min_b"), col("max_b"))
    val both = manifest(base, "zorder", shiftright(col("z"), zShift))
      .unionByName(manifest(base, "linear", expr(s"qa div $cellW")))
    val skip = col("max_a") < LayoutProbeALo || col("min_a") > LayoutProbeAHi ||
      col("max_b") < LayoutProbeBLo || col("min_b") > LayoutProbeBHi
    both.select(col("layout"), col("cell"), col("n_rows"),
      col("min_a"), col("max_a"), col("min_b"), col("max_b"),
      skip.as("skip"),
      when(skip, lit(0L)).otherwise(col("n_rows")).as("rows_scanned"))
  }

  val layoutAuditSql: String = {
    val m = 1L << ScaleOps.ZorderBits
    val cellW = m / (1L << LayoutCellBits)
    val zShift = 2 * ScaleOps.ZorderBits - LayoutCellBits
    val skip = s"""(max_a < $LayoutProbeALo OR min_a > $LayoutProbeAHi
                   | OR max_b < $LayoutProbeBLo OR min_b > $LayoutProbeBHi)""".stripMargin
    s"""WITH base AS (
       |  SELECT ((l_orderkey % $m + $m) % $m) AS qa,
       |         ((floor(l_extendedprice)::BIGINT % $m + $m) % $m) AS qb,
       |         ${ScaleOps.zorder2Sql("l_orderkey", "floor(l_extendedprice)::BIGINT")} AS z
       |  FROM lineitem),
       |cells AS (
       |  SELECT 'zorder' AS layout, (z // ${1L << zShift}) AS cell,
       |         count(*)::BIGINT AS n_rows,
       |         min(qa) AS min_a, max(qa) AS max_a,
       |         min(qb) AS min_b, max(qb) AS max_b
       |  FROM base GROUP BY 2
       |  UNION ALL
       |  SELECT 'linear', (qa // $cellW), count(*)::BIGINT,
       |         min(qa), max(qa), min(qb), max(qb)
       |  FROM base GROUP BY 2)
       |SELECT layout, cell, n_rows, min_a, max_a, min_b, max_b,
       |       $skip AS skip,
       |       CASE WHEN $skip THEN 0 ELSE n_rows END::BIGINT AS rows_scanned
       |FROM cells""".stripMargin
  }

  // ------------------------------------------------ q185 manifest diff

  /** Buckets in the integrity manifest (a deployment constant: at 100 TB,
    * more buckets localize a diff more tightly for the same manifest
    * size — 2^14 is typical; 64 keeps the gate artifact readable).
    */
  val ManifestBuckets = 64

  /** Synthetic divergence between the two replicas (derivation constants
    * shared with the oracle, q116/q142 discipline): replica B silently
    * reprices every [[ManifestTamperMod]]-th key and loses every
    * [[ManifestDropMod]]-th row.
    */
  val ManifestTamperMod = 97
  val ManifestDropMod = 211

  /** Modulus bounding the per-row term of the additive digest: the sum of
    * `h32(row) % M` over 10^12 rows stays < 10^12·10^6 ≪ 2^63, so the
    * BIGINT accumulator cannot overflow at any plausible table size.
    */
  val ManifestSumMod = 1000003L

  /** q185: commutative-digest manifest diff — the cheap table-diff that
    * localizes replica divergence WITHOUT a row-level join: each side
    * folds every row into a per-bucket digest (row count + XOR of the
    * portable 64-bit row hash + a modular sum of the 32-bit row hash),
    * then the two 64-row manifests are compared bucket by bucket. A
    * differing bucket pins any corruption/tamper/loss to 1/[[ManifestBuckets]]
    * of the keyspace; only THOSE buckets ever need q69's row-level FULL
    * OUTER diff. This is how replicated lakehouse tables are actually
    * audited at 100 TB (checksum-based sync à la rsync/DynamoDB table
    * diff): the expensive row diff runs on megabytes, not the full table.
    *
    * Scale shape: per side, one narrow projection + ONE hash aggregation
    * to [[ManifestBuckets]] rows (XOR and bounded-modular-sum are both
    * commutative/associative → fully map-side combinable; no sort — the
    * digests are order-independent BY CONSTRUCTION, which is the whole
    * trick). The diff itself is a broadcast-sized 64×64 full-outer join.
    * Parity: prices enter the row string as exact integer cents; XOR and
    * modular arithmetic are exact on both engines.
    */
  /** Per-bucket commutative digest of (id, payload) rows — the reusable
    * kernel behind q185 and the corpus-release integrity manifest
    * ([[graft.pipeline.CorpusBuild]] writes one next to every published
    * corpus): ONE map-side-combinable hash aggregation to `buckets` rows
    * whose XOR / bounded-modular-sum digests are order-independent by
    * construction. Two manifests over the same logical content are
    * bit-equal regardless of partitioning, file layout, or row order —
    * which is exactly what makes them diffable across replicas/engines.
    */
  def digestManifest(side: DataFrame, id: Column, payload: Column,
      buckets: Int = ManifestBuckets): DataFrame = {
    val rowStr = concat_ws("|", id, payload)
    side
      .select(
        pmod(Portable.h32(id.cast("string")), lit(buckets.toLong)).as("bucket"),
        Portable.h64(rowStr).as("h64"),
        (Portable.h32(rowStr) % ManifestSumMod).as("hm"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h64)").as("xr"),
        sum(col("hm")).as("ms"))
  }

  /** The two synthetic replica sides shared by q185 and q190. */
  private def replicaSides(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame) = {
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
    val replicaB = base
      .filter(col("o_orderkey") % ManifestDropMod =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % ManifestTamperMod === 0,
          floor(col("cents") * 1.01 + 0.5).cast("long"))
          .otherwise(col("cents")).as("cents"))
    (base, replicaB)
  }

  def manifestDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val (base, replicaB) = replicaSides(spark, sfDir)
    def manifest(side: DataFrame): DataFrame =
      digestManifest(side, col("o_orderkey"), col("cents"))
    val a = manifest(base).select(col("bucket"), col("n").as("n_a"),
      col("xr").as("xor_a"), col("ms").as("sum_a"))
    val b = manifest(replicaB).select(col("bucket"), col("n").as("n_b"),
      col("xr").as("xor_b"), col("ms").as("sum_b"))
    a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("xor_a"), col("xor_b"), col("sum_a"), col("sum_b"),
        (!(col("n_a") <=> col("n_b")) || !(col("xor_a") <=> col("xor_b")) ||
          !(col("sum_a") <=> col("sum_b"))).as("differs"))
  }

  val manifestDiffSql: String = {
    def manifest(src: String) =
      s"""SELECT ${Portable.h32Sql("o_orderkey::VARCHAR")} % $ManifestBuckets AS bucket,
         |       count(*)::BIGINT AS n,
         |       bit_xor(${Portable.h64Sql("o_orderkey::VARCHAR || '|' || cents::VARCHAR")}) AS xr,
         |       sum(${Portable.h32Sql("o_orderkey::VARCHAR || '|' || cents::VARCHAR")} % $ManifestSumMod)::BIGINT AS ms
         |FROM $src GROUP BY 1""".stripMargin
    s"""WITH base AS (
       |  SELECT o_orderkey,
       |         floor(o_totalprice * 100.0 + 0.5)::BIGINT AS cents
       |  FROM orders),
       |replica_b AS (
       |  SELECT o_orderkey,
       |         CASE WHEN o_orderkey % $ManifestTamperMod = 0
       |              THEN floor(cents * 1.01 + 0.5)::BIGINT ELSE cents END AS cents
       |  FROM base WHERE o_orderkey % $ManifestDropMod <> 0),
       |ma AS (${manifest("base").replace("\n", "\n  ")}),
       |mb AS (${manifest("replica_b").replace("\n", "\n  ")})
       |SELECT coalesce(ma.bucket, mb.bucket) AS bucket,
       |       coalesce(ma.n, 0)::BIGINT AS n_a,
       |       coalesce(mb.n, 0)::BIGINT AS n_b,
       |       ma.xr AS xor_a, mb.xr AS xor_b,
       |       ma.ms AS sum_a, mb.ms AS sum_b,
       |       (coalesce(ma.n, 0) IS DISTINCT FROM coalesce(mb.n, 0)
       |        OR ma.xr IS DISTINCT FROM mb.xr
       |        OR ma.ms IS DISTINCT FROM mb.ms) AS differs
       |FROM ma FULL OUTER JOIN mb ON ma.bucket = mb.bucket""".stripMargin
  }

  // ------------------------------------------------ q190 localized diff

  /** q190: localized row-level diff — the two-phase table diff q185's
    * scaladoc promises, executed end-to-end: phase 1 compares the two
    * 64-row digest manifests and keeps only the DIFFERING buckets; phase
    * 2 runs q69's row-level FULL OUTER diff restricted to rows hashing
    * into those buckets, emitting the actual changed/dropped/added keys
    * with both sides' values. At 100 TB with k corrupted keys this reads
    * the corpus twice for digests (one map-side-combinable agg each —
    * the cheap, mergeable pass) but row-joins only ≈ k/[[ManifestBuckets]]
    * of the keyspace — megabytes, not the table. The composition is the
    * point: neither kernel alone ships a diff a human can act on; this
    * emits the repair list.
    *
    * Scale shape: the flagged-bucket set (≤ [[ManifestBuckets]] rows)
    * broadcasts onto both row scans as a semi-join filter, so the only
    * corpus-sized exchange is the equi-join of the two FILTERED sides on
    * the key. Classification (changed/dropped/added) is null-structure
    * on the full-outer result — exact on both engines.
    */
  def localizedDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val (base, replicaB) = replicaSides(spark, sfDir)
    val flagged = manifestDiff(spark, sfDir)
      .filter(col("differs")).select(col("bucket"))
    def flaggedRows(side: DataFrame): DataFrame =
      side
        .withColumn("bucket",
          pmod(Portable.h32(col("o_orderkey").cast("string")),
            lit(ManifestBuckets.toLong)))
        .join(broadcast(flagged), Seq("bucket"), "left_semi")
    val a = flaggedRows(base)
      .select(col("o_orderkey"), col("cents").as("cents_a"))
    val b = flaggedRows(replicaB)
      .select(col("o_orderkey"), col("cents").as("cents_b"))
    a.join(b, Seq("o_orderkey"), "full_outer")
      .filter(!(col("cents_a") <=> col("cents_b")))
      .select(col("o_orderkey"), col("cents_a"), col("cents_b"),
        when(col("cents_b").isNull, "dropped")
          .when(col("cents_a").isNull, "added")
          .otherwise("changed").as("change"))
  }

  val localizedDiffSql: String = {
    val bucketOf = s"${Portable.h32Sql("o_orderkey::VARCHAR")} % $ManifestBuckets"
    s"""WITH md AS (${manifestDiffSql.replace("\n", "\n  ")}),
       |flagged AS (SELECT bucket FROM md WHERE differs),
       |base AS (
       |  SELECT o_orderkey,
       |         floor(o_totalprice * 100.0 + 0.5)::BIGINT AS cents
       |  FROM orders),
       |replica_b AS (
       |  SELECT o_orderkey,
       |         CASE WHEN o_orderkey % $ManifestTamperMod = 0
       |              THEN floor(cents * 1.01 + 0.5)::BIGINT ELSE cents END AS cents
       |  FROM base WHERE o_orderkey % $ManifestDropMod <> 0),
       |fa AS (
       |  SELECT o_orderkey, cents AS cents_a FROM base
       |  WHERE $bucketOf IN (SELECT bucket FROM flagged)),
       |fb AS (
       |  SELECT o_orderkey, cents AS cents_b FROM replica_b
       |  WHERE $bucketOf IN (SELECT bucket FROM flagged))
       |SELECT coalesce(fa.o_orderkey, fb.o_orderkey) AS o_orderkey,
       |       fa.cents_a, fb.cents_b,
       |       CASE WHEN fb.cents_b IS NULL THEN 'dropped'
       |            WHEN fa.cents_a IS NULL THEN 'added'
       |            ELSE 'changed' END AS change
       |FROM fa FULL OUTER JOIN fb ON fa.o_orderkey = fb.o_orderkey
       |WHERE fa.cents_a IS DISTINCT FROM fb.cents_b""".stripMargin
  }

  // ------------------------------------------------ q193 overlap depth

  /** Key span per file in the clustered comparison layout (≈ the q127
    * zone discipline applied to the customer dimension).
    */
  val OverlapClusterSpan = 100L

  /** q193: zone-overlap depth audit — the number that TRIGGERS q182's
    * compaction/re-cluster decision: for each file, how many OTHER files'
    * key ranges overlap its own. A perfectly clustered table has depth 0
    * (every zone-map probe prunes to one file); an arrival-ordered table
    * has depth ≈ |files| (every probe reads everything — the q127 report
    * showed the symptom for ONE predicate; this measures the structural
    * cause for ALL of them). Iceberg/Delta expose the same statistic as
    * "overlap depth"/clustering metrics; computed here for BOTH layouts
    * — the monthly arrival manifest with customer-key bounds (what a
    * pipeline actually writes) against the customer-clustered manifest
    * (what OPTIMIZE would produce) — so the audit shows the before/after
    * of the rewrite it justifies, without performing it.
    *
    * Scale shape: the corpus collapses to the two file manifests (one
    * hash agg each — the only corpus-sized work, q182's argument); the
    * overlap count is a manifest×manifest interval self-join, O(F²) pairs
    * over a LAYOUT-bounded F (≈ partitions, not rows — at a real
    * deployment the manifest comes from the transaction log). Depth-0
    * files survive via the left join against the pair counts.
    */
  def overlapDepth(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val arrival = orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("file_key"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_custkey")).as("min_key"), max(col("o_custkey")).as("max_key"))
    val clustered = orders
      .groupBy(concat(lit("c"), expr(s"o_custkey div $OverlapClusterSpan"))
        .as("file_key"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_custkey")).as("min_key"), max(col("o_custkey")).as("max_key"))
    def depth(m: DataFrame, layout: String): DataFrame = {
      val a = m.select(col("file_key"), col("n_rows"),
        col("min_key"), col("max_key"))
      val b = m.select(col("file_key").as("b_key"),
        col("min_key").as("b_min"), col("max_key").as("b_max"))
      val overlaps = a.join(b,
          col("min_key") <= col("b_max") && col("b_min") <= col("max_key") &&
            col("file_key") =!= col("b_key"))
        .groupBy(col("file_key").as("o_key"))
        .agg(count(lit(1)).as("depth"))
      a.join(overlaps, col("file_key") === col("o_key"), "left")
        .select(lit(layout).as("layout"), col("file_key"), col("n_rows"),
          col("min_key"), col("max_key"),
          coalesce(col("depth"), lit(0L)).as("overlap_depth"))
    }
    depth(arrival, "arrival").unionByName(depth(clustered, "clustered"))
  }

  val overlapDepthSql: String = {
    def depth(src: String, layout: String) =
      s"""SELECT '$layout' AS layout, a.file_key, a.n_rows, a.min_key, a.max_key,
         |       (SELECT count(*) FROM $src b
         |        WHERE a.min_key <= b.max_key AND b.min_key <= a.max_key
         |          AND a.file_key <> b.file_key)::BIGINT AS overlap_depth
         |FROM $src a""".stripMargin
    s"""WITH arrival AS (
       |  SELECT strftime(o_orderdate, '%Y-%m') AS file_key,
       |         count(*)::BIGINT AS n_rows,
       |         min(o_custkey) AS min_key, max(o_custkey) AS max_key
       |  FROM orders GROUP BY 1),
       |clustered AS (
       |  SELECT 'c' || (o_custkey // $OverlapClusterSpan)::VARCHAR AS file_key,
       |         count(*)::BIGINT AS n_rows,
       |         min(o_custkey) AS min_key, max(o_custkey) AS max_key
       |  FROM orders GROUP BY 1)
       |${depth("arrival", "arrival")}
       |UNION ALL
       |${depth("clustered", "clustered")}""".stripMargin
  }

  // ------------------------------------------------ q188 time travel

  /** The version q188 reconstructs (between the q116 churn versions so the
    * read is neither the first nor the open snapshot — both interval
    * bounds are exercised).
    */
  val AsOfVersion = 1

  /** q188: time-travel read — reconstruct the dimension AS OF a past
    * version from the q116 SCD2 interval history: the episode valid at V
    * is the one with valid_from ≤ V < valid_to (open episodes extend to
    * ∞). This is the consumer side of SCD2 and the lakehouse feature the
    * history exists FOR (Delta `VERSION AS OF` / Iceberg snapshot reads
    * resolve the same way from their logs): q116 derives the intervals,
    * this proves they answer the question. The result is exactly the v1
    * snapshot — asserted row-for-row in LakehouseOpsSpec.
    *
    * Scale shape: ONE predicate over the interval table — no join, no
    * window, no sort; at 100 TB the interval table is the dimension's
    * history (≈ versions × keys rows) and the filter prunes on both
    * engines' column stats. Reading the past costs the same as reading
    * the present.
    */
  def timeTravel(spark: SparkSession, sfDir: String): DataFrame =
    scd2Orders(spark, sfDir)
      .filter(col("valid_from") <= AsOfVersion &&
        (col("valid_to").isNull || col("valid_to") > AsOfVersion))
      .select(col("o_orderkey"), col("o_totalprice"),
        col("valid_from"), col("is_current"))

  val timeTravelSql: String =
    s"""SELECT o_orderkey, o_totalprice, valid_from, is_current
       |FROM (${scd2OrdersSql.replace("\n", "\n      ")})
       |WHERE valid_from <= $AsOfVersion
       |  AND (valid_to IS NULL OR valid_to > $AsOfVersion)""".stripMargin
}
