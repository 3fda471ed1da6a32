package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet, one file per table. At 100 TB these would be
  * multi-file partitioned datasets; nothing here assumes a single file — the
  * paths are directories/globs as far as Spark is concerned.
  */
object Tables {
  /** Floor (bytes) under which a scan is never repartitioned — the
    * catalog-sized dimension tables (nation, region, supplier) are
    * broadcast-join builds where one task is already optimal and an extra
    * exchange is pure overhead.
    */
  val ScanParallelMinBytesKey = "graft.scan.parallelizeMinBytes"

  /** Cap on the repartition fan-out. Measured sweep at sf0.1 (local[32],
    * 16 physical cores / 32 SMT threads): width 32 LOSES — per-task fixed
    * overhead (~15-40 ms) plus SMT-pair contention inflate every stage —
    * width 8 wins on all CPU-dense paths, width 16 (= one task per
    * PHYSICAL core) wins again on the heaviest (q135 5.1→4.0 s, q21
    * 1.74→1.29 s) and ties the rest. Conf-tunable for other hosts.
    */
  val ScanParallelMaxKey = "graft.scan.parallelizeMax"

  /** Scale-adaptive scan parallelization (optimization guide §2.5: "one
    * huge unsplittable file … repartition immediately after the read").
    * The testdata tables are single-FILE, single-ROW-GROUP parquet, so
    * Spark's byte-range splitter cannot produce more than one non-empty
    * scan task no matter what `maxPartitionBytes` says — every per-row
    * expression downstream (tokenize, shingle, minhash, vector math) then
    * runs serially in that one task while the other cores idle. A
    * round-robin repartition to the session's default parallelism moves
    * the heavy projections (which Catalyst does NOT push below a
    * repartition — only pruning and filters go below) into `par` parallel
    * tasks at the cost of shuffling the (small, sub-`maxPartitionBytes`)
    * raw rows once.
    *
    * Scale-adaptive, not a local[32] constant: it fires only when the
    * scan's OWN split count is at least 4× below the default parallelism
    * AND the relation is big enough to matter. At 100 TB any table scan
    * has thousands of row-group splits, `parts * 4 <= par` is false, and
    * the plan is byte-identical to the pre-r15 one — the repartition is
    * structurally a small-input-only ramp, the same class as AQE's
    * coalescing in the other direction. Results are partition-invariant
    * by the suite-wide InvarianceCheck proof (bit-exact under 5/7/32
    * shuffle partitions), so the round-robin placement cannot change any
    * query's output.
    */
  private def scanParallel(spark: SparkSession, df: DataFrame): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val minBytes = spark.conf.get(ScanParallelMinBytesKey, "65536").toLong
    // relation stats = file bytes for a parquet scan — no data read
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes < minBytes) df
    else {
      // the physical split count Spark will actually use (accounts for
      // file count, row groups via maxPartitionBytes, openCostInBytes)
      val parts = df.rdd.getNumPartitions
      val target =
        math.min(par, spark.conf.get(ScanParallelMaxKey, "16").toInt)
      if (parts * 4 <= target) df.repartition(target) else df
    }
  }

  /** `events.ts` surfaces as int64 EPOCH-NANOS LongType regardless of the
    * physical parquet type: arithmetic on int64 is exactly reproducible
    * across engines (the DuckDB oracles use `epoch_us(ts::TIMESTAMP) *
    * 1000`), and it avoids a lossy cast in every downstream op. Two
    * physical encodings exist in the wild here: INT64 TIMESTAMP(NANOS)
    * (pre-r6 testdata; needs the legacy flag to read at all, already
    * nanos) and TIMESTAMP(MICROS) without timezone (r6 testdata; Spark
    * reads TIMESTAMP_NTZ — converted to nanos via `unix_micros · 1000`,
    * interpreting the naive value in the session timezone, which every
    * entry point pins to UTC exactly like DuckDB's naive `epoch_us`).
    * Values are µs-truncated either way, so the two encodings yield
    * byte-identical nanos.
    */
  val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set(NanosFlag, "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == LongType) df
      else df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** OPT-IN wide `documents` scan for tokenize/shingle-heavy consumers
    * (the r9 `cpuBound` rule at the scan: widen where per-ROW CPU
    * dominates). Blanket application to every documents/embeddings read
    * was measured a net LOSS — light consumers (hash-only projections,
    * catalog-sized aggregations, the 2k-row embeddings table) pay the
    * extra exchange and per-stage fan-out overhead without enough CPU to
    * amortize it — so each call site opts in explicitly and the switch is
    * recorded per query in OPTIMIZATION_r15.md.
    */
  def documentsPar(s: SparkSession, d: String): DataFrame =
    scanParallel(s, table(s, d, "documents"))

  /** OPT-IN wide `embeddings` scan — same contract as [[documentsPar]],
    * for the retrieval ops whose per-row work is dense vector arithmetic
    * over every embedding (dot products against a query / pairwise rank
    * signa), measured faster wide; the cheap-projection ANN index builders
    * stay on the narrow scan.
    */
  def embeddingsPar(s: SparkSession, d: String): DataFrame =
    scanParallel(s, table(s, d, "embeddings"))

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
