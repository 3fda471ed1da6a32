package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Round-1 widening: distinct aggregation, IVF-style ANN, and regex
  * tokenization — each oracle-checked.
  */
object ExtraOps {

  private def r4(c: Column): Column = Portable.r4(c)
  private def r4Sql(x: String) = Portable.r4Sql(x)

  /** q36: distinct aggregation — count(DISTINCT customer) per order
    * status. Spark plans the exact form as a two-shuffle expand; the
    * distinct count routes through [[Ndv.countDistinct]] so
    * `graft.ndv.mode=approx` swaps in the shuffle-free HLL++ sketch with
    * the rest of the NDV family (the gate uses the exact default).
    */
  def distinctAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.groupBy(col("o_orderstatus"))
      .agg(
        Ndv.countDistinct(spark, col("o_custkey")).as("_nc"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderstatus"),
        // clamp: approx-mode HLL may exceed the group's row count
        least(col("_nc"), col("n_orders")).as("n_customers"),
        col("n_orders"))
  }

  val distinctAggSql: String =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
      |       count(*) AS n_orders
      |FROM orders GROUP BY 1""".stripMargin

  /** q37: IVF-style ANN — the third ANN family next to brute force (q25)
    * and hyperplane LSH (q26). "Centroids" are a fixed sample of vectors
    * (vec_id < 16, standing in for k-means output); every vector is
    * assigned to its nearest centroid (argmin over a broadcast 16-row
    * table); a query probes the two nearest centroid lists only. At 100 TB:
    * assignment is a broadcast map (no shuffle of the vector side), and the
    * probe is an equi-join on centroid id over ~2/16ths of the data.
    */
  val IvfCentroids = 16
  val IvfProbes = 2
  val IvfQueries = 8
  val IvfK = 3

  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val cent = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))

    // native codegen'd dot (see graft.functions.VecDot) — the HOF form paid
    // interpreted per-element eval on every (vector, centroid) pair
    def dot(a: Column, b: Column): Column = graft.functions.chess.vecDot(a, b)
    def cos(a: Column, b: Column): Column =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

    // nearest centroid per vector: broadcast 16 rows, argmax cosine
    val assigned = e.join(broadcast(cent), col("vec_id") =!= lit(-1))
      .select(col("vec_id"), col("embedding"), col("c_id"),
        r4(cos(col("embedding"), col("cv"))).as("c_cos"))
      .groupBy(col("vec_id"))
      .agg(
        max(struct(col("c_cos"), (-col("c_id")).as("neg_c"))).as("best"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), (-col("best.neg_c")).as("c_id"))

    // queries probe their IvfProbes nearest centroid lists
    val q = e.filter(col("vec_id") < IvfQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val probes = q.join(broadcast(cent), col("q_id") =!= lit(-1))
      .select(col("q_id"), col("qv"), col("c_id"),
        r4(cos(col("qv"), col("cv"))).as("c_cos"))
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("c_id").asc)
    val probed = probes.withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= IvfProbes)
      .select(col("q_id"), col("qv"), col("c_id"))

    val scored = probed.join(assigned, Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        r4(cos(col("qv"), col("embedding"))).as("score"))
      .dropDuplicates("q_id", "n_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= IvfK)
      .select(col("q_id"), col("n_id"), col("score"), col("rn"))
  }

  val annIvfSql: String = {
    val dot = (a: String, b: String) => Portable.dotSql(a, b)
    val cos = (a: String, b: String) =>
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"""WITH cent AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings
       |              WHERE vec_id < $IvfCentroids),
       |assigned AS (
       |  SELECT vec_id, embedding, c_id FROM (
       |    SELECT e.vec_id, e.embedding, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${r4Sql(cos("e.embedding", "c.cv"))} DESC, c.c_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN cent c)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
       |      WHERE vec_id < $IvfQueries),
       |probed AS (
       |  SELECT q_id, qv, c_id FROM (
       |    SELECT q.q_id, q.qv, c.c_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${r4Sql(cos("q.qv", "c.cv"))} DESC, c.c_id ASC) AS pr
       |    FROM q CROSS JOIN cent c)
       |  WHERE pr <= $IvfProbes),
       |scored AS (
       |  SELECT DISTINCT p.q_id, a.vec_id AS n_id,
       |         ${r4Sql(cos("p.qv", "a.embedding"))} AS score
       |  FROM probed p JOIN assigned a USING (c_id)
       |  WHERE p.q_id <> a.vec_id)
       |SELECT q_id, n_id, score, rn::INT AS rn FROM (
       |  SELECT q_id, n_id, score,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY score DESC, n_id ASC) AS rn
       |  FROM scored)
       |WHERE rn <= $IvfK""".stripMargin
  }

  /** q38: regex tokenization (BPE-ish pre-tokenizer shape): word tokens vs
    * punctuation tokens vs numeric tokens per document.
    */
  def regexTokens(spark: SparkSession, sfDir: String): DataFrame = {
    // native one-pass CharClassCounts (codegen'd) replaces three separate
    // regex scans per row — q38 was the suite's worst sf0.1→sf1 growth
    // (pure per-row compute); semantics pinned ≡ the regex forms in
    // PortableHashSpec, and the oracle still runs the regexes
    val r = graft.functions.chess.charClassCounts(col("text"))
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      r.getField("n_words").as("n_words"),
      r.getField("n_numbers").as("n_numbers"),
      r.getField("n_punct").as("n_punct"))
  }

  // explicit whitespace class, NOT \s: Java's \s = [ \t\n\x0B\f\r]
  // includes vertical tab, RE2's (DuckDB) does not — on a document
  // containing U+000B the two \s shorthands disagree about n_punct.
  // Spelling the class out pins both engines (and the native kernel,
  // which implements exactly this set) to identical semantics.
  val regexTokensSql: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '[A-Za-z]+'))::INT AS n_words,
      |  len(regexp_extract_all(text, '[0-9]+'))::INT AS n_numbers,
      |  len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\x0b\f\r]'))::INT AS n_punct
      |FROM documents""".stripMargin

  /** (column, isNumeric) list profiled by q76 — single source for both the
    * Spark aggregation and the generated per-column oracle UNION.
    */
  val ProfileCols: Seq[(String, Boolean)] = Seq(
    ("o_orderkey", true), ("o_custkey", true), ("o_orderstatus", false),
    ("o_totalprice", true), ("o_orderpriority", false))

  /** q76: table profiling — the ANALYZE-style statistics pass (null counts,
    * exact NDV, numeric min/max) that feeds cost-based optimization and
    * data-quality monitoring. ONE scan: every measure for every column is
    * computed in a single aggregation (count/min/max are map-side
    * combinable; the distinct counts expand but still share the scan), then
    * one row per column is unpivoted out of the single result row. Numeric
    * extremes are cast to double INSIDE the engine — emitting them as
    * strings would hang parity on cross-engine float formatting.
    */
  def profile(spark: SparkSession, sfDir: String): DataFrame = {
    val aggs = count(lit(1)).as("_n") +: ProfileCols.flatMap { case (c, num) =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        Ndv.countDistinct(spark, col(c)).as(s"${c}__nd")) ++
        (if (num) Seq(
          min(col(c)).cast("double").as(s"${c}__mn"),
          max(col(c)).cast("double").as(s"${c}__mx"))
         else Nil)
    }
    val one = Tables.orders(spark, sfDir).agg(aggs.head, aggs.tail: _*)
    val rows = ProfileCols.map { case (c, num) =>
      struct(
        lit(c).as("column"),
        col("_n").as("n_total"),
        (col("_n") - col(s"${c}__nn")).as("n_null"),
        // clamp: the approx-mode HLL estimate may exceed the non-null
        // count; exact-mode no-op (nd ≤ nn by definition)
        least(col(s"${c}__nd"), col(s"${c}__nn")).as("n_distinct"),
        (if (num) col(s"${c}__mn") else lit(null).cast("double")).as("min_d"),
        (if (num) col(s"${c}__mx") else lit(null).cast("double")).as("max_d"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** q77 histogram bounds — fixed literals (not data-derived min/max) so
    * the bucketing is stable under data growth and shared with the oracle.
    */
  val HistMin = 0.0
  val HistWidth = 50000.0
  val HistBuckets = 12

  /** q77: equi-width histogram of `o_totalprice` — the distribution-sketch
    * companion to q76's scalar profile (feeds skew detection and CBO
    * selectivity). Bucket index is clamped integer math over fixed bounds;
    * one scan, one map-side-combinable aggregation on ≤ HistBuckets keys.
    */
  def histogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(least(lit(HistBuckets - 1), greatest(lit(0),
        floor((col("o_totalprice") - HistMin) / HistWidth)))
        .cast("int").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(HistMin) + col("bucket") * HistWidth).as("lo"),
        (lit(HistMin) + (col("bucket") + 1) * HistWidth).as("hi"),
        col("n"))

  val histogramSql: String =
    s"""SELECT bucket,
       |  $HistMin + bucket * $HistWidth AS lo,
       |  $HistMin + (bucket + 1) * $HistWidth AS hi,
       |  count(*) AS n
       |FROM (SELECT least(${HistBuckets - 1}, greatest(0,
       |        floor((o_totalprice - $HistMin) / $HistWidth)))::INT AS bucket
       |      FROM orders)
       |GROUP BY 1""".stripMargin

  val profileSql: String = ProfileCols.map { case (c, num) =>
    val mn = if (num) s"min($c)::DOUBLE" else "NULL::DOUBLE"
    val mx = if (num) s"max($c)::DOUBLE" else "NULL::DOUBLE"
    s"""SELECT '$c' AS column, count(*) AS n_total,
       |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
       |  $mn AS min_d, $mx AS max_d FROM orders""".stripMargin
  }.mkString("\nUNION ALL\n")

  /** q88: equi-DEPTH histogram (deciles) — q77's sibling with data-derived
    * boundaries. NOT `ntile` over a global sort (the single-ordered-window
    * shape that dies at scale): the 9 interior cut points are one exact-
    * percentile aggregation, r4-rounded (so both engines compare identical
    * thresholds), broadcast back, and each row counts the cuts strictly
    * below its value — a narrow map + a ≤10-key aggregation. Ties landing
    * on a cut collapse into the same bucket on both engines by the same
    * strict-inequality rule (bucket populations are then not exactly N/10
    * with heavy ties — that's inherent to equi-depth on discrete data, not
    * an engine artifact).
    */
  val DepthBuckets = 10

  def equiDepthHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val fracs = (1 until DepthBuckets).map(_.toDouble / DepthBuckets)
    // r4 per element AFTER the agg materializes the array (a lambda over a
    // materialized column is data access, not re-evaluation)
    val cuts = Tables.orders(spark, sfDir)
      .agg(Quantiles.pcts(spark, col("o_totalprice"), fracs).as("raw"))
      .select(transform(col("raw"), q => r4(q)).as("cuts"))
    Tables.orders(spark, sfDir)
      .crossJoin(broadcast(cuts))
      .select(size(filter(col("cuts"),
        c => c < col("o_totalprice"))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  val equiDepthHistogramSql: String = {
    val fracs = (1 until DepthBuckets).map(_.toDouble / DepthBuckets)
      .mkString("[", ", ", "]")
    s"""WITH cuts AS (
       |  SELECT list_transform(quantile_cont(o_totalprice, $fracs),
       |           q -> ${r4Sql("q")}) AS cuts
       |  FROM orders)
       |SELECT len(list_filter(cuts, c -> c < o_totalprice))::INT AS bucket,
       |       count(*) AS n
       |FROM orders CROSS JOIN cuts
       |GROUP BY 1""".stripMargin
  }

  /** q89: group-wise OLS regression from sufficient statistics — slope,
    * intercept, and R² of extendedprice ~ quantity per returnflag, computed
    * from the five classic sums (n, Σx, Σy, Σxy, Σx², Σy²). This is the
    * distributed-ML shape: ONE map-side-combinable aggregation produces
    * everything (no per-group iteration, no driver math over row data) —
    * the same plan at 100 TB, just more partials. Deliberately raw-sum
    * formulas on both engines instead of builtin regr_* (whose internal
    * updates differ engine-to-engine); the r4 rounding absorbs the
    * summation-order ulps exactly like every other double aggregate here.
    */
  def groupOls(spark: SparkSession, sfDir: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select({
        // bind num/den once, mirroring the SQL twin's val num/val den —
        // repeated inline copies would let a future edit desynchronize
        // slope from intercept/r2
        val num = col("n") * col("sxy") - col("sx") * col("sy")
        val den = col("n") * col("sxx") - col("sx") * col("sx")
        Seq(
          col("l_returnflag"),
          col("n").cast("long").as("n_rows"),
          r4(num / den).as("slope"),
          r4((col("sy") - num / den * col("sx")) / col("n")).as("intercept"),
          r4((num * num) /
            (den * (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"))
      }: _*)
  }

  /** q95 targets: one low-cardinality/skewed key and one high-cardinality
    * key — the two regimes a skew report must distinguish.
    */
  val SkewCols: Seq[String] = Seq("o_custkey", "o_orderpriority")

  /** q95: key-skew diagnostics — per candidate shuffle key: NDV, max and
    * p99 group sizes, and the max/mean skew ratio. This is the measurement
    * that DECIDES when the salting operators (q41/q67) and AQE skew
    * handling are needed — shipping the diagnostic next to the mitigation
    * is the point. One hash agg per key (group sizes) + a tiny second agg;
    * nothing leaves the executors but the per-key summary row.
    */
  def skewReport(spark: SparkSession, sfDir: String): DataFrame =
    SkewCols.map { c =>
      Tables.orders(spark, sfDir)
        .groupBy(col(c)).agg(count(lit(1)).as("n"))
        .agg(
          lit(c).as("key_col"),
          count(lit(1)).as("ndv"),
          sum(col("n")).as("n_rows"),
          max(col("n")).as("max_group"),
          r4(percentile(col("n"), lit(0.99))).as("p99_group"),
          r4(max(col("n")).cast("double") /
            (sum(col("n")).cast("double") / count(lit(1)).cast("double")))
            .as("skew_ratio"))
        .select(col("key_col"), col("ndv"), col("n_rows"), col("max_group"),
          col("p99_group"), col("skew_ratio"))
    }.reduce(_ unionByName _)

  val skewReportSql: String = SkewCols.map { c =>
    s"""SELECT '$c' AS key_col, count(*)::BIGINT AS ndv,
       |  sum(n)::BIGINT AS n_rows, max(n)::BIGINT AS max_group,
       |  ${r4Sql("quantile_cont(n, 0.99)")} AS p99_group,
       |  ${r4Sql("max(n)::DOUBLE / (sum(n)::DOUBLE / count(*)::DOUBLE)")} AS skew_ratio
       |FROM (SELECT $c, count(*) AS n FROM orders GROUP BY 1)""".stripMargin
  }.mkString("\nUNION ALL\n")

  /** q96: referential-integrity audit — orphan counts for every declared
    * FK edge of the star schema in one result table. Each relation is a
    * distinct-project + LEFT ANTI join (the parent side is key-distinct,
    * so AQE broadcasts the small parents and shuffles the big ones on the
    * key — exactly the shape an FK check keeps at 100 TB); auditing the
    * DISTINCT child keys, not child rows, caps the anti-join input at NDV.
    */
  val FkEdges: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"))

  def fkAudit(spark: SparkSession, sfDir: String): DataFrame =
    FkEdges.map { case (child, ck, parent, pk) =>
      // NULL child keys are excluded on BOTH engines (SQL FK semantics: a
      // NULL FK violates nothing; and Spark's distinct keeps NULL while
      // DuckDB's count(DISTINCT) drops it — filtering first removes the
      // latent divergence). ONE pass: left join + null-probe count, not a
      // separate anti-join re-aggregation of the child keys.
      val childKeys = Tables.table(spark, sfDir, child)
        .select(col(ck).as("k")).filter(col("k").isNotNull).distinct()
      val parentKeys = Tables.table(spark, sfDir, parent)
        .select(col(pk).as("k")).distinct()
        .withColumn("hit", lit(1))
      childKeys.join(parentKeys, Seq("k"), "left")
        .agg(
          lit(s"$child.$ck -> $parent.$pk").as("fk"),
          count(lit(1)).as("n_child_keys"),
          sum(col("hit").isNull.cast("long")).as("n_orphans"))
    }.reduce(_ unionByName _)

  val fkAuditSql: String = FkEdges.map { case (child, ck, parent, pk) =>
    s"""SELECT '$child.$ck -> $parent.$pk' AS fk,
       |  count(*) AS n_child_keys,
       |  sum((p.k IS NULL)::INT)::BIGINT AS n_orphans
       |FROM (SELECT DISTINCT $ck AS k FROM $child WHERE $ck IS NOT NULL) c
       |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parent) p USING (k)""".stripMargin
  }.mkString("\nUNION ALL\n")

  /** q97: candidate-key check — for each proposed key column set: total
    * rows, distinct combinations, and whether the set is a key. One
    * count-distinct aggregation per candidate (hash-agg on the candidate
    * columns — the same cost profile as the dedup fingerprint agg).
    */
  val KeyCandidates: Seq[(String, Seq[String])] = Seq(
    ("orders", Seq("o_orderkey")),
    ("orders", Seq("o_custkey")),
    ("orders", Seq("o_custkey", "o_orderdate")),
    ("lineitem", Seq("l_orderkey", "l_linenumber")))

  def keyCheck(spark: SparkSession, sfDir: String): DataFrame =
    KeyCandidates.map { case (table, cols) =>
      // n_distinct counts distinct tuples with NO NULL component (Spark's
      // countDistinct semantics; the oracle filters explicitly to match).
      // is_key = n_rows == n_distinct is then the REAL key predicate: it
      // fails on duplicates AND on any NULL in the candidate — a key
      // column must be unique and non-null.
      Tables.table(spark, sfDir, table).agg(
        lit(s"$table(${cols.mkString(",")})").as("candidate"),
        count(lit(1)).as("n_rows"),
        countDistinct(cols.head, cols.tail: _*).as("n_distinct"))
        .select(col("candidate"), col("n_rows"), col("n_distinct"),
          (col("n_rows") === col("n_distinct")).cast("int").as("is_key"))
    }.reduce(_ unionByName _)

  val keyCheckSql: String = KeyCandidates.map { case (table, cols) =>
    val tuple = cols.mkString(", ")
    val nonNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    val distinctCount =
      s"(SELECT count(*) FROM (SELECT DISTINCT $tuple FROM $table WHERE $nonNull))"
    s"""SELECT '$table(${cols.mkString(",")})' AS candidate,
       |  count(*) AS n_rows,
       |  $distinctCount AS n_distinct,
       |  (count(*) = $distinctCount)::INT AS is_key
       |FROM $table""".stripMargin
  }.mkString("\nUNION ALL\n")

  /** q114: join-cardinality estimator audit — for every declared FK edge,
    * the textbook equi-join estimate |A⋈B| ≈ nA·nB / max(ndv(A), ndv(B))
    * next to the ACTUAL join count. The planner-diagnostics companion to
    * q95/q96/q97: a large actual/estimate gap on real data is exactly the
    * signal (correlated keys, skew) that makes a cost-based optimizer
    * mis-order joins — this op is how you find it before the planner does.
    *
    * Scale shape: per edge, two single-row aggregations (count +
    * distinct-count per side) and one equi-join count — the same costs the
    * q96 audit already pays; the three 1-row frames combine via cross
    * joins (broadcast by construction). The distinct counts route through
    * [[Ndv.countDistinct]]: exact (oracle bit-parity) by default, the HLL++
    * sketch with no distinct-key shuffle under `graft.ndv.mode=approx` —
    * the 100 TB form for near-unique audited keys. est is floor(double)
    * math — exact while nA·nB < 2^53; past that (true 100 TB joint) widen
    * to decimal(38,0) on both engines, same shape.
    */
  def joinCardinality(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE stats pass per TABLE covering every column that table
    // contributes to any edge (r15: the per-edge form scanned lineitem
    // three times for its three child keys and once more per join; the
    // shared pass is one scan + one aggregation per table — at 100 TB
    // that is 4 fewer full passes over the fact table). Values are
    // unchanged: the same count/countDistinct per column, just computed
    // side by side in one aggregate.
    val colsByTable: Seq[(String, Seq[String])] =
      FkEdges.flatMap { case (c, ck, p, pk) => Seq(c -> ck, p -> pk) }
        .distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
    // one 1-row frame holding EVERY (table, col) stat: the per-table aggs
    // cross-joined once (all 1-row broadcasts), shared by every edge row —
    // the five copies in the unioned plan are identical subtrees, so
    // exchange/broadcast reuse executes them once
    val allStats = colsByTable.map { case (table, cols) =>
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"n__${table}__$c"),
          Ndv.countDistinct(spark, col(c)).as(s"ndv__${table}__$c"))
      }
      Tables.table(spark, sfDir, table).agg(aggs.head, aggs.tail: _*)
    }.reduce(_ crossJoin _)
    // the five actual-join counts union into one 5-row frame FIRST, then
    // ONE cross join attaches the stats row to all of them — the stats
    // chain appears once in the plan instead of once per edge (the v3
    // per-edge crossjoin form still scheduled a job chain per branch)
    val actuals = FkEdges.map { case (child, ck, parent, pk) =>
      Tables.table(spark, sfDir, child)
        .join(Tables.table(spark, sfDir, parent), col(ck) === col(pk))
        .agg(count(lit(1)).as("actual_rows"))
        .select(lit(s"$child.$ck -> $parent.$pk").as("fk"),
          col("actual_rows"))
    }.reduce(_ unionByName _)
    // per-edge stat columns, selected by the fk literal (exact string
    // equality on the same literals the rows carry — no fuzziness)
    def edgeCase(f: (String, String, String, String) => Column): Column =
      FkEdges.foldLeft(lit(null).cast("long")) {
        case (acc, (child, ck, parent, pk)) =>
          when(col("fk") === s"$child.$ck -> $parent.$pk",
            f(child, ck, parent, pk)).otherwise(acc)
      }
    val nC = edgeCase((c, ck, _, _) => col(s"n__${c}__$ck"))
    val nP = edgeCase((_, _, p, pk) => col(s"n__${p}__$pk"))
    // clamp ndv ≤ n (approx-mode HLL can overshoot; exact no-op)
    val ndvC = edgeCase((c, ck, _, _) =>
      least(col(s"ndv__${c}__$ck"), col(s"n__${c}__$ck")))
    val ndvP = edgeCase((_, _, p, pk) =>
      least(col(s"ndv__${p}__$pk"), col(s"n__${p}__$pk")))
    actuals.crossJoin(allStats).select(
      col("fk"),
      nC.as("n_child"), ndvC.as("ndv_child"),
      nP.as("n_parent"), ndvP.as("ndv_parent"),
      coalesce(
        floor(nC.cast("double") * nP /
          nullif(greatest(ndvC, ndvP), lit(0L)))
          .cast("long"),
        lit(0L)).as("est_rows"),
      col("actual_rows"))
  }

  val joinCardinalitySql: String = FkEdges.map { case (child, ck, parent, pk) =>
    s"""SELECT '$child.$ck -> $parent.$pk' AS fk,
       |  (SELECT count($ck) FROM $child) AS n_child,
       |  (SELECT count(DISTINCT $ck) FROM $child) AS ndv_child,
       |  (SELECT count($pk) FROM $parent) AS n_parent,
       |  (SELECT count(DISTINCT $pk) FROM $parent) AS ndv_parent,
       |  coalesce(floor(
       |    (SELECT count($ck) FROM $child)::DOUBLE
       |      * (SELECT count($pk) FROM $parent)
       |      / nullif(greatest((SELECT count(DISTINCT $ck) FROM $child),
       |                        (SELECT count(DISTINCT $pk) FROM $parent)), 0))::BIGINT,
       |  0) AS est_rows,
       |  (SELECT count(*) FROM $child JOIN $parent ON $ck = $pk) AS actual_rows""".stripMargin
  }.mkString("\nUNION ALL\n")

  val groupOlsSql: String = {
    val num = "(n * sxy - sx * sy)"
    val den = "(n * sxx - sx * sx)"
    s"""WITH s AS (
       |  SELECT l_returnflag, count(*)::DOUBLE AS n,
       |         sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
       |         sum(l_quantity * l_extendedprice) AS sxy,
       |         sum(l_quantity * l_quantity) AS sxx,
       |         sum(l_extendedprice * l_extendedprice) AS syy
       |  FROM lineitem GROUP BY 1)
       |SELECT l_returnflag, n::BIGINT AS n_rows,
       |       ${r4Sql(s"$num / $den")} AS slope,
       |       ${r4Sql(s"(sy - $num / $den * sx) / n")} AS intercept,
       |       ${r4Sql(s"($num * $num) / ($den * (n * syy - sy * sy))")} AS r2
       |FROM s""".stripMargin
  }

  // ------------------------------------------------------ q120 KS drift

  /** Fixed ECDF grid for the KS statistic: [[KsBins]] bins of [[KsWidth]]
    * currency units, values past the top edge clamped into the last bin.
    */
  val KsBins = 1000
  val KsWidth = 1000.0

  /** q120: two-sample Kolmogorov–Smirnov drift statistic between the
    * even-key and odd-key halves of `orders` on o_totalprice — the
    * distribution-shift monitor a pipeline runs between yesterday's and
    * today's partition (or train vs. serve) before trusting a model or a
    * threshold tuned on the old data. KS = max |ECDF_a − ECDF_b|.
    *
    * The textbook ECDF needs a global sort + prefix-sum over every row —
    * the classic unscalable single-partition window. This computes the
    * BINNED form instead: counts per fixed [[KsBins]]-cell grid (one
    * hash aggregation, map-side combinable), then the cumulative pass is
    * [[ScaleOps.rangedCumSum]] — range-partitioned local prefix sums plus
    * broadcast cross-range offsets, NO partition-less window anywhere in
    * the plan — and the grand totals are a 1-row aggregate broadcast back.
    * The frame is ≤[[KsBins]] rows here, but the plan no longer relies on
    * that: widen the grid 1000× and the prefix work still spreads across
    * tasks. Grid quantization changes the statistic by at most the
    * within-bin mass (report-grade; tighten by widening [[KsBins]]).
    *
    * Parity: bin ids and cumulative counts are exact integers; the two
    * ECDF divisions happen on identical (BIGINT, BIGINT) operands on both
    * engines, so even the argmax tie-break (lowest bin at the max) sees
    * bit-identical doubles.
    */
  def ksDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val bin = least(lit(KsBins - 1),
      floor(col("o_totalprice") / KsWidth)).cast("int")
    val counts = Tables.orders(spark, sfDir)
      .select(bin.as("bin"), (col("o_orderkey") % 2 === 0).as("is_a"))
      .groupBy(col("bin"))
      .agg(
        sum(col("is_a").cast("long")).as("ca"),
        sum((!col("is_a")).cast("long")).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val cum = ScaleOps.rangedCumSum(counts, "bin", floor(col("bin") / 64),
        Seq("ca" -> "cum_a", "cb" -> "cum_b"))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n_a"), col("n_b"),
        abs(col("cum_a").cast("double") / col("n_a") -
          col("cum_b").cast("double") / col("n_b")).as("d"))
    cum.agg(
        max(col("n_a")).as("n_a"),
        max(col("n_b")).as("n_b"),
        max(struct(col("d"), (-col("bin")).as("neg_bin"))).as("best"))
      .select(col("n_a"), col("n_b"),
        Portable.r4(col("best.d")).as("ks"),
        (-col("best.neg_bin")).cast("int").as("ks_bin"))
  }

  val ksDriftSql: String =
    s"""WITH b AS (
       |  SELECT least(${KsBins - 1}, floor(o_totalprice / $KsWidth))::INT AS bin,
       |         (o_orderkey % 2 = 0) AS is_a
       |  FROM orders),
       |counts AS (
       |  SELECT bin, sum(is_a::INT)::BIGINT AS ca,
       |         sum((NOT is_a)::INT)::BIGINT AS cb
       |  FROM b GROUP BY 1),
       |cum AS (
       |  SELECT bin,
       |         sum(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_a,
       |         sum(cb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_b
       |  FROM counts),
       |tot AS (SELECT max(cum_a) AS n_a, max(cum_b) AS n_b FROM cum),
       |d AS (
       |  SELECT bin, n_a, n_b,
       |         abs(cum_a::DOUBLE / n_a - cum_b::DOUBLE / n_b) AS d
       |  FROM cum CROSS JOIN tot),
       |m AS (SELECT max(d) AS md FROM d)
       |SELECT max(d.n_a)::BIGINT AS n_a, max(d.n_b)::BIGINT AS n_b,
       |       ${Portable.r4Sql("max(d.d)")} AS ks,
       |       min(d.bin)::INT AS ks_bin
       |FROM d JOIN m ON d.d = m.md""".stripMargin

  // ------------------------------------------------------ q124 PSI drift

  /** PSI grid over c_acctbal (TPC-H range [-999.99, 9999.99]): offset,
    * cell width, cell count, and the fixed-point scale for the per-bin
    * log-ratio terms (parts per 1e9 — the q109 entropy regime).
    */
  val PsiOffset = 1000.0
  val PsiWidth = 500.0
  val PsiBins = 22
  val PsiScale = 1000000000L

  /** q124: population-stability index per customer segment — the
    * per-group, magnitude-weighted companion of q120's corpus-level KS:
    * PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b) between the even-key and
    * odd-key halves on the account-balance distribution. Monitoring
    * convention: < 0.1 stable, > 0.25 investigate — per segment, so a
    * shift isolated to one cohort is not diluted by the rest.
    *
    * Bins are add-one smoothed over the OBSERVED (segment, bin) cells
    * (a cell empty on one side would otherwise send ln(p_a/p_b) to ±∞;
    * cells empty on both sides don't exist in either engine, so the
    * smoothed denominators n + |cells| agree exactly). Parity: counts
    * and denominators are exact integers, each bin's term is computed
    * from identical doubles and floor-scaled to integer [[PsiScale]]ths
    * BEFORE the per-segment sum — the unordered float sum never happens.
    *
    * Scale shape: one hash aggregation to the (segment, bin) grid, a
    * |segments|-row total table broadcast back, one bounded rollup — no
    * window at all (unlike q120 there is no cumulative pass; PSI is a
    * per-bin sum), plan identical at any corpus size.
    */
  def psiDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val bin = least(lit(PsiBins - 1),
      greatest(lit(0), floor((col("c_acctbal") + PsiOffset) / PsiWidth)))
      .cast("int")
    val counts = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), bin.as("bin"),
        (col("c_custkey") % 2 === 0).as("is_a"))
      .groupBy(col("c_mktsegment"), col("bin"))
      .agg(
        sum(col("is_a").cast("long")).as("ca"),
        sum((!col("is_a")).cast("long")).as("cb"))
    val tot = counts.groupBy(col("c_mktsegment"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        count(lit(1)).as("ncells"))
    val pa = (col("ca") + 1).cast("double") / (col("na") + col("ncells")).cast("double")
    val pb = (col("cb") + 1).cast("double") / (col("nb") + col("ncells")).cast("double")
    val term = (pa - pb) * log(pa / pb)
    counts.join(broadcast(tot), "c_mktsegment")
      .select(col("c_mktsegment"), col("na"), col("nb"), col("ncells"),
        floor(term * PsiScale + 0.5).cast("long").as("ti"))
      .groupBy(col("c_mktsegment"))
      .agg(
        max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("ncells")).cast("int").as("n_bins"),
        r4(sum(col("ti")).cast("double") / PsiScale).as("psi"))
  }

  val psiDriftSql: String = {
    val pa = "(ca + 1)::DOUBLE / (na + ncells)::DOUBLE"
    val pb = "(cb + 1)::DOUBLE / (nb + ncells)::DOUBLE"
    s"""WITH b AS (
       |  SELECT c_mktsegment,
       |         least(${PsiBins - 1},
       |               greatest(0, floor((c_acctbal + $PsiOffset) / $PsiWidth)))::INT AS bin,
       |         (c_custkey % 2 = 0) AS is_a
       |  FROM customer),
       |counts AS (
       |  SELECT c_mktsegment, bin,
       |         sum(is_a::INT)::BIGINT AS ca,
       |         sum((NOT is_a)::INT)::BIGINT AS cb
       |  FROM b GROUP BY 1, 2),
       |tot AS (
       |  SELECT c_mktsegment, sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
       |         count(*) AS ncells
       |  FROM counts GROUP BY 1),
       |terms AS (
       |  SELECT c.c_mktsegment, t.na, t.nb, t.ncells,
       |         floor((($pa) - ($pb)) * ln(($pa) / ($pb)) * $PsiScale + 0.5)::BIGINT AS ti
       |  FROM counts c JOIN tot t USING (c_mktsegment))
       |SELECT c_mktsegment, max(na) AS n_a, max(nb) AS n_b,
       |       max(ncells)::INT AS n_bins,
       |       ${r4Sql(s"sum(ti)::DOUBLE / $PsiScale")} AS psi
       |FROM terms GROUP BY 1""".stripMargin
  }

  // ------------------------------------------- q129 period-over-period

  /** q129: month-over-month revenue growth — the canonical BI trend
    * report: monthly order count + revenue, each month's percent change
    * vs the previous month (NULL for the first month on both engines).
    *
    * Scale shape: one hash aggregation collapses the fact table to
    * O(months) rows; the lag is [[ScaleOps.rangedLag]] — year-partitioned
    * local windows with the cross-year boundary row exchanged through a
    * broadcast theta-join — so even the calendar-bounded frame runs with
    * no partition-less window (and the same plan holds if the period key
    * were something unbounded, e.g. a per-minute series). Parity: revenue
    * is r4-rounded BEFORE the lag/division, so the growth arithmetic
    * consumes identical doubles on both engines.
    */
  def momGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val monthly = Tables.orders(spark, sfDir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        r4(sum(col("o_totalprice"))).as("revenue"))
    ScaleOps.rangedLag(monthly, "month", substring(col("month"), 1, 4),
        "revenue", "prev")
      .select(col("month"), col("n_orders"), col("revenue"),
        r4((col("revenue") - col("prev")) / col("prev") * 100.0)
          .as("growth_pct"))
  }

  val momGrowthSql: String =
    s"""WITH m AS (
       |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |         count(*) AS n_orders,
       |         ${r4Sql("sum(o_totalprice)")} AS revenue
       |  FROM orders GROUP BY 1)
       |SELECT month, n_orders, revenue,
       |       ${r4Sql(
             "(revenue - lag(revenue) OVER (ORDER BY month)) / lag(revenue) OVER (ORDER BY month) * 100.0")} AS growth_pct
       |FROM m""".stripMargin

  // --------------------------------------------------- q139 pareto skyline

  /** q139: pareto frontier (skyline) — the parts not STRICTLY dominated on
    * (retail price, size): no other part has both a strictly higher price
    * and a strictly larger size. The multi-objective "best tradeoffs"
    * operator (skyline of Börzsönyi et al. 2001) — shortlisting candidates
    * where no single score ranks them — with price pinned to integer cents
    * so dominance is exact on both engines.
    *
    * Scale shape: the naive form is an O(N²) NOT EXISTS self-join. This
    * plan collapses the fact table to one row per DISTINCT price (a hash
    * aggregation taking max(size)), computes the strict-prefix running max
    * over that summary with [[ScaleOps.rangedPrefixMax]] — range-
    * partitioned local windows + broadcast cross-range offsets, so the
    * prefix pass spreads over tasks even when ndv(price) is NOT
    * structurally capped (an arbitrary 100 TB corpus, unlike this ≤10⁷-
    * cell price domain) — and equi-joins the per-price dominance threshold
    * back. A point survives iff the max size among strictly higher prices
    * (NULL for the top price) does not exceed its own size. Cost: two hash
    * shuffles + range-local windows over the summary.
    *
    * Parity: ROWS BETWEEN … AND 1 PRECEDING over DISTINCT descending
    * prices ≡ "strictly higher price" on both engines; all comparisons are
    * integer.
    */
  def paretoFrontier(spark: SparkSession, sfDir: String): DataFrame = {
    val pts = Tables.part(spark, sfDir).select(
      col("p_partkey"),
      floor(col("p_retailprice") * 100.0 + 0.5).cast("long").as("price_c"),
      col("p_size"))
    val summary = pts.groupBy(col("price_c")).agg(max(col("p_size")).as("mx"))
    val thr = ScaleOps.rangedPrefixMax(summary, "price_c",
        floor(col("price_c") / 16384), "mx", "thr", desc = true)
      .select(col("price_c"), col("thr"))
    pts.join(thr, "price_c")
      .filter(col("thr").isNull || col("thr") <= col("p_size"))
      .select(col("p_partkey"), col("price_c"), col("p_size"))
  }

  val paretoFrontierSql: String =
    s"""WITH pts AS (
       |  SELECT p_partkey, floor(p_retailprice * 100.0 + 0.5)::BIGINT AS price_c, p_size
       |  FROM part),
       |s AS (SELECT price_c, max(p_size) AS mx FROM pts GROUP BY 1),
       |t AS (
       |  SELECT price_c,
       |         max(mx) OVER (ORDER BY price_c DESC
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS thr
       |  FROM s)
       |SELECT p.p_partkey, p.price_c, p.p_size
       |FROM pts p JOIN t USING (price_c)
       |WHERE t.thr IS NULL OR t.thr <= p.p_size""".stripMargin

  // ------------------------------------------------ q156 k-anonymity audit

  /** Anonymity threshold: an equivalence class smaller than this exposes
    * its members.
    */
  val KAnonK = 5
  /** Account-balance banding width for the quasi-identifier tuple. */
  val KAnonBalBand = 1000.0

  /** q156: k-anonymity audit — the equivalence classes of the
    * quasi-identifier tuple (segment, nation, balance band) with fewer
    * than [[KAnonK]] members: exactly the rows a privacy review flags
    * before a dataset release (any member of a small class is
    * re-identifiable by joining public attributes). The privacy-side
    * companion of q71's content redaction: q71 scrubs VALUES, this audits
    * the COMBINATION structure that no per-value scrubbing fixes.
    *
    * Scale shape: one hash aggregation on the quasi-id tuple + one
    * filter — two-phase, map-side combinable, output bounded by the
    * quasi-id domain. Banding is floor division (identical on both
    * engines, negative balances land in the −1 band by floor semantics).
    */
  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / KAnonBalBand).cast("long").as("bal_band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < KAnonK)

  val kAnonymitySql: String =
    s"""SELECT c_mktsegment, c_nationkey,
       |       floor(c_acctbal / $KAnonBalBand)::BIGINT AS bal_band,
       |       count(*) AS n
       |FROM customer
       |GROUP BY 1, 2, 3 HAVING count(*) < $KAnonK""".stripMargin

  // ------------------------------------- q230 DP-release noise calibration

  /** Total privacy budget ε of the release series. */
  val DpEpsilon = 1.0

  /** Number of releases the budget is split across (basic sequential
    * composition: each release runs at ε/R).
    */
  val DpReleases = 4

  /** A released cell is publishable when its count is at least this many
    * Laplace scales — signal-to-noise ≥ 10, i.e. expected relative error
    * ≤ 10%.
    */
  val DpSnrMin = 10.0

  /** Document length-bucket width (tokens) of the released histogram. */
  val DpLenBand = 64L

  /** q230: differential-privacy noise calibration for a histogram release
    * — the audit a data owner runs BEFORE publishing corpus statistics
    * under a DP budget (Laplace mechanism, Dwork et al. 2006). Count
    * queries have sensitivity 1 (one document moves one cell by one), so
    * each of the [[DpReleases]] sequential releases at ε/R adds
    * Laplace(b) noise with scale b = R/ε; the expected absolute error of
    * a cell is exactly b and the expected relative error b/n. The frame
    * published here is deterministic ON PURPOSE: it contains no noise
    * draws (those happen once at release time, outside the query engine)
    * but the full calibration — per (lang, length-band) cell: true
    * count, noise scale, expected relative error, and whether the cell
    * clears the [[DpSnrMin]] signal-to-noise bar. Cells that fail are
    * the ones a release either suppresses or coarsens (wider bands ⇒
    * bigger counts ⇒ publishable), which is precisely the band-width /
    * budget trade a ModeBench sweep measures.
    *
    * Scale shape: one hash aggregation to the (lang × band) grid —
    * output bounded by the released domain, never the corpus — then pure
    * projection arithmetic on the grid. Parity: counts are exact
    * integers; b and ε are shared constants; the relative error is one
    * exact ratio, r4'd.
    */
  def dpHistogram(spark: SparkSession, sfDir: String): DataFrame =
    dpHistogramAt(spark, sfDir, DpLenBand)

  /** The q230 frame at any band width — the ModeBench sweep surface
    * (coarser bands ⇒ bigger counts ⇒ more publishable cells).
    */
  def dpHistogramAt(spark: SparkSession, sfDir: String,
      band: Long): DataFrame = {
    val b = DpReleases / DpEpsilon // Laplace scale per release
    Tables.documents(spark, sfDir)
      .select(col("lang"),
        (floor(size(Portable.toks(col("text")))
          .cast("long") / band) * band).cast("long").as("len_band"))
      .groupBy(col("lang"), col("len_band"))
      .agg(count(lit(1)).as("n"))
      .select(col("lang"), col("len_band"), col("n"),
        Portable.r4(lit(DpEpsilon / DpReleases)).as("eps_per_release"),
        Portable.r4(lit(b)).as("noise_scale"),
        Portable.r4(lit(b) / col("n").cast("double")).as("exp_rel_err"),
        (col("n").cast("double") >= lit(DpSnrMin * b)).cast("int")
          .as("publishable"))
  }

  val dpHistogramSql: String = {
    val b = s"($DpReleases / $DpEpsilon)"
    s"""WITH g AS (
       |  SELECT lang,
       |         (floor(len(${Portable.toksSql})::BIGINT / $DpLenBand)
       |          * $DpLenBand)::BIGINT AS len_band
       |  FROM documents),
       |c AS (SELECT lang, len_band, count(*)::BIGINT AS n
       |      FROM g GROUP BY 1, 2)
       |SELECT lang, len_band, n,
       |       ${Portable.r4Sql(s"$DpEpsilon / $DpReleases")} AS eps_per_release,
       |       ${Portable.r4Sql(b)} AS noise_scale,
       |       ${Portable.r4Sql(s"$b / n::DOUBLE")} AS exp_rel_err,
       |       (n::DOUBLE >= $DpSnrMin * $b)::INT AS publishable
       |FROM c""".stripMargin
  }

  // ------------------------------------ q273 Wasserstein quality shift

  /** q273: per-source 1-Wasserstein (earth-mover) distance between the
    * source's quality distribution and the rest of the corpus — computed
    * EXACTLY on the q17 r4 grid as W₁ = Σ |ECDF_src − ECDF_rest| · Δcell
    * over realized grid cells (for 1-D distributions W₁ is the area
    * between the ECDFs, so the lossless binning makes this the exact
    * statistic, not an approximation). The metric-valued sibling of
    * q254's rank test: Mann–Whitney says WHETHER a source's quality sits
    * above or below the corpus, W₁ says BY HOW MUCH in score units — the
    * number data-valuation and shift-monitoring read (it is the distance
    * the q120 KS statistic bounds but does not measure).
    *
    * Scale shape: the ECDFs are integrated over the FIXED 10⁴-cell r4
    * grid (unit cell width — no next-cell lookup, hence no partition-less
    * window anywhere): a (grid × sources) frame bounded by
    * 10⁴·|sources| regardless of corpus size; per-source prefixes are
    * windows partitioned by source (grid-bounded partitions), the corpus
    * prefix is [[ScaleOps.rangedCumSum]].
    *
    * Parity: ECDF diffs are exact-integer cross products
    * |cum_s·n_rest − cum_rest·n_s| in DECIMAL/HUGEINT summed over unit
    * cells; ONE division at the end, r4'd.
    */
  def wassersteinShift(spark: SparkSession, sfDir: String): DataFrame = {
    val q = TextOps.qualityScore(spark, sfDir).select(col("doc_id"),
      floor(col("quality") * 10000.0 + 0.5).cast("long").as("qi"))
    val cells = q.join(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("source")),
        "doc_id")
      .groupBy(col("source"), col("qi"))
      .agg(count(lit(1)).as("nsc"))
    val fullGrid = spark.range(10001L).select(col("id").as("qi"))
    val corpus = fullGrid.join(
        cells.groupBy(col("qi")).agg(sum(col("nsc")).as("nc")),
        Seq("qi"), "left")
      .withColumn("nc", coalesce(col("nc"), lit(0L)))
    val corpusCum = ScaleOps.rangedCumSum(corpus, "qi",
      floor(col("qi") / 64), Seq("nc" -> "cum_c"))
    val tot = corpusCum.agg(sum(col("nc")).as("nn"))
    val wS = Window.partitionBy(col("source")).orderBy(col("qi"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: Column) = c.cast("decimal(38,0)")
    // every source sees EVERY grid cell (its ECDF is flat where it has no
    // mass): (grid × sources) frame, absent counts = 0
    val grid = corpusCum.select(col("qi"), col("cum_c"))
      .crossJoin(cells.select(col("source")).distinct())
      .join(cells, Seq("source", "qi"), "left")
      .withColumn("nsc", coalesce(col("nsc"), lit(0L)))
      .withColumn("cum_s", sum(col("nsc")).over(wS))
      .crossJoin(broadcast(tot))
    // per-source totals from the (sources × realized-cells)-sized `cells`
    // frame, not a second pass over the (10⁴ × sources) grid: max(cum_s)
    // over the full grid IS the source's total count (the ECDF's final
    // value), so sum(nsc) per source is the same number one cheap
    // aggregation earlier (r15; saves a grid-wide shuffle + re-agg)
    val n1 = cells.groupBy(col("source")).agg(sum(col("nsc")).as("n1"))
    val terms = grid.join(broadcast(n1), "source")
      .select(col("source"), col("n1"), col("nn"),
        abs(dec(col("cum_s")) * dec(col("nn") - col("n1")) -
          dec(col("cum_c") - col("cum_s")) * dec(col("n1"))).as("t"))
    terms.groupBy(col("source"))
      .agg(max(col("n1")).as("n"), max(col("nn")).as("nnx"),
        sum(col("t")).as("st"))
      .select(col("source"), col("n"),
        Portable.r4(col("st").cast("double") /
          (col("n").cast("double") * (col("nnx") - col("n")).cast("double") *
            10000.0)).as("w1"))
  }

  val wassersteinShiftSql: String =
    s"""WITH q AS (
       |  SELECT doc_id,
       |         floor((${TextOps.qualitySqlExpr}) * 10000.0 + 0.5)::BIGINT AS qi
       |  FROM documents),
       |cells AS (
       |  SELECT d.source, q.qi, count(*)::BIGINT AS nsc
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id
       |  GROUP BY 1, 2),
       |fg AS (SELECT unnest(range(0, 10001)) AS qi),
       |corpus AS (
       |  SELECT fg.qi, coalesce(c.nc, 0)::BIGINT AS nc
       |  FROM fg LEFT JOIN (SELECT qi, sum(nsc)::BIGINT AS nc
       |                     FROM cells GROUP BY 1) c ON fg.qi = c.qi),
       |ccum AS (
       |  SELECT qi, nc,
       |         sum(nc) OVER (ORDER BY qi ROWS UNBOUNDED PRECEDING)
       |           ::BIGINT AS cum_c
       |  FROM corpus),
       |tot AS (SELECT sum(nc)::BIGINT AS nn FROM corpus),
       |grid AS (
       |  SELECT s.source, g.qi, g.cum_c,
       |         coalesce(c.nsc, 0)::BIGINT AS nsc
       |  FROM ccum g CROSS JOIN (SELECT DISTINCT source FROM cells) s
       |  LEFT JOIN cells c ON c.source = s.source AND c.qi = g.qi),
       |cums AS (
       |  SELECT source, qi, cum_c,
       |         sum(nsc) OVER (PARTITION BY source ORDER BY qi
       |                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_s
       |  FROM grid),
       |n1 AS (SELECT source, max(cum_s)::BIGINT AS n1 FROM cums GROUP BY 1)
       |SELECT c.source, max(n1.n1) AS n,
       |       ${Portable.r4Sql(
          "sum(abs(c.cum_s::HUGEINT * (tot.nn - n1.n1) - (c.cum_c - c.cum_s)::HUGEINT * n1.n1))::DOUBLE / (max(n1.n1)::DOUBLE * max(tot.nn - n1.n1)::DOUBLE * 10000.0)")}
       |         AS w1
       |FROM cums c JOIN n1 USING (source) CROSS JOIN tot
       |GROUP BY 1""".stripMargin

  // --------------------------------- q274 source↔language mutual info

  /** Fixed-point scale for the q274 entropy cells (the q247 regime). */
  val MiScale = 1000000000L

  /** q274: mutual information between the corpus's two stratification
    * keys — source and language — with the marginal/joint entropies and
    * the normalized MI. The redundancy reading behind every
    * (source × lang) design in the repo (q243 stratifies on both, q100
    * reports on both, q218 quotas on both): NMI → 1 means the keys carry
    * the same information (one stratification suffices — halve the grid),
    * NMI → 0 means they cut the corpus independently (the full product
    * grid earns its cells). One summary row.
    *
    * Scale shape: ONE narrow scan → three hash aggregations (source,
    * lang, joint — the joint grid bounded by |sources|·|langs|) → a
    * 1-row combination.
    *
    * Parity: every entropy is Σ n·floor(ln(n)·scale)/(N·scale) from
    * EXACT integer cells (the q109/q247 ln discipline); the MI
    * combination runs on exact integers in identical textual order; the
    * degenerate single-key corners pin NMI to 0.0 on both engines.
    */
  def mutualInfo(spark: SparkSession, sfDir: String): DataFrame = {
    val sc = MiScale
    def fl(c: Column) =
      (c * floor(log(c.cast("double")) * sc + 0.5).cast("long")).as("ti")
    val d = Tables.documents(spark, sfDir).select(col("source"), col("lang"))
    def hSum(grouped: DataFrame): DataFrame =
      grouped.agg(sum(col("ti")).as("s"), sum(col("n")).as("nn"))
    val bySrc = hSum(d.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .select(col("n"), fl(col("n"))))
    val byLang = hSum(d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .select(col("n"), fl(col("n"))))
    val byJoint = hSum(d.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n")).select(col("n"), fl(col("n"))))
    val j = bySrc.select(col("s").as("ss"), col("nn"))
      .crossJoin(byLang.select(col("s").as("sl")))
      .crossJoin(byJoint.select(col("s").as("sj")))
    val nD = col("nn").cast("double")
    def h(s: Column) = log(nD) - s.cast("double") / (nD * sc.toDouble)
    val mi = h(col("ss")) + h(col("sl")) - h(col("sj"))
    val minH = least(h(col("ss")), h(col("sl")))
    j.select(col("nn").as("n"),
      Portable.r4(h(col("ss"))).as("h_source"),
      Portable.r4(h(col("sl"))).as("h_lang"),
      Portable.r4(h(col("sj"))).as("h_joint"),
      Portable.r4(mi).as("mi"),
      Portable.r4(when(minH > 0.0, mi / minH).otherwise(0.0)).as("nmi"))
  }

  val mutualInfoSql: String = {
    val sc = MiScale
    def flS(n: String) =
      s"sum($n * floor(ln($n::DOUBLE) * $sc + 0.5)::BIGINT)::BIGINT"
    def hS(s: String) = s"ln(nn::DOUBLE) - $s::DOUBLE / (nn::DOUBLE * $sc.0)"
    val mi = s"(${hS("ss")}) + (${hS("sl")}) - (${hS("sj")})"
    val minH = s"least(${hS("ss")}, ${hS("sl")})"
    s"""WITH s AS (
       |  SELECT ${flS("n")} AS ss, sum(n)::BIGINT AS nn FROM (
       |    SELECT count(*)::BIGINT AS n FROM documents GROUP BY source)),
       |l AS (
       |  SELECT ${flS("n")} AS sl FROM (
       |    SELECT count(*)::BIGINT AS n FROM documents GROUP BY lang)),
       |j AS (
       |  SELECT ${flS("n")} AS sj FROM (
       |    SELECT count(*)::BIGINT AS n FROM documents GROUP BY source, lang))
       |SELECT nn AS n,
       |       ${Portable.r4Sql(hS("ss"))} AS h_source,
       |       ${Portable.r4Sql(hS("sl"))} AS h_lang,
       |       ${Portable.r4Sql(hS("sj"))} AS h_joint,
       |       ${Portable.r4Sql(mi)} AS mi,
       |       ${Portable.r4Sql(
          s"CASE WHEN $minH > 0.0 THEN ($mi) / ($minH) ELSE 0.0 END")} AS nmi
       |FROM s CROSS JOIN l CROSS JOIN j""".stripMargin
  }

  // ------------------------------------- q254 Mann–Whitney source audit

  /** q254: per-source Mann–Whitney U test of quality stochastic dominance
    * — for each source, the one-vs-rest U statistic over the q17 quality
    * score, its AUC normalization U/(n₁·n₂) (the probability a random doc
    * from the source outranks a random doc from the rest — the
    * "probability of superiority"), and the tie-corrected normal z-score.
    * The NONPARAMETRIC sibling of q120/q124: KS asks "did the
    * distribution move", this ranks sources by whether their quality
    * distribution sits ABOVE or BELOW the corpus without assuming any
    * shape — the robust per-source quality league table a mixture owner
    * reads next to q246's signal correlations.
    *
    * Scale shape: the textbook U needs a global rank — the classic
    * unscalable sort. This computes the BINNED form on the q17 r4 grid
    * (quality is already grid-quantized, so binning is LOSSLESS — the
    * statistic is exact, not approximated): one hash agg to a
    * (source × grid) cell frame, the corpus prefix via
    * [[ScaleOps.rangedCumSum]] (no partition-less window), the per-source
    * prefix via a window whose partitions are grid-bounded (≤ 10⁴ cells
    * per source, independent of corpus size), then a |sources|-row
    * rollup. The tie term Σ(t³−t) is corpus-wide, computed once,
    * broadcast to every source row.
    *
    * Parity: U is kept as 2·U (ties contribute n/2 each — doubling keeps
    * every intermediate an EXACT integer); products go through
    * DECIMAL(38,0)/HUGEINT; μ/σ²/z/auc are per-row scalars from exact
    * integers, r4'd, with the σ² ≤ 0 and n₁·n₂ = 0 corners pinned to 0.0
    * on both engines.
    */
  def mannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    val q = TextOps.qualityScore(spark, sfDir).select(col("doc_id"),
      floor(col("quality") * 10000.0 + 0.5).cast("long").as("qi"))
    val cells = q.join(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("source")),
        "doc_id")
      .groupBy(col("source"), col("qi"))
      .agg(count(lit(1)).as("nsc"))
    val corpus = cells.groupBy(col("qi")).agg(sum(col("nsc")).as("nc"))
    val corpusCum = ScaleOps.rangedCumSum(corpus, "qi",
      floor(col("qi") / 64), Seq("nc" -> "cum_c"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val tot = corpusCum.agg(sum(col("nc")).as("nn"),
      sum(dec(col("nc")) * dec(col("nc")) * dec(col("nc")) - dec(col("nc")))
        .as("ties"))
    // per-source prefix: partitions are grid-bounded (≤ one row per r4
    // quality cell), never corpus-sized
    val wS = Window.partitionBy(col("source")).orderBy(col("qi"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val per = cells.withColumn("cum_s", sum(col("nsc")).over(wS))
      .join(corpusCum.select(col("qi"), col("nc"), col("cum_c")), "qi")
      .select(col("source"), col("nsc"),
        // rest-of-corpus mass strictly below this cell, and rest ties here
        ((col("cum_c") - col("nc")) - (col("cum_s") - col("nsc"))).as("below"),
        (col("nc") - col("nsc")).as("trest"))
    val agg = per.groupBy(col("source"))
      .agg(sum(col("nsc")).as("n1"),
        sum(dec(col("nsc")) * (dec(col("below")) * 2 + dec(col("trest"))))
          .as("u2"))
      .crossJoin(broadcast(tot))
    val n1 = col("n1").cast("double")
    val n2 = (col("nn") - col("n1")).cast("double")
    val nD = col("nn").cast("double")
    val u = col("u2").cast("double") / 2.0
    val mu = n1 * n2 / 2.0
    val sig2 = (n1 * n2 / 12.0) *
      ((nD + 1.0) - col("ties").cast("double") / (nD * (nD - 1.0)))
    agg.select(col("source"), col("n1").as("n"),
      r4(u).as("u"),
      r4(when(n1 * n2 > 0.0, u / (n1 * n2)).otherwise(0.0)).as("auc"),
      r4(when(sig2 > 0.0, (u - mu) / sqrt(sig2)).otherwise(0.0)).as("z"))
  }

  val mannWhitneySql: String =
    s"""WITH q AS (
       |  SELECT doc_id,
       |         floor((${TextOps.qualitySqlExpr}) * 10000.0 + 0.5)::BIGINT AS qi
       |  FROM documents),
       |cells AS (
       |  SELECT d.source, q.qi, count(*)::BIGINT AS nsc
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id
       |  GROUP BY 1, 2),
       |corpus AS (
       |  SELECT qi, sum(nsc)::BIGINT AS nc,
       |         sum(sum(nsc)) OVER (ORDER BY qi ROWS UNBOUNDED PRECEDING)
       |           ::BIGINT AS cum_c
       |  FROM cells GROUP BY 1),
       |tot AS (SELECT sum(nc)::BIGINT AS nn,
       |               sum(nc::HUGEINT * nc * nc - nc)::HUGEINT AS ties
       |        FROM corpus),
       |per AS (
       |  SELECT c.source, c.nsc,
       |         (co.cum_c - co.nc) -
       |         (sum(c.nsc) OVER (PARTITION BY c.source ORDER BY c.qi
       |                           ROWS UNBOUNDED PRECEDING) - c.nsc) AS below,
       |         co.nc - c.nsc AS trest
       |  FROM cells c JOIN corpus co USING (qi)),
       |agg AS (
       |  SELECT source, sum(nsc)::BIGINT AS n1,
       |         sum(nsc::HUGEINT * (below::HUGEINT * 2 + trest))::HUGEINT AS u2
       |  FROM per GROUP BY 1)
       |SELECT source, n1 AS n,
       |       ${r4Sql("u2::DOUBLE / 2.0")} AS u,
       |       ${r4Sql(
          "CASE WHEN n1::DOUBLE * (nn - n1)::DOUBLE > 0.0 THEN (u2::DOUBLE / 2.0) / (n1::DOUBLE * (nn - n1)::DOUBLE) ELSE 0.0 END")}
       |         AS auc,
       |       ${r4Sql(
          "CASE WHEN (n1::DOUBLE * (nn - n1)::DOUBLE / 12.0) * ((nn::DOUBLE + 1.0) - ties::DOUBLE / (nn::DOUBLE * (nn::DOUBLE - 1.0))) > 0.0 THEN (u2::DOUBLE / 2.0 - n1::DOUBLE * (nn - n1)::DOUBLE / 2.0) / sqrt((n1::DOUBLE * (nn - n1)::DOUBLE / 12.0) * ((nn::DOUBLE + 1.0) - ties::DOUBLE / (nn::DOUBLE * (nn::DOUBLE - 1.0)))) ELSE 0.0 END")}
       |         AS z
       |FROM agg CROSS JOIN tot""".stripMargin
}
