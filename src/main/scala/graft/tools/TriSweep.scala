package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Checkpointing.LineageSyntax
import graft.Tables

/** q117 min-support sweep at a scale point: measures how the support
  * threshold (the knob SURVEY §9 and the BASELINE.md q117 row name as
  * the lever when the co-purchase graph densifies) trades edge density
  * against wedge-join cost — the SAME degree-oriented triangle pipeline
  * ([[graft.ops.GraphOps.triangleTail]]) run over the support-filtered
  * edge lists for min-support 2 (the gate default), 3 and 4.
  *
  * The supported-pair base is built ONCE (the q117/q126 shared-base
  * shape, without the gate's session memo so thresholds stay
  * independent) and checkpointed; each threshold then measures only the
  * filter + wedge + closure tail — wall (min of 2 runs), edge count and
  * total triangle count per threshold, one JSON line.
  *
  * `runMain graft.tools.TriSweep <sfDir>` — BASELINE.md's committed rows
  * come from `localdata/sf25` (the ×25 point where the knob matters).
  *
  * `runMain graft.tools.TriSweep <sfDir> densify` instead measures the
  * ADAPTIVE threshold ([[graft.ops.GraphOps.adaptiveSupport]], r9)
  * closing the valve on a ×10-DENSIFIED corpus: the incidence list is
  * replicated 10× with shifted basket ids over the UNCHANGED part
  * catalog — every pair's support inflates ×10, the regime where the
  * fixed threshold admits the one-off co-occurrence mass (every
  * once-co-bought pair reaches support 10) and the edge list explodes,
  * while the adaptive threshold scales to ≈ 2×10 and keeps the edge
  * list at the undensified supported graph. One JSON line with both
  * edge lists' sizes and triangle walls.
  */
object TriSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/localdata/sf25")
    val densify = args.lift(1).contains("densify")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the unthresholded supported-pair base: GraphOps' OWN pipeline
    // (coPairSupport — not a copy, so the sweep cannot desync from the
    // gate query), built once and checkpointed. In densify mode the raw
    // incidence is replicated 10× with shifted basket ids (same parts).
    val inc0 = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
    val inc =
      if (!densify) inc0
      else spark.range(10).crossJoin(inc0)
        .select((col("okey") + col("id") * 10000000000L).as("okey"), col("pk"))
    val base = graft.ops.GraphOps.coPairSupport(inc).lineageCheckpoint()
    val baseRdds = spark.sparkContext.getPersistentRDDs.keySet

    val thresholds =
      if (!densify) Seq(2, 3, 4)
      else {
        val nOrders = Tables.orders(spark, sfDir).count() * 10
        val nParts = Tables.part(spark, sfDir).count()
        Seq(graft.ops.GraphOps.TriMinSupport,
          graft.ops.GraphOps.adaptiveSupport(nOrders, nParts).toInt)
      }
    val rows = thresholds.map { ms =>
      val edges = base.filter(col("supp_ab") >= ms)
        .select(col("a"), col("b"))
        .lineageCheckpoint()
      val nEdges = edges.count()
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        // coalesce: a threshold that strips every triangle sums to NULL
        val tri = graft.ops.GraphOps.triangleTail(edges)
          .agg(coalesce(sum(col("n_tri")), lit(0L))).head.getLong(0)
        ((System.nanoTime() - t0) / 1e9, tri)
      }
      val (w1, tri) = once()
      val (w2, _) = once()
      // drop this threshold's checkpoint blocks (edges) before the next
      // one measures — pinned
      // blocks from earlier thresholds would pressure the later walls
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => baseRdds.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
      (ms, nEdges, tri, math.min(w1, w2))
    }
    val metric = if (densify) "tri_densify" else "tri_sweep"
    val json = rows.map { case (ms, e, t, w) =>
      f""""ms$ms":{"edges":$e,"tri_total":$t,"wall":$w%.2f}"""
    }.mkString(s"""{"metric":"$metric","sf":"$sfDir",""", ",", "}")
    println(json)
    spark.stop()
  }
}
