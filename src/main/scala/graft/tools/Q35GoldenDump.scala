package graft.tools

import org.apache.spark.sql.functions.col

/** Dump the q35 fixture's pre-enrichment parse + openings dimension to
  * parquet for the golden-oracle replay (tools/q35_golden.py): DuckDB
  * re-runs the reference's enrichment + export SQL over this staged parse
  * and the resulting expected table is committed as the q35 oracle. PGN
  * parsing itself has no cross-engine oracle (the reference's chess
  * extension is closed); everything downstream of the parse IS replayed
  * independently.
  *
  * Usage: `runMain graft.tools.Q35GoldenDump <outDir>` → `<outDir>/staged`,
  * `<outDir>/openings`.
  */
object Q35GoldenDump {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = graft.functions.chess.session("q35-golden-dump",
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.PgnDemo.stagedGames(spark)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/staged")
    graft.ops.PgnDemo.fixtureOpeningsDF(spark)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/openings")
    spark.stop()
  }
}
