package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the openings dimension from any Hadoop-FS-visible URI.
  *
  * The reference ingests the dimension straight from a remote dataset glob —
  * `hf://datasets/Lichess/chess-openings/**/*.parquet`
  * (/root/reference/dvc.yaml:3). This loader accepts the same URI shape for
  * every scheme Hadoop can mount (`file://`, `hdfs://`, cloud-store
  * connectors like `s3a://` when their jars are on the classpath): the
  * recursive `**<sep>leaf` glob — which Hadoop's glob syntax lacks — is
  * translated to a recursive file lookup with a leaf-name filter, so a
  * local mirror and a remote bucket take the SAME code path.
  *
  * `hf://` itself mounts via [[HfFileSystem]] (register
  * `fs.hf.impl = graft.sources.HfFileSystem`), so the reference's URI
  * works verbatim; a one-download mirror +
  * `load(spark, "file:///mirror/chess-openings/**/*.parquet")` remains the
  * offline alternative — identical semantics, no special-casing
  * downstream. Both non-`file:` scheme paths are EXECUTED (not just
  * documented): ChessPipelineSpec through a custom `mockfs://` FileSystem,
  * HfFileSystemSpec through `hf://` itself with an injected offline
  * transport.
  */
object OpeningsSource {

  /** Columns every consumer of the dimension relies on
    * (/root/reference/src/find-openings.ts:65,71,76-77).
    */
  val RequiredColumns: Seq[String] = Seq("eco", "name", "pgn", "uci")

  private val Recursive = """(.*?)\*\*/(.+)""".r

  def load(spark: SparkSession, uri: String): DataFrame = {
    val df = uri match {
      case Recursive(base, leaf) =>
        // pathGlobFilter matches file NAMES only — a directory component
        // after `**` would silently match nothing; reject it loudly
        require(!leaf.contains("/"),
          s"unsupported glob shape '$uri': only '**/<file-glob>' is " +
            "supported (no directory components after '**')")
        spark.read
          .option("recursiveFileLookup", "true")
          .option("pathGlobFilter", leaf)
          .parquet(base)
      case _ => spark.read.parquet(uri)
    }
    val have = df.columns.map(_.toLowerCase).toSet
    val missing = RequiredColumns.filterNot(have)
    require(missing.isEmpty,
      s"openings dataset at $uri is missing column(s) ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    df
  }
}
