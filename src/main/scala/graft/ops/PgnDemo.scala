package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.chess

/** q35: the full chess-lakehouse stack as a driver-gate query — bundled PGN
  * fixture → `format("pgn")` scan → normalize expressions → trie opening
  * enrichment → 20-column export projection. `sfDir` is unused (the chess
  * data model has no testdata table); the driver records a rows-only check
  * since DuckDB has no PGN reader to oracle against — the SQL-semantics
  * parity of this stack is proven by tools/chess_golden.py instead.
  */
object PgnDemo {

  private val FixtureOpenings = Seq(
    ("B00", "King's Pawn", "1. e4", "e2e4"),
    ("C20", "King's Pawn Game", "1. e4 e5", "e2e4 e7e5"),
    ("C40", "King's Knight Opening", "1. e4 e5 2. Nf3", "e2e4 e7e5 g1f3"),
    ("C60", "Ruy Lopez", "1. e4 e5 2. Nf3 Nc6 3. Bb5", "e2e4 e7e5 g1f3 b8c6 f1b5"),
    ("C70", "Ruy Lopez: Morphy Defense", "1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 4. Ba4",
      "e2e4 e7e5 g1f3 b8c6 f1b5 a7a6 b5a4"),
    ("B20", "Sicilian Defense", "1. e4 c5", "e2e4 c7c5"),
    ("B50", "Sicilian Defense: Modern Variations", "1. e4 c5 2. Nf3 d6",
      "e2e4 c7c5 g1f3 d7d6"),
    ("D00", "Queen's Pawn Game", "1. d4 d5", "d2d4 d7d5"),
    ("D35", "Queen's Gambit Declined", "1. d4 d5 2. c4 e6", "d2d4 d7d5 c2c4 e7e6"))

  /** Extract the bundled fixture to a stable temp path (idempotent). */
  private def fixturePath(): Path = {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_pgn_fixture")
    Files.createDirectories(dir)
    val dst = dir.resolve("games.pgn")
    val in = getClass.getResourceAsStream("/graft/fixtures/games.pgn")
    require(in != null, "bundled fixture missing")
    try Files.copy(in, dst, StandardCopyOption.REPLACE_EXISTING) finally in.close()
    dir
  }

  def pgnPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val games = spark.read.format("pgn").load(fixturePath().toString)
      .withColumn("clean_movetext", chess.movesNormalize(col("movetext")))
      .withColumn("clean_timecontrol", chess.timecontrolNormalize(col("TimeControl")))
      .withColumn("DataSource", lit("fixture"))
    val openings = FixtureOpenings.toDF("eco", "name", "pgn", "uci")
    val enriched = OpeningEnrichment.enrichTrie(games, openings)
    ChessExport.exportProjection(enriched)
      .orderBy(col("White"))
  }
}
