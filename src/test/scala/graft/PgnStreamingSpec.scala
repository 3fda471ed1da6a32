package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Streaming PGN ingestion: files dropped into the directory appear in the
  * next micro-batch, exactly once, with the normalize expressions applied in
  * the streaming plan.
  */
class PgnStreamingSpec extends AnyFunSuite with SparkTestBase {

  private def game(event: String, moves: String): String =
    s"""[Event "$event"]
       |[White "W"]
       |[Black "B"]
       |[Result "1-0"]
       |
       |$moves 1-0
       |""".stripMargin

  test("micro-batch stream picks up dropped files exactly once") {
    val dir: Path = Files.createTempDirectory("pgn_stream")
    Files.writeString(dir.resolve("first.pgn"), game("G1", "1. e4 e5"))

    val stream = spark.readStream.format("pgn")
      .option("splitBytes", String.valueOf(128L * 1024 * 1024))
      .load(dir.toString)
      .select(col("Event"),
        graft.functions.chess.movesNormalize(col("movetext")).as("m"))

    val q = stream.writeStream.format("memory").queryName("pgn_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val batch1 = spark.table("pgn_stream").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(batch1 == Set(("G1", "1. e4 e5")))

      // drop a second file → next batch contains only the new games
      Files.writeString(dir.resolve("second.pgn"), game("G2", "1. d4 d5"))
      q.processAllAvailable()
      val all = spark.table("pgn_stream").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(all == Set(("G1", "1. e4 e5"), ("G2", "1. d4 d5")))

      // no new files → no duplicates
      q.processAllAvailable()
      assert(spark.table("pgn_stream").count() == 2)
    } finally q.stop()
  }
}
