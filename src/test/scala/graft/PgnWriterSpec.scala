package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.PgnWriter

class PgnWriterSpec extends AnyFunSuite with SparkTestBase {

  test("formatGame: roster order, escaping, movetext paragraph") {
    val s = PgnWriter.formatGame(
      Seq("White" -> "Alice \"The Rook\"", "Event" -> "E1", "Result" -> "1-0",
        "ECO" -> "B00", "Site" -> null),
      "1. e4 e5 1-0")
    assert(s ==
      "[Event \"E1\"]\n[White \"Alice \\\"The Rook\\\"\"]\n[Result \"1-0\"]\n" +
      "[ECO \"B00\"]\n\n1. e4 e5 1-0\n")
  }

  test("tag values with line breaks collapse to spaces and re-parse") {
    // PGN tag values are single-line by grammar; write() accepts arbitrary
    // DataFrames, so a CR/LF must not emit an unparseable tag line
    val s = PgnWriter.formatGame(
      Seq("Event" -> "A\nB\r\nC", "Result" -> "*"), "1. e4 *")
    s.linesIterator.filter(_.startsWith("[")).foreach(l =>
      assert(l.endsWith("]"), s"corrupt tag line: $l"))
    val games = graft.pgn.PgnParser.parseLines(s.linesIterator).toList
    assert(games.size == 1 && games.head.parseError.isEmpty)
    assert(games.head.tags("Event") == "A B C")
  }

  test("PGN round-trip: reader -> writer -> reader preserves games") {
    val dir = Files.createTempDirectory("pgn_rt")
    Files.writeString(dir.resolve("games.pgn"),
      """[Event "RT1"]
        |[White "Alice"]
        |[Black "Bob"]
        |[Result "1-0"]
        |[WhiteElo "2400"]
        |[UTCDate "2020.05.12"]
        |
        |1. e4 e5 2. Nf3 {good} Nc6 1-0
        |
        |[Event "RT2"]
        |[Result "*"]
        |
        |1. d4 *
        |""".stripMargin)
    val orig = spark.read.format("pgn").load(dir.toString)
    val out = dir.resolve("out").toString
    PgnWriter.write(orig, out)
    val back = spark.read.format("pgn").load(s"$out/part-*")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("Event", "White", "Black", "Result", "WhiteElo", "UTCDate", "movetext")
        .collect().map(_.toSeq).sortBy(_.toString)
    assert(canon(back).toSeq == canon(orig).toSeq)
    assert(back.filter(col("parse_error").isNotNull).count() == 0)
  }
}
