package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class PgnDataSourceSpec extends AnyFunSuite with SparkTestBase {

  private def writePgn(dir: Path, name: String, content: String): Unit =
    Files.writeString(dir.resolve(name), content)

  private lazy val fixtureDir: Path = {
    val d = Files.createTempDirectory("pgn_fixture")
    writePgn(d, "a.pgn",
      """[Event "Game A1"]
        |[Site "X"]
        |[White "Alice"]
        |[Black "Bob"]
        |[Result "1-0"]
        |[WhiteElo "2400"]
        |[BlackElo "2350"]
        |[UTCDate "2020.05.12"]
        |[UTCTime "13:45:00"]
        |[TimeControl "300+3"]
        |
        |1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 1-0
        |
        |[Event "Game A2"]
        |[White "Carol"]
        |[Black "Dan"]
        |[Result "0-1"]
        |[WhiteElo "bogus"]
        |[UTCDate "????.??.??"]
        |
        |1. d4 {queen's pawn
        |over two lines} d5 0-1
        |""".stripMargin)
    writePgn(d, "b.pgn",
      """[Event "Game B1"]
        |[Result "*"]
        |
        |1. c4 *
        |
        |[Event "Broken"]
        |[Result "*"]
        |
        |""".stripMargin)
    d
  }

  private lazy val df = spark.read.format("pgn").load(fixtureDir.toString)

  test("reads all games across files with tags as columns") {
    val rows = df.orderBy("game_id").collect()
    assert(rows.length == 4)
    val a1 = rows(0)
    assert(a1.getAs[String]("Event") == "Game A1")
    assert(a1.getAs[String]("White") == "Alice")
    assert(a1.getAs[Int]("WhiteElo") == 2400)
    assert(a1.getAs[java.sql.Date]("UTCDate").toString == "2020-05-12")
    assert(a1.getAs[String]("movetext") == "1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 1-0")
    assert(a1.getAs[String]("parse_error") == null)
  }

  test("bad elo and unknown date become null, not errors") {
    val a2 = df.filter(col("Event") === "Game A2").head()
    assert(a2.getAs[Any]("WhiteElo") == null)
    assert(a2.getAs[Any]("UTCDate") == null)
    assert(a2.getAs[String]("parse_error") == null)
    assert(a2.getAs[String]("movetext").contains("queen's pawn"))
  }

  test("broken game captured via parse_error, scan does not fail (S1)") {
    val broken = df.filter(col("parse_error").isNotNull).collect()
    assert(broken.length == 1)
    assert(broken(0).getAs[String]("Event") == "Broken")
  }

  test("game_id is stable and unique: fileIndex<<40 | offset") {
    val ids1 = df.select("game_id").collect().map(_.getLong(0)).sorted
    val ids2 = spark.read.format("pgn").load(fixtureDir.toString)
      .select("game_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2))
    assert(ids1.distinct.length == 4)
    // b.pgn sorts after a.pgn → fileIndex 1
    assert(ids1.count(_ >= (1L << 40)) == 2)
  }

  test("column pruning: single-column select still works") {
    val events = df.select("Event").collect().map(_.getString(0)).sorted
    assert(events.sameElements(Array("Broken", "Game A1", "Game A2", "Game B1")))
  }

  test("byte-range splits agree with unsplit read") {
    // force ~200-byte splits: many partitions, same games, same game_ids
    val split = spark.read.format("pgn").option("splitBytes", "200")
      .load(fixtureDir.toString)
    val a = split.select("game_id", "Event").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val b = df.select("game_id", "Event").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(split.rdd.getNumPartitions > df.rdd.getNumPartitions)
    assert(a.sameElements(b))
  }

  test("split landing exactly on '[Event ' inside movetext does not fabricate a game") {
    // Adversarial: a brace comment contains the literal text `[Event "Fake"`.
    // Place a split boundary exactly at its '[' — the partial tail line then
    // begins with `[Event `, which a reader that trusts the first post-seek
    // line would treat as a game boundary (duplicate/garbage row).
    val d = Files.createTempDirectory("pgn_adversarial")
    val content =
      """[Event "Real One"]
        |[Result "1-0"]
        |
        |1. e4 {note [Event "Fake"] embedded} e5 1-0
        |
        |[Event "Real Two"]
        |[Result "0-1"]
        |
        |1. d4 d5 0-1
        |""".stripMargin
    writePgn(d, "adv.pgn", content)
    val fakeAt = content.indexOf("[Event \"Fake\"")
    assert(fakeAt > 0 && content.charAt(fakeAt - 1) != '\n') // mid-line by construction
    val split = spark.read.format("pgn").option("splitBytes", fakeAt.toString)
      .load(d.toString)
    val events = split.select("Event").collect().map(_.getString(0)).sorted
    assert(events.sameElements(Array("Real One", "Real Two")),
      s"got ${events.mkString(",")}")
  }

  test("multi-line comment opening after a split start cannot fabricate a game") {
    // Adversarial for prime(): split 2 begins at the start of game 2's
    // movetext line; the movetext then OPENS a multi-line { } comment whose
    // inner line starts with '[Event "Fake"]'. A prime() that scans for
    // boundaries without brace context picks the fake line and fabricates a
    // garbage game; with depth tracking it must skip it (split 1 owns the
    // whole of game 2 — its chunk extends past its range end).
    val d = Files.createTempDirectory("pgn_brace_split")
    val content =
      """[Event "Real One"]
        |[Result "1-0"]
        |
        |1. e4 e5 1-0
        |
        |[Event "Real Two"]
        |[Result "0-1"]
        |
        |1. d4 {long comment
        |[Event "Fake"]
        |still comment} d5 0-1
        |""".stripMargin
    writePgn(d, "brace.pgn", content)
    val splitAt = content.indexOf("1. d4 {")
    assert(splitAt > 0 && content.charAt(splitAt - 1) == '\n') // line start
    val split = spark.read.format("pgn").option("splitBytes", splitAt.toString)
      .load(d.toString)
    val events = split.select("Event").collect().map(_.getString(0)).sorted
    assert(events.sameElements(Array("Real One", "Real Two")),
      s"got ${events.mkString(",")}")
  }

  test("works with SQL + chess normalize end-to-end") {
    df.createOrReplaceTempView("games")
    val row = spark.sql(
      """SELECT chess_moves_normalize(movetext) AS m FROM games
        |WHERE Event = 'Game A2'""".stripMargin).head()
    assert(row.getString(0) == "1. d4 d5")
  }
}
