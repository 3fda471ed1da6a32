package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pgn.PgnParser

class PgnParserSpec extends AnyFunSuite {

  val twoGames: String =
    """[Event "Casual Game"]
      |[Site "London"]
      |[White "Anderssen, Adolf"]
      |[Black "Kieseritzky, Lionel"]
      |[Result "1-0"]
      |
      |1. e4 e5 2. f4 exf4 3. Bc4 Qh4+ 1-0
      |
      |[Event "Second"]
      |[White "A"]
      |[Black "B"]
      |[Result "1/2-1/2"]
      |
      |1. d4 d5
      |2. c4 e6 1/2-1/2
      |""".stripMargin

  test("splits games and parses tags") {
    val games = PgnParser.parseString(twoGames).toList
    assert(games.size == 2)
    assert(games(0).tags("Event") == "Casual Game")
    assert(games(0).tags("White") == "Anderssen, Adolf")
    assert(games(0).movetext == "1. e4 e5 2. f4 exf4 3. Bc4 Qh4+ 1-0")
    assert(games(0).parseError.isEmpty)
    assert(games(1).movetext == "1. d4 d5\n2. c4 e6 1/2-1/2")
    assert(games(1).parseError.isEmpty)
  }

  test("tag value escapes") {
    assert(PgnParser.parseTagLine("""[Event "say \"hi\" \\ there"]""") ==
      Right(("Event", """say "hi" \ there""")))
  }

  test("malformed tag line becomes parse_error, game still emitted") {
    val pgn =
      """[Event "ok"]
        |[Broken no-quotes]
        |[Result "*"]
        |
        |1. e4 *
        |""".stripMargin
    val g = PgnParser.parseString(pgn).toList.head
    assert(g.tags("Event") == "ok")
    assert(g.parseError.exists(_.contains("tag")))
    assert(g.movetext == "1. e4 *")
  }

  test("brace comment containing [ and newline does not split the game") {
    val pgn =
      """[Event "c"]
        |[Result "1-0"]
        |
        |1. e4 {a comment
        |with [Event "fake"] inside} e5 1-0
        |
        |[Event "next"]
        |[Result "0-1"]
        |
        |1. d4 0-1
        |""".stripMargin
    val games = PgnParser.parseString(pgn).toList
    assert(games.size == 2)
    assert(games(0).movetext.contains("[Event \"fake\"]"))
    assert(games(1).tags("Event") == "next")
  }

  test("game with no movetext gets parse_error") {
    val pgn =
      """[Event "empty"]
        |[Result "*"]
        |
        |[Event "after"]
        |[Result "*"]
        |
        |1. e4 *
        |""".stripMargin
    val games = PgnParser.parseString(pgn).toList
    assert(games.size == 2)
    assert(games(0).parseError.exists(_.contains("no movetext")))
    assert(games(1).parseError.isEmpty)
  }

  test("missing result token flagged") {
    val pgn =
      """[Event "x"]
        |
        |1. e4 e5
        |""".stripMargin
    val g = PgnParser.parseString(pgn).toList.head
    assert(g.parseError.exists(_.contains("result")))
  }

  test("duplicate tags: first wins") {
    val pgn =
      """[Event "first"]
        |[Event "second"]
        |[Result "*"]
        |
        |1. e4 *
        |""".stripMargin
    val g = PgnParser.parseString(pgn).toList.head
    assert(g.tags("Event") == "first")
  }

  test("empty input yields no games") {
    assert(PgnParser.parseString("").toList.isEmpty)
    assert(PgnParser.parseString("\n\n\n").toList.isEmpty)
  }

  test("streaming: does not buffer whole input") {
    // 10k small games via iterator; parser must keep up lazily
    val lines = Iterator.range(0, 10000).flatMap { i =>
      Iterator(s"""[Event "g$i"]""", s"""[Result "1-0"]""", "", "1. e4 e5 1-0", "")
    }
    var n = 0
    PgnParser.parseLines(lines).foreach { g => n += 1; assert(g.parseError.isEmpty) }
    assert(n == 10000)
  }
}
