package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{OpeningEnrichment, OpeningTrie}

class OpeningEnrichmentSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val openings: DataFrame = Seq(
    ("B00", "King's Pawn", "1. e4", "e2e4"),
    ("C20", "King's Pawn Game", "1. e4 e5", "e2e4 e7e5"),
    ("C40", "King's Knight Opening", "1. e4 e5 2. Nf3", "e2e4 e7e5 g1f3"),
    ("C60", "Ruy Lopez", "1. e4 e5 2. Nf3 Nc6 3. Bb5", "e2e4 e7e5 g1f3 b8c6 f1b5"),
    ("D00", "Queen's Pawn Game", "1. d4 d5", "d2d4 d7d5"),
    ("A00", "Dup Line", "1. b4", "b2b4"),
    ("A00b", "Dup Line Later", "1. b4", "b2b4")
  ).toDF("eco", "name", "pgn", "uci")

  private lazy val games: DataFrame = Seq(
    // (game_id, clean_movetext, ECO, Opening)
    (1L, "1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 4. Ba4 Nf6", null, null),
    (2L, "1. e4 e5 2. Nf3 d6", null, null),
    (3L, "1. d4 d5 2. c4", null, null),
    (4L, "1. c4 e5", null, null),                       // no opening matches
    (5L, "1. e4 e5", "X99", "Already Labeled"),         // not a target (P4)
    (6L, "1. b4 d5", null, null)                        // duplicate-pgn tie-break
  ).toDF("game_id", "clean_movetext", "ECO", "Opening")

  private def check(out: DataFrame): Unit = {
    val m = out.orderBy("game_id")
      .select("game_id", "ECO", "Opening")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(m(0) == ((1L, "C60", "Ruy Lopez")))          // longest match wins
    assert(m(1) == ((2L, "C40", "King's Knight Opening")))
    assert(m(2) == ((3L, "D00", "Queen's Pawn Game")))
    assert(m(3) == ((4L, null, null)))                  // unmatched unchanged
    assert(m(4) == ((5L, "X99", "Already Labeled")))    // non-target untouched
    assert(m(5) == ((6L, "A00b", "Dup Line Later")))    // (ply,eco,name)-max tie-break
  }

  test("broadcast contains-join + argmax enrichment (parity form)") {
    check(OpeningEnrichment.enrich(games, openings))
  }

  test("trie enrichment (scale form) agrees with parity form") {
    check(OpeningEnrichment.enrichTrie(games, openings))
  }

  test("trie boundary: opening must end at word boundary") {
    val t = OpeningTrie.build(Seq(("1. e4 e5", 2, "C20", "KP Game")))
    assert(t.longestMatch("1. e4 e5 2. Nf3").contains(("C20", "KP Game")))
    assert(t.longestMatch("1. e4 e5").contains(("C20", "KP Game")))
    assert(t.longestMatch("1. e4 e55").isEmpty) // not a boundary
    assert(t.longestMatch("1. d4 d5").isEmpty)
    assert(t.longestMatch(null).isEmpty)
  }

  test("enrichment plan broadcasts the openings side (no fact shuffle)") {
    val plan = OpeningEnrichment.enrich(games, openings)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }
}
