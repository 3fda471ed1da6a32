package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.ChessNorm

class ChessNormSpec extends AnyFunSuite {

  test("strips comments, variations, NAGs, annotations, result") {
    val raw = """1.e4! {king pawn} e5?? $14 2.Nf3 (2.f4 {gambit} exf4) 2...Nc6 3. Bb5 a6 1-0"""
    assert(ChessNorm.normalizeMoves(raw) == "1. e4 e5 2. Nf3 Nc6 3. Bb5 a6")
  }

  test("multi-line comment with bracket inside") {
    val raw = "1. e4 {a\nmulti [line] ; comment} e5 *"
    assert(ChessNorm.normalizeMoves(raw) == "1. e4 e5")
  }

  test("semicolon comment removed to end of line") {
    val raw = "1. e4 e5 ; rest is comment 2. Nf3\n2. Nf3 Nc6 1/2-1/2"
    assert(ChessNorm.normalizeMoves(raw) == "1. e4 e5 2. Nf3 Nc6")
  }

  test("castling canonicalized, checks kept") {
    val raw = "1. e4 e5 2. Qh5 Nc6 3. Bc4 g6 4. Qf3 Nf6 5. 0-0 Bg7 0-1"
    assert(ChessNorm.normalizeMoves(raw).endsWith("5. O-O Bg7"))
    assert(ChessNorm.normalizeMoves("1. e4 f5 2. Qh5+ g6 *") == "1. e4 f5 2. Qh5+ g6")
    assert(ChessNorm.normalizeMoves("1. 0-0-0! *") == "1. O-O-O")
  }

  test("renumbers wrong move numbers from ply position") {
    assert(ChessNorm.normalizeMoves("7. e4 e5 9. Nf3 *") == "1. e4 e5 2. Nf3")
  }

  test("null and empty") {
    assert(ChessNorm.normalizeMoves(null) == null)
    assert(ChessNorm.normalizeMoves("") == "")
    assert(ChessNorm.normalizeMoves("  1-0  ") == "")
  }

  test("containment invariant: opening pgn prefixes normalized game") {
    // Lichess-style opening lines must be prefixes of normalized movetext
    val opening = "1. e4 c5 2. Nf3 d6"
    val game = "1.e4 c5 2.Nf3 {sicilian!} d6 3.d4 cxd4 4.Nxd4 Nf6 1-0"
    assert(ChessNorm.normalizeMoves(game).startsWith(opening))
  }

  test("idempotence on examples") {
    val examples = Seq(
      "1.e4! {x} e5 2.Nf3 (2.f4) Nc6 1-0",
      "1. d4 d5 2. c4 *",
      "7. e4 e5 9. Nf3 *",
      "1. 0-0 0-0 1/2-1/2")
    examples.foreach { e =>
      val once = ChessNorm.normalizeMoves(e)
      assert(ChessNorm.normalizeMoves(once) == once, s"not idempotent on: $e")
    }
  }

  test("idempotence property on generated movetext") {
    val move = Gen.oneOf("e4", "e5", "Nf3", "Nc6", "Bb5+", "O-O", "exd5", "Qxf7#", "a6!?", "h3??")
    val gameGen = for {
      n <- Gen.choose(0, 30)
      moves <- Gen.listOfN(n, move)
    } yield moves.zipWithIndex.map { case (m, i) =>
      if (i % 2 == 0) s"${i / 2 + 1}. $m" else m
    }.mkString(" ") + " 1-0"
    (0 until 200).foreach { i =>
      val g = gameGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val once = ChessNorm.normalizeMoves(g)
      assert(ChessNorm.normalizeMoves(once) == once, s"not idempotent on: $g")
    }
  }

  test("timecontrol canonical forms") {
    assert(ChessNorm.normalizeTimecontrol("300+3") == "300+3")
    assert(ChessNorm.normalizeTimecontrol("0300+03") == "300+3")
    assert(ChessNorm.normalizeTimecontrol("40/7200:1800") == "40/7200:1800")
    assert(ChessNorm.normalizeTimecontrol(" 600 ") == "600")
    assert(ChessNorm.normalizeTimecontrol("*180") == "*180")
    assert(ChessNorm.normalizeTimecontrol("-") == "-")
    assert(ChessNorm.normalizeTimecontrol("?") == null)
    assert(ChessNorm.normalizeTimecontrol("") == null)
    assert(ChessNorm.normalizeTimecontrol("blitz") == null)
    assert(ChessNorm.normalizeTimecontrol(null) == null)
    assert(ChessNorm.normalizeTimecontrol("40/7200:20/3600:900+30") == "40/7200:20/3600:900+30")
  }

  test("timecontrol idempotence where defined") {
    Seq("300+3", "40/7200:1800", "600", "*180", "-").foreach { t =>
      assert(ChessNorm.normalizeTimecontrol(ChessNorm.normalizeTimecontrol(t)) ==
        ChessNorm.normalizeTimecontrol(t))
    }
  }
}
