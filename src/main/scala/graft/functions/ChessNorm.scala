package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala chess normalizers — the engine-side spec for the reference's
  * closed-source extension UDFs `chess_moves_normalize` and
  * `chess_timecontrol_normalize` (reference: src/read-pgn.ts:48; semantics
  * inferred from the call sites per SURVEY.md §2.6 F1/F2).
  *
  * The contract that matters downstream is the containment invariant used by
  * opening enrichment (reference: src/find-openings.ts:76): every Lichess
  * openings `pgn` string (e.g. `1. e4 e5 2. Nf3 Nc6`) must be a PREFIX of the
  * normalized movetext of any game whose opening line starts that way. So
  * normalization must produce exactly Lichess-style SAN:
  *
  *  - `{...}` comments (multi-line, nested) removed;
  *  - `(...)` recursive variations removed;
  *  - `;` rest-of-line comments removed;
  *  - NAG annotations (`$14`) and suffix annotations (`!`, `??`, `!?`) removed
  *    (check `+` and mate `#` markers are KEPT — Lichess keeps them);
  *  - result tokens (`1-0`, `0-1`, `1/2-1/2`, `*`) removed;
  *  - castling `0-0`/`0-0-0` canonicalized to `O-O`/`O-O-O`;
  *  - move numbers renumbered from ply position (`1. e4 e5 2. Nf3 …`) —
  *    black-to-move continuation markers (`3...`) are dropped;
  *  - whitespace collapsed to single spaces, trimmed.
  *
  * These are deliberately static (JVM-static after Scala object compilation)
  * so the Catalyst expressions can call them from generated code.
  */
object ChessNorm {

  private val ResultTokens = Set("1-0", "0-1", "1/2-1/2", "*")

  /** Strip `{...}` comments, `(...)` variations (both nestable) and `;` line
    * comments in one pass. Returns text with those regions replaced by a
    * space (so adjacent moves don't fuse).
    */
  private def stripRegions(s: String): String = {
    val sb = new StringBuilder(s.length)
    var brace = 0 // {} comment depth
    var paren = 0 // () variation depth
    var lineComment = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (lineComment) {
        if (c == '\n') { lineComment = false; sb.append(' ') }
      } else if (brace > 0) {
        if (c == '{') brace += 1
        else if (c == '}') { brace -= 1; if (brace == 0 && paren == 0) sb.append(' ') }
      } else if (paren > 0) {
        // inside a variation; comments inside variations still nest
        if (c == '(') paren += 1
        else if (c == ')') { paren -= 1; if (paren == 0) sb.append(' ') }
        else if (c == '{') brace += 1
      } else c match {
        case '{' => brace += 1
        case '(' => paren += 1
        case ';' => lineComment = true
        case _   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Strip a move-number prefix like `12.` / `12...` from a token; returns
    * the remainder (may be empty when the token was only a number).
    */
  private def dropMoveNumber(tok: String): String = {
    var i = 0
    while (i < tok.length && Character.isDigit(tok.charAt(i))) i += 1
    if (i == 0 || i >= tok.length || tok.charAt(i) != '.') return tok
    var j = i
    while (j < tok.length && tok.charAt(j) == '.') j += 1
    tok.substring(j)
  }

  /** Strip trailing `!`/`?` annotation glyphs (keep `+`/`#`). */
  private def dropAnnotation(tok: String): String = {
    var end = tok.length
    while (end > 0 && (tok.charAt(end - 1) == '!' || tok.charAt(end - 1) == '?')) end -= 1
    tok.substring(0, end)
  }

  private def canonCastle(tok: String): String =
    if (tok.startsWith("0-0-0")) "O-O-O" + tok.substring(5)
    else if (tok.startsWith("0-0")) "O-O" + tok.substring(3)
    else tok

  /** Normalize raw SAN movetext to canonical Lichess-style form.
    * Null-safe: null in → null out (mirrors SQL null semantics).
    */
  def normalizeMoves(movetext: String): String = {
    if (movetext == null) return null
    val cleaned = stripRegions(movetext)
    val moves = ArrayBuffer.empty[String]
    var i = 0
    val n = cleaned.length
    while (i < n) {
      while (i < n && Character.isWhitespace(cleaned.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(cleaned.charAt(i))) i += 1
      if (i > start) {
        var tok = cleaned.substring(start, i)
        if (!ResultTokens.contains(tok) && !tok.startsWith("$") && tok != "e.p.") {
          tok = dropAnnotation(canonCastle(dropMoveNumber(tok)))
          if (tok.nonEmpty && !ResultTokens.contains(tok)) moves += tok
        }
      }
    }
    // renumber from ply position: "1. e4 e5 2. Nf3 ..."
    val sb = new StringBuilder(cleaned.length)
    var ply = 0
    moves.foreach { m =>
      if (sb.nonEmpty) sb.append(' ')
      if (ply % 2 == 0) { sb.append(ply / 2 + 1).append(". ") }
      sb.append(m)
      ply += 1
    }
    sb.toString
  }

  /** Canonicalize a PGN TimeControl tag (e.g. `40/7200:1800`, `300+3`, `-`,
    * `?`, `*180`). Returns NULL when the value is unknown (`?`, empty) or
    * unparseable — the reference export falls back to the raw tag via
    * COALESCE (reference: src/export-to-parquet.ts:85), and a null here is
    * what makes that fallback observable.
    *
    * Canonical form: stages joined by `:`; each stage one of
    *   `moves/seconds` | `base+increment` | `seconds` | `*seconds` | `-`
    * with integers stripped of leading zeros.
    */
  def normalizeTimecontrol(tc: String): String = {
    if (tc == null) return null
    val t = tc.trim
    if (t.isEmpty || t == "?") return null
    if (t == "-") return "-"
    val stages = t.split(":", -1)
    val out = new Array[String](stages.length)
    var k = 0
    while (k < stages.length) {
      val s = stages(k).trim
      val canon = canonStage(s)
      if (canon == null) return null
      out(k) = canon
      k += 1
    }
    out.mkString(":")
  }

  private def num(s: String): String =
    if (s.nonEmpty && s.forall(Character.isDigit)) String.valueOf(java.lang.Long.parseLong(s))
    else null

  private def canonStage(s: String): String = {
    if (s == "-") return "-"
    val slash = s.indexOf('/')
    if (slash >= 0) {
      val m = num(s.substring(0, slash)); val sec = num(s.substring(slash + 1))
      return if (m == null || sec == null) null else s"$m/$sec"
    }
    val plus = s.indexOf('+')
    if (plus >= 0) {
      val base = num(s.substring(0, plus)); val inc = num(s.substring(plus + 1))
      return if (base == null || inc == null) null else s"$base+$inc"
    }
    if (s.startsWith("*")) {
      val sec = num(s.substring(1))
      return if (sec == null) null else s"*$sec"
    }
    num(s)
  }
}
