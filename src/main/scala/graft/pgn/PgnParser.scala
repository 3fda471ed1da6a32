package graft.pgn

import scala.collection.mutable

/** Pure-Scala PGN (Portable Game Notation) parser — no Spark dependency.
  *
  * Semantics mirror the reference's `read_pgn()` table function
  * (reference: src/read-pgn.ts:49): one output row per game, header tag
  * pairs become columns, the SAN movetext becomes `movetext`, and malformed
  * games are captured as rows with a non-null `parse_error` instead of
  * failing the whole scan (reference: src/read-pgn.ts:55 reports
  * `WHERE parse_error IS NOT NULL`).
  *
  * Format handled:
  *  - a game = a run of tag-pair lines `[Key "value"]`, then its movetext
  *    section, conventionally separated by a blank line;
  *  - tag values support `\"` and `\\` escapes;
  *  - movetext may span lines; `{...}` comments may span lines and may
  *    contain `[`, so a `[` only starts a new game when we are not inside a
  *    brace comment;
  *  - `;` starts a rest-of-line comment (stays part of the movetext string —
  *    stripping is the normalizer's job, not the parser's);
  *  - a malformed tag line or a game with no movetext yields the game with
  *    `parseError` set; the parser never throws on input content.
  *
  * The parser is streaming (line iterator in, game iterator out): memory is
  * O(one game), never O(file) — required for multi-GB PGN files where a
  * DataSource split is a whole file (SURVEY.md §7 hard parts).
  */
object PgnParser {

  /** One parsed game. `tags` preserves first-wins on duplicate keys. */
  final case class Game(
      tags: Map[String, String],
      movetext: String,
      parseError: Option[String])

  private val ResultTokens = Set("1-0", "0-1", "1/2-1/2", "*")

  /** Parse one `[Key "value"]` tag line. Returns Left(error) on malformed. */
  def parseTagLine(line: String): Either[String, (String, String)] = {
    val t = line.trim
    if (!t.startsWith("[") || !t.endsWith("]"))
      return Left(s"malformed tag line: $t")
    val inner = t.substring(1, t.length - 1).trim
    val sp = inner.indexOf(' ')
    if (sp < 0) return Left(s"tag line missing value: $t")
    val key = inner.substring(0, sp)
    val rest = inner.substring(sp + 1).trim
    if (rest.length < 2 || rest.charAt(0) != '"' || rest.charAt(rest.length - 1) != '"')
      return Left(s"tag value not quoted: $t")
    // unescape \" and \\ inside the quoted value
    val raw = rest.substring(1, rest.length - 1)
    val sb = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        sb.append(raw.charAt(i + 1)); i += 2
      } else { sb.append(c); i += 1 }
    }
    Right((key, sb.toString))
  }

  /** Streaming parse: line iterator in → game iterator out. */
  def parseLines(lines: Iterator[String]): Iterator[Game] = new Iterator[Game] {
    // strip a UTF-8 BOM (U+FEFF) glued to a line start — otherwise the
    // first `[Event` tag of a BOM-prefixed file is not recognized
    private val it = lines.map { l =>
      if (l.nonEmpty && l.charAt(0) == '\uFEFF') l.substring(1) else l
    }.buffered
    private var nextGame: Game = _
    private var done = false
    advance()

    override def hasNext: Boolean = !done
    override def next(): Game = {
      val g = nextGame; advance(); g
    }

    private def advance(): Unit = {
      // skip blank lines between games
      while (it.hasNext && it.head.trim.isEmpty) it.next()
      if (!it.hasNext) { done = true; return }

      val tags = mutable.LinkedHashMap.empty[String, String]
      var firstError: Option[String] = None
      def recordError(e: String): Unit =
        if (firstError.isEmpty) firstError = Some(e)

      // --- tag section ---
      var inTags = it.hasNext && it.head.trim.startsWith("[")
      while (inTags && it.hasNext) {
        val t = it.head.trim
        if (t.isEmpty) { it.next(); inTags = false } // blank → movetext next
        else if (t.startsWith("[")) {
          parseTagLine(it.next()) match {
            case Right((k, v)) => if (!tags.contains(k)) tags(k) = v
            case Left(err)     => recordError(err)
          }
        } else inTags = false // lenient: movetext without blank separator
      }
      if (tags.isEmpty) recordError("game has no tag pairs")

      // --- movetext section (may span lines; '{' comments may hide '[') ---
      val mt = new StringBuilder
      var braceDepth = 0
      var sawResult = false
      var inMove = true
      while (inMove && it.hasNext) {
        val line = it.head
        val t = line.trim
        if (braceDepth == 0 && t.startsWith("[")) inMove = false // next game
        else {
          it.next()
          if (t.isEmpty) {
            // blank line ends the game once any movetext was collected
            if (mt.nonEmpty) inMove = false
          } else {
            if (mt.nonEmpty) mt.append('\n')
            mt.append(line)
            // track brace depth (ignoring ';' line comments at depth 0) and
            // collect outside-comment text for result-token detection — a
            // result followed by `; comment` or separated by tabs still
            // counts; "1-0" inside a {…} comment does not
            val outside = new StringBuilder(line.length)
            var i = 0
            var lineComment = false
            while (i < line.length && !lineComment) {
              val c = line.charAt(i)
              c match {
                case '{' => braceDepth += 1
                case '}' => if (braceDepth > 0) braceDepth -= 1
                case ';' if braceDepth == 0 => lineComment = true
                case _ => if (braceDepth == 0) outside.append(c)
              }
              i += 1
            }
            if (!sawResult && outside.toString.split("\\s+")
                .exists(ResultTokens.contains)) sawResult = true
          }
        }
      }
      if (mt.isEmpty) recordError("game has no movetext")
      else if (!sawResult) recordError("movetext missing result token")

      nextGame = Game(tags.toMap, mt.toString, firstError)
    }
  }

  /** Convenience: parse a whole string (tests / small inputs). */
  def parseString(content: String): Iterator[Game] =
    parseLines(content.linesIterator)
}
