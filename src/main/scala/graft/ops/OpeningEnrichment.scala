package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Opening enrichment — the reference's flagship operator (SURVEY.md §2.3
  * J1/J2; reference: src/find-openings.ts:63-80).
  *
  * Reference semantics: for each game with `Opening IS NULL`, find the
  * openings row with the greatest `opening_ply` whose `pgn` line is contained
  * in the game's `clean_movetext`; write its `eco`/`name` back onto the game.
  * The reference's `LIMIT 1` has a nondeterministic tie-break; we impose the
  * total order (opening_ply, eco, name) maximal (documented divergence,
  * SURVEY.md §7).
  *
  * Two physical forms, same logical result:
  *
  *  - [[enrich]] — declarative parity form: broadcast theta-join on
  *    `contains(clean_movetext, pgn)` + per-game argmax via `max(struct(…))`
  *    (partial-aggregable, map-side combine; no window shuffle-sort). This is
  *    the form the DuckDB oracle SQL mirrors 1:1.
  *  - [[enrichTrie]] — scale form: every openings `pgn` is a move-sequence
  *    PREFIX, so the trie matches prefix-with-word-boundary (match must end
  *    at end-of-string or a space). A broadcast trie walks each game once:
  *    O(len) per game instead of O(#openings × len) substring scans — the
  *    difference between 3.5k contains calls and one string walk per row at
  *    100 TB.
  *
  * DELIBERATE DIVERGENCE (documented, SURVEY.md §7): the reference's
  * CONTAINS also matches an opening line appearing as an INTERIOR substring
  * (e.g. `"11. e4 e5"` contains `"1. e4"` starting at index 1), which
  * mislabels such games — an opening reached mid-game is not the game's
  * opening. Our pipeline semantics (both forms' documented contract, and
  * what tools/chess_golden.py oracles) are anchored prefix + boundary;
  * [[enrich]] keeps the literal contains form only as the 1:1 replay of the
  * reference SQL for the parity proof of the join/argmax shape.
  *
  * Both forms shuffle exactly once (the argmax groupBy in `enrich`; none at
  * all in `enrichTrie` — the trie match is a map and the write-back a
  * broadcastable join of the small matched side).
  */
object OpeningEnrichment {

  /** openings(eco,name,pgn,uci) → + opening_ply (reference: find-openings.ts:65). */
  def withPly(openings: DataFrame): DataFrame =
    openings.withColumn("opening_ply", size(split(col("uci"), " ")))

  /** Parity form: broadcast contains-join + argmax. */
  def enrich(games: DataFrame, openings: DataFrame): DataFrame = {
    val ops = withPly(openings).select("eco", "name", "pgn", "opening_ply")
    val target = games.filter(col("Opening").isNull)
      .select(col("game_id").as("t_game_id"), col("clean_movetext"))
    val best = target
      .join(broadcast(ops), col("clean_movetext").contains(col("pgn")))
      .groupBy(col("t_game_id"))
      .agg(max(struct(col("opening_ply"), col("eco"), col("name"))).as("best"))
      .select(
        col("t_game_id"),
        col("best.eco").as("m_eco"),
        col("best.name").as("m_name"))
    writeBack(games, best)
  }

  /** Scale form: broadcast trie, one pass per game, zero shuffle on the fact
    * side (the matched set is small relative to games and joins back
    * broadcast under AQE).
    */
  def enrichTrie(games: DataFrame, openings: DataFrame): DataFrame = {
    val spark = games.sparkSession
    import spark.implicits._
    val rows = withPly(openings).select("pgn", "opening_ply", "eco", "name")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
    val trie = OpeningTrie.build(rows.toIndexedSeq)
    val bc = spark.sparkContext.broadcast(trie)
    val matched = games.filter(col("Opening").isNull)
      .select(col("game_id"), col("clean_movetext"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val t = bc.value
        it.flatMap { case (id, mt) =>
          t.longestMatch(mt).map { case (eco, name) => (id, eco, name) }
        }
      }
      .toDF("t_game_id", "m_eco", "m_name")
    writeBack(games, matched)
  }

  /** Streaming form: rows carry their movetext, the trie is a broadcast —
    * enrichment becomes a pure per-row map (no join at all), so it runs in
    * any streaming output mode with zero state. This is the live-ingest
    * version of the flagship operator: a PGN drop-directory stream
    * (`readStream.format("pgn")`) → this → `writeStream`.
    */
  final case class GameLite(game_id: Long, clean_movetext: String,
      ECO: String, Opening: String)

  def enrichStream(
      games: org.apache.spark.sql.Dataset[GameLite],
      openings: DataFrame): org.apache.spark.sql.Dataset[GameLite] = {
    val spark = games.sparkSession
    import spark.implicits._
    val rows = withPly(openings).select("pgn", "opening_ply", "eco", "name")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
    val bc = spark.sparkContext.broadcast(OpeningTrie.build(rows.toIndexedSeq))
    games.mapPartitions { it =>
      val t = bc.value
      it.map { g =>
        if (g.Opening != null) g
        else t.longestMatch(g.clean_movetext) match {
          case Some((eco, name)) => g.copy(ECO = eco, Opening = name)
          case None => g
        }
      }
    }
  }

  /** Full-row streaming enrichment (r10): [[enrichStream]] is the typed
    * GameLite form; the streaming CORPUS pipeline (drop-dir →
    * enrichment → 20-column partitioned publish) needs every column to
    * survive, so this applies the identical broadcast trie as a pure
    * per-row map over the full Row (Encoders.row keeps the schema) —
    * still zero joins, zero state, any output mode. Semantics are
    * bit-identical to batch [[enrichTrie]] + writeBack: only
    * Opening-IS-NULL rows are probed; a match overwrites ECO and fills
    * Opening, a miss leaves the row untouched.
    */
  def enrichStreamRows(games: DataFrame, openings: DataFrame): DataFrame = {
    val spark = games.sparkSession
    val rows = withPly(openings).select("pgn", "opening_ply", "eco", "name")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
    val bc = spark.sparkContext.broadcast(OpeningTrie.build(rows.toIndexedSeq))
    val schema = games.schema
    val mtIdx = schema.fieldIndex("clean_movetext")
    val ecoIdx = schema.fieldIndex("ECO")
    val opIdx = schema.fieldIndex("Opening")
    games.mapPartitions { it =>
      val t = bc.value
      it.map { r =>
        if (!r.isNullAt(opIdx)) r
        else t.longestMatch(r.getString(mtIdx)) match {
          case Some((eco, name)) =>
            val vs = r.toSeq.toArray
            vs(ecoIdx) = eco
            vs(opIdx) = name
            org.apache.spark.sql.Row.fromSeq(vs.toIndexedSeq)
          case None => r
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** J2 rewrite: no in-place UPDATE on immutable storage — left-join the
    * matched (game_id → eco,name) back and coalesce (reference:
    * find-openings.ts:71; SURVEY.md §2.3 J2). Untouched rows/columns pass
    * through bit-identical.
    */
  private def writeBack(games: DataFrame, best: DataFrame): DataFrame = {
    val out = games.join(broadcast(best), games("game_id") === best("t_game_id"), "left")
    out
      .withColumn("ECO", coalesce(col("m_eco"), col("ECO")))
      .withColumn("Opening", coalesce(col("Opening"), col("m_name")))
      .drop("t_game_id", "m_eco", "m_name")
  }
}

/** Character trie over opening `pgn` lines. `longestMatch` walks the
  * normalized movetext once, remembering the deepest terminal whose match
  * ends at a word boundary; terminal payloads carry the (ply,eco,name)-max
  * winner when two openings share an identical pgn line.
  */
final class OpeningTrie extends Serializable {
  private val root = new OpeningTrie.Node

  def insert(pgn: String, ply: Int, eco: String, name: String): Unit = {
    var node = root
    var i = 0
    while (i < pgn.length) {
      node = node.children.getOrElseUpdate(pgn.charAt(i), new OpeningTrie.Node)
      i += 1
    }
    // deterministic tie-break on duplicate pgn lines: (ply, eco, name) max
    val cand = (ply, eco, name)
    if (node.terminal == null || OpeningTrie.gt(cand, node.terminal)) node.terminal = cand
  }

  /** Longest opening whose pgn is a prefix of `movetext` ending at a word
    * boundary (end or space). Returns (eco, name).
    */
  def longestMatch(movetext: String): Option[(String, String)] = {
    if (movetext == null) return None
    var node = root
    var best: (Int, String, String) = null
    var i = 0
    while (node != null && i <= movetext.length) {
      if (node.terminal != null &&
          (i == movetext.length || movetext.charAt(i) == ' ') &&
          (best == null || OpeningTrie.gt(node.terminal, best)))
        best = node.terminal
      if (i < movetext.length) {
        node = node.children.getOrElse(movetext.charAt(i), null)
      } else node = null
      i += 1
    }
    Option(best).map(t => (t._2, t._3))
  }
}

object OpeningTrie {
  private[ops] final class Node extends Serializable {
    val children = new scala.collection.mutable.HashMap[Char, Node]
    var terminal: (Int, String, String) = _
  }

  private def gt(a: (Int, String, String), b: (Int, String, String)): Boolean =
    Ordering.Tuple3[Int, String, String].gt(a, b)

  def build(rows: Seq[(String, Int, String, String)]): OpeningTrie = {
    val t = new OpeningTrie
    rows.foreach { case (pgn, ply, eco, name) => t.insert(pgn, ply, eco, name) }
    t
  }
}
