package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, StringType}

/** PGN write sink — the inverse of the `pgn` DataSource (source↔sink
  * symmetry the reference lacks: it only reads PGN and writes parquet).
  * Serializes games back to standard PGN text (export format spec:
  * Seven Tag Roster order first, remaining tags alphabetically, movetext
  * paragraph separated by a blank line).
  *
  * Distributed shape: serialization is a per-row map producing one string
  * per game; the write is `text` with one file per partition — at 100 TB
  * this parallelizes like any file sink (partition count controls file
  * count; no driver involvement). Round-trips through the `pgn` reader
  * (PgnWriterSpec). The text sink names files `part-*.txt`; read them back
  * with an explicit glob (`.load(s"$dir/part-*")`) — the pgn reader's
  * directory listing filters on `.pgn`, but explicit globs are taken as-is.
  */
object PgnWriter {

  /** Seven Tag Roster (PGN export-format order), then our extension tags. */
  private val TagOrder = Seq(
    "Event", "Site", "Date", "Round", "White", "Black", "Result")

  // object member, not a closure-captured local: DateTimeFormatter is not
  // serializable; module access compiles to a static reference
  private val DateFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy.MM.dd")
  def formatDate(d: java.sql.Date): String = d.toLocalDate.format(DateFmt)

  /** Serialize one game's (tag → value) pairs + movetext to PGN text. */
  def formatGame(tags: Seq[(String, String)], movetext: String): String = {
    val m = tags.filter(_._2 != null).toMap
    val roster = TagOrder.flatMap(t => m.get(t).map(t -> _))
    val rest = (m -- TagOrder).toSeq.sortBy(_._1)
    // PGN tag values are single-line by grammar; PGN-sourced values can never
    // contain line breaks, but write() accepts arbitrary DataFrames — a CR/LF
    // in a value would emit a corrupt tag line that cannot round-trip through
    // the parser. Collapse any line-break run to one space (lossy but loud in
    // diffs, and the output always re-parses).
    val esc = (v: String) => v.replaceAll("[\\r\\n]+", " ")
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val tagLines = (roster ++ rest).map { case (k, v) => s"""[$k "${esc(v)}"]""" }
    val mt = Option(movetext).map(_.trim).filter(_.nonEmpty).getOrElse("*")
    tagLines.mkString("\n") + "\n\n" + mt + "\n"
  }

  /** Write a games DF (any subset of the `pgn` source schema) as PGN text
    * files under `path`. String/int/date columns become tags; `game_id` and
    * `parse_error` are carried as extension tags only if requested.
    */
  def write(games: DataFrame, path: String, includeInternal: Boolean = false): Unit = {
    val spark = games.sparkSession
    import spark.implicits._
    val schema = games.schema
    val tagCols = schema.fields.filter { f =>
      f.name != "movetext" &&
        (includeInternal || (f.name != "game_id" && f.name != "parse_error")) &&
        (f.dataType == StringType || f.dataType == IntegerType ||
          f.dataType == LongType || f.dataType == DateType)
    }.map(_.name)
    // hoist name→index resolution out of the per-row path
    val tagIdx: Array[(String, Int)] = tagCols.map(c => c -> schema.fieldIndex(c))
    val mtIdx = schema.fieldIndex("movetext")
    games.map { row =>
      val tags = tagIdx.toSeq.map { case (c, i) =>
        val v: String =
          if (row.isNullAt(i)) null
          else row.get(i) match {
            case d: java.sql.Date => PgnWriter.formatDate(d)
            case other => other.toString
          }
        c -> v
      }
      formatGame(tags, if (row.isNullAt(mtIdx)) null else row.getString(mtIdx))
    }.write.mode(SaveMode.Overwrite).text(path)
  }
}
