package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.NumericType

/** Markdown table rendering for pipeline validation output — S10 parity with
  * the reference, which prints its stage-end validation queries through
  * `duckdb -markdown` (/root/reference/src/read-pgn.ts:54-56,
  * /root/reference/src/export-to-parquet.ts:102-104): pipe-delimited header,
  * a separator row with `:` on the right side of numeric columns
  * (right-aligned), then padded value rows.
  *
  * Driver-side by design: validation tables are stage summaries (counts,
  * parse-error samples) — `maxRows` caps the collect so a pathological
  * input cannot pull a fact table onto the driver; overflow is marked with
  * a trailing ellipsis row instead of silently truncating.
  */
object Markdown {

  def render(df: DataFrame, maxRows: Int = 100): String = {
    val cols = df.columns
    val rightAlign = df.schema.fields.map(_.dataType.isInstanceOf[NumericType])
    val collected = df.limit(maxRows + 1).collect()
    val overflow = collected.length > maxRows
    val cells = collected.take(maxRows).map(r =>
      cols.indices.map(i => if (r.isNullAt(i)) "NULL" else r.get(i).toString).toArray)
    val widths = cols.indices.map(i =>
      math.max(cols(i).length, (3 +: cells.map(_(i).length).toSeq).max)).toArray

    def pad(s: String, i: Int): String =
      if (rightAlign(i)) (" " * (widths(i) - s.length)) + s
      else s + (" " * (widths(i) - s.length))

    def row(vals: IndexedSeq[String]): String =
      vals.indices.map(i => pad(vals(i), i)).mkString("| ", " | ", " |")

    val sep = cols.indices.map { i =>
      if (rightAlign(i)) ("-" * (widths(i) + 1)) + ":" else "-" * (widths(i) + 2)
    }.mkString("|", "|", "|")

    val body = cells.map(c => row(c.toIndexedSeq))
    val tail = if (overflow) Seq(row(cols.indices.map(i => if (i == 0) "..." else ""))) else Nil
    (Seq(row(cols.toIndexedSeq), sep) ++ body ++ tail).mkString("\n")
  }
}
