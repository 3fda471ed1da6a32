package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine-parity primitives shared by every operator AND its generated
  * DuckDB oracle SQL — single source of truth so the two sides (and the
  * operators among themselves) cannot drift:
  *
  *  - [[r4]]/[[r4Sql]]: round-half-up via floor — Spark round() (BigDecimal
  *    HALF_UP) and DuckDB round() (C rounding on the scaled double) disagree
  *    by 1 ulp on exact .5 boundaries; floor(x·1e4 + 0.5) is bit-identical
  *    given the same input double.
  *  - [[h32]]/[[h32Sql]]: portable 32-bit hash = first 8 md5 hex digits as
  *    int64 (md5 is bit-identical across engines; their native hash
  *    functions are not).
  *  - [[toks]]/[[toksSql]]: whitespace tokenization with empty tokens
  *    dropped.
  */
object Portable {
  def r4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0
  def r4Sql(x: String): String = s"floor(($x) * 10000.0 + 0.5) / 10000.0"

  def h32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")
  def h32Sql(x: String): String = s"('0x' || substr(md5($x), 1, 8))::BIGINT"

  /** Oracle-side 64-bit sibling of [[h32Sql]] — first 8 md5 bytes big-endian
    * as SIGNED int64 (mirrors PortableHash.h64). A direct 16-hex-digit parse
    * would overflow DuckDB's checked BIGINT cast for values ≥ 2^63, so the
    * value is rebuilt from two 32-bit halves in two's complement:
    * (hi − [hi ≥ 2^31]·2^32) · 2^32 + lo — every intermediate stays inside
    * signed-64 range (max (2^31−1)·2^32 + (2^32−1) = 2^63−1).
    */
  def h64Sql(x: String): String = {
    val hi = s"('0x' || substr(md5($x), 1, 8))::BIGINT"
    val lo = s"('0x' || substr(md5($x), 9, 8))::BIGINT"
    s"(($hi - CASE WHEN $hi >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296 + $lo)"
  }

  /** Spark twin of [[h64Sql]] — first 8 md5 bytes big-endian as SIGNED
    * int64 (≡ PortableHash.h64), built from two 32-bit halves in two's
    * complement like the oracle side so every intermediate stays in
    * signed-64 range.
    */
  def h64(c: Column): Column = {
    val hex = md5(c.cast("binary"))
    val hi = conv(substring(hex, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(hex, 9, 8), 16, 10).cast("long")
    (hi - when(hi >= 2147483648L, 4294967296L).otherwise(0L)) * 4294967296L + lo
  }

  /** Native codegen'd tokenizer (r15; guide §4.1) — replaces the
    * interpreted `filter(split(trim(c), "\\s+"), len > 0)` HOF chain in
    * EVERY tokenizing operator with one compiled call per row.
    * Bit-identical semantics by the [[graft.functions.PortableHash.tokens]]
    * contract (PortableHashSpec pins the equivalence against the HOF form).
    */
  def toks(c: Column): Column = graft.functions.chess.toks(c)
  val toksSql: String =
    """list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0)"""

  /** Oracle-side Σ aᵢ·bᵢ over `dim` elements, widened to double, summed in
    * index order — mirrors the native VecDot expression exactly (the Spark
    * side). Shared by every vector operator's generated SQL.
    */
  def dotSql(a: String, b: String, dim: Int = graft.functions.PortableHash.Dim): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"
}
