package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the text-hash / vector hot paths.
  *
  * The first implementations of shingling, SimHash, MinHash and cosine used
  * Spark higher-order functions (`transform`/`zip_with`/`aggregate`). HOF
  * lambdas are interpreted (CodegenFallback) — every element pays Catalyst
  * eval overhead, and md5-per-token dominated the bench (q21/q22/q24 ≈ 5-6 s
  * each at sf0.1). These expressions compute the same values in one compiled
  * JVM pass per row and stay inside whole-stage codegen via `doGenCode`
  * (each generated call is one static method invocation).
  *
  * Portability contract (same as ops.Portable): token hash = first 8 md5 hex
  * digits of the UTF-8 token bytes as int64 — bit-identical to the DuckDB
  * oracle's `('0x' || substr(md5(t),1,8))::BIGINT`; all vector math widens
  * float→double and sums in element order, matching the oracle's
  * `list_sum(list_transform(...))` exactly.
  */
object PortableHash {

  /** Analyzer-contract type check: TypeCheckFailure (wrapped into a normal
    * AnalysisException with query context) instead of a raw require() throw.
    */
  def expectType(ok: Boolean, msg: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(msg)

  /** MinHash constants — single source of truth for the Spark expression AND
    * the generated oracle SQL (ops.Dedup aliases these).
    */
  val MinhashK = 16
  val P: Long = 2147483647L // 2^31 - 1
  val HashParams: Seq[(Long, Long)] = (0 until MinhashK).map { i =>
    val a = ((2654435761L * (2 * i + 1)) % P) | 1L
    val b = (40503L * 65537L * (i + 7)) % P
    (a, b)
  }

  /** Whitespace tokens, empties dropped (≡ filter(split(trim(c),"\\s+"), len>0)). */
  def tokens(text: String): Array[String] = {
    val raw = text.split("\\s+")
    var n = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) n += 1; i += 1 }
    if (n == raw.length) raw
    else {
      val out = new Array[String](n)
      var j = 0; i = 0
      while (i < raw.length) { if (raw(i).nonEmpty) { out(j) = raw(i); j += 1 }; i += 1 }
      out
    }
  }

  /** [[tokens]] as a Catalyst array value — the native eval body of the
    * `toks` expression (r15): one compiled call per row instead of the
    * interpreted `filter(split(trim(c), "\\s+"), len > 0)` HOF chain,
    * whose lambda was re-evaluated per ELEMENT through the interpreted
    * expression path in every tokenizing operator.
    */
  def toksArray(text: UTF8String): ArrayData = {
    val ts = tokens(text.toString)
    val out = new Array[AnyRef](ts.length)
    var i = 0
    while (i < ts.length) { out(i) = UTF8String.fromString(ts(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** First 4 md5 bytes as unsigned int64 (= first 8 hex digits parsed base-16). */
  def h32(token: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 8 md5 bytes big-endian as int64 — the 64-bit sibling of [[h32]]
    * (single token-hash site for the simhash64 fingerprint and any future
    * 64-bit oracle: DuckDB side would be the first 16 md5 hex digits).
    */
  def h64(token: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
    h
  }

  /** Distinct rolling 3-gram shingle hashes, first-occurrence order
    * (≡ the zip_with/array_distinct formulation in ops.Dedup):
    * (h[i]·31 + h[i+1])·31 + h[i+2].
    */
  def shingleHashes3(text: UTF8String): ArrayData = {
    val ts = tokens(text.toString)
    if (ts.length < 3) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](ts.length)
    var i = 0
    while (i < ts.length) { hs(i) = h32(ts(i)); i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long](ts.length * 2)
    i = 0
    while (i + 2 < ts.length) {
      seen.add((hs(i) * 31 + hs(i + 1)) * 31 + hs(i + 2))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Tokens per window of the q168 repeated-span index. */
  val SpanW = 8

  /** All rolling `w`-token span hashes in position order (one per window,
    * NOT distinct — the repeated-span index counts occurrences): h64 of
    * the space-joined token window, ≡ the oracle's
    * `h64Sql(array_to_string(t[i:i+w-1], ' '))`.
    */
  def spanHashes(text: UTF8String, w: Int): ArrayData = {
    val ts = tokens(text.toString)
    if (ts.length < w) return new GenericArrayData(Array.emptyLongArray)
    new GenericArrayData(spanHashArray(ts, w))
  }

  /** h64 of every space-joined `w`-token window of `ts`, position order —
    * the shared inner pass of [[spanHashes]] and [[minimizerHashes]].
    */
  private def spanHashArray(ts: Array[String], w: Int): Array[Long] = {
    val out = new Array[Long](ts.length - w + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + w - 1 < ts.length) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(ts(i + j))
        j += 1
      }
      out(i) = h64(sb.toString)
      i += 1
    }
    out
  }

  /** Content-defined chunking (the gear/rolling-hash cut rule of the
    * FastCDC/LBFS family, applied to token streams): cut BEFORE token
    * position i (2 ≤ i ≤ n−k+1) whenever the `k`-token span hash starting
    * at i is ≡ 0 (mod `m`); emit one (fp, len) per chunk, where fp = h64
    * of the space-joined chunk tokens and len = its token count. Expected
    * chunk length ≈ m tokens. Boundaries depend only on LOCAL content, so
    * an insertion/deletion re-chunks O(1) chunks instead of shifting every
    * fixed-width window — the shift-resistance that storage dedup built
    * this family for. A document with fewer than k tokens is one chunk;
    * an empty token stream yields no chunks.
    */
  def cdcChunks(text: UTF8String, k: Int, m: Int): ArrayData =
    new GenericArrayData(cdcChunkList(text.toString, k, m).map {
      case (fp, len) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](fp, len)): Any
    })

  /** Plain-Scala core of [[cdcChunks]] — (fp, token length) per chunk.
    * Shared with the streaming chunk-index maintainer, so the batch
    * expression and the stateful processor cut on identical boundaries
    * by construction.
    */
  def cdcChunkList(text: String, k: Int, m: Int): Array[(Long, Int)] = {
    val ts = tokens(text)
    if (ts.length == 0) return Array.empty
    val spans: Array[Long] =
      if (ts.length < k) Array.emptyLongArray else spanHashArray(ts, k)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Int)](4)
    val sb = new java.lang.StringBuilder
    def emit(a: Int, b: Int): Unit = {
      sb.setLength(0)
      var j = a
      while (j <= b) {
        if (j > a) sb.append(' ')
        sb.append(ts(j))
        j += 1
      }
      out += ((h64(sb.toString), b - a + 1))
    }
    var start = 0 // 0-based inclusive
    var i = 1     // candidate cut position (0-based span index ≥ 1)
    while (i <= ts.length - k) {
      if (spans(i) % m == 0) {
        emit(start, i - 1)
        start = i
      }
      i += 1
    }
    emit(start, ts.length - 1)
    out.toArray
  }

  /** Winnowing minimizer selection (Schleimer/Wilkerson/Aiken 2003, the
    * MOSS fingerprint): over the rolling `k`-token span hashes, the MINIMUM
    * hash of every window of `w` consecutive spans — position order,
    * occurrences kept (callers `array_distinct` for the sketch set). Output
    * value at index i = min(span[i..i+w-1]); ties collapse to the same
    * value, so the distinct sketch is independent of tie placement. The
    * sliding min is a monotonic deque — O(n) total, not O(n·w) — so the
    * kernel stays a single compiled pass like [[spanHashes]].
    */
  def minimizerHashes(text: UTF8String, k: Int, w: Int): ArrayData = {
    val ts = tokens(text.toString)
    if (ts.length < k + w - 1) return new GenericArrayData(Array.emptyLongArray)
    val spans = spanHashArray(ts, k)
    val n = spans.length
    val out = new Array[Long](n - w + 1)
    // deque of candidate indices, values increasing front→back
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      while (tail > head && spans(dq(tail - 1)) >= spans(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = spans(dq(head))
      i += 1
    }
    new GenericArrayData(out)
  }


  /** 32-bit SimHash: per-bit ±1 majority vote over token h32 hashes
    * (≡ the aggregate/zip_with formulation in ops.Dedup.simhash).
    */
  def simhash32(text: UTF8String): Long = {
    val ts = tokens(text.toString)
    val sums = new Array[Int](32)
    var i = 0
    while (i < ts.length) {
      val h = h32(ts(i))
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 32) { if (sums(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  /** 64-bit SimHash — the scale-path fingerprint (8×8-bit chunks give
    * pigeonhole-guaranteed recall to hamming ≤ 7). Token hash = full first
    * 8 md5 bytes (big-endian) instead of h32's first 4.
    */
  def simhash64(text: UTF8String): Long = {
    val ts = tokens(text.toString)
    val sums = new Array[Int](64)
    var i = 0
    while (i < ts.length) {
      val h = h64(ts(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (sums(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  /** MinHash signatures: sig_i = min over shingles of ((h mod p)·a_i + b_i) mod p.
    * Returns null for an empty shingle set (≡ array_min over empty → null).
    */
  def minhashSigs(shingles: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val k = a.length
    val sigs = new Array[Long](k)
    java.util.Arrays.fill(sigs, Long.MaxValue)
    var i = 0
    while (i < n) {
      val hp = shingles.getLong(i) % p
      var j = 0
      while (j < k) {
        val v = (hp * a(j) + b(j)) % p
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }

  /** Language-ID marker profiles (single source of truth; ops.TextOps
    * aliases these and generates the oracle SQL from the same lists).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "sqlish"   -> Seq("table", "scan", "join", "query", "filter", "agg"),
    "streamy"  -> Seq("stream", "window", "batch", "value", "event"),
    "datailly" -> Seq("row", "data", "key", "hash", "column", "vector"))

  private lazy val langNames: Array[String] = LangProfiles.map(_._1).toArray
  private lazy val langSets: Array[java.util.HashSet[String]] =
    LangProfiles.map { case (_, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  /** One-pass language ID: marker-hit counts per profile over whitespace
    * tokens (with multiplicity), argmax with (score DESC, lang ASC)
    * tie-break, no hits → ("und", 0). Row format: (lang UTF8String, score
    * Long) — ≡ the explode + broadcast-join + two-agg formulation it
    * replaces, in a single narrow map.
    */
  def langId(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val ts = tokens(text.toString)
    val counts = new Array[Long](langNames.length)
    var i = 0
    while (i < ts.length) {
      var p = 0
      while (p < langSets.length) {
        if (langSets(p).contains(ts(i))) counts(p) += 1
        p += 1
      }
      i += 1
    }
    var best = -1
    var p = 0
    while (p < langNames.length) {
      if (counts(p) > 0 &&
          (best < 0 || counts(p) > counts(best) ||
            (counts(p) == counts(best) && langNames(p) < langNames(best))))
        best = p
      p += 1
    }
    val (lang, score) = if (best < 0) ("und", 0L) else (langNames(best), counts(best))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(lang), score))
  }

  /** LSH hyperplane constants (single source of truth; ops.Similarity
    * aliases these and inlines the same literals into the oracle SQL).
    * Component d of plane i derives from md5("hp_<i>_<d>") — recomputable
    * anywhere, in [-1, 1).
    */
  val LshBits = 8
  val Dim = 64
  lazy val Hyperplanes: Array[Array[Double]] = Array.tabulate(LshBits) { i =>
    Array.tabulate(Dim) { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hp_${i}_$d".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 2001L - 1000L) / 1000.0
    }
  }

  /** Sign-bit bucket over the hyperplanes: bit i set iff Σ_d v[d]·p_i[d] > 0
    * (float widened to double, summed in element order — same arithmetic as
    * the literal element_at chain it replaces).
    */
  def hyperplaneBucketF(v: ArrayData, planes: Array[Array[Double]]): Long = {
    // UnsafeArrayData.getFloat does NOT bounds-check — a short vector would
    // silently read garbage; fail loudly instead
    if (v.numElements() < Dim)
      throw new IllegalArgumentException(
        s"hyperplane_bucket needs $Dim-dim vectors, got ${v.numElements()}")
    var bkt = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var s = 0.0
      var d = 0
      while (d < p.length) { s += v.getFloat(d).toDouble * p(d); d += 1 }
      if (s > 0) bkt |= (1L << i)
      i += 1
    }
    bkt
  }

  /** All plane dot products (the signed margins behind [[hyperplaneBucketF]])
    * — multi-probe LSH flips the sign bit with the smallest |margin|.
    */
  def hyperplaneMarginsF(v: ArrayData, planes: Array[Array[Double]]): ArrayData = {
    if (v.numElements() < Dim)
      throw new IllegalArgumentException(
        s"hyperplane_margins needs $Dim-dim vectors, got ${v.numElements()}")
    val out = new Array[Double](planes.length)
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var s = 0.0
      var d = 0
      while (d < p.length) { s += v.getFloat(d).toDouble * p(d); d += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  // vec_dot fails loudly on mismatched lengths (same contract as
  // hyperplane_bucket): a silent min-length truncation would diverge from
  // the oracle SQL's fixed 1..dim sum on malformed/short embeddings with no
  // signal on either engine.
  private def dotLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vec_dot needs equal-length vectors, got $n vs ${b.numElements()}")
    n
  }

  /** Σ aᵢ·bᵢ over float arrays, widened to double, summed in element order. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = dotLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** Σ aᵢ·bᵢ over double arrays, summed in element order. */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = dotLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** One-pass character-class counts ≡ the three-regex formulation it
    * replaces (q38): n_words = maximal [A-Za-z]+ runs, n_numbers = maximal
    * [0-9]+ runs, n_punct = code points matching `[^A-Za-z0-9\s]` with
    * Java's ASCII `\s` = [ \t\n\x0B\f\r] (regexp_extract_all's default —
    * NOT Character.isWhitespace, which would diverge on NBSP etc.).
    * Iterates CODE POINTS, not chars or bytes: a supplementary character
    * is one regex match, so it must count once here too.
    * (PortableHashSpec pins the equivalence against the regex forms.)
    */
  def charClassCounts(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    var words = 0
    var nums = 0
    var punct = 0
    var inWord = false
    var inNum = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val isL = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
      val isD = cp >= '0' && cp <= '9'
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (isL && !inWord) words += 1
      if (isD && !inNum) nums += 1
      if (!isL && !isD && !isWs) punct += 1
      inWord = isL
      inNum = isD
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](words, nums, punct))
  }

  /** Fixed-point scale for [[letterStats]] ln-terms (parts per 1e9) —
    * MUST equal graft.ops.CorpusOps.EntropyScale (asserted there).
    */
  val EntropyScale = 1000000000L

  /** One-pass letter statistics for the q109 entropy kernel:
    * t = #ASCII letters (case-folded), s = Σ_c count_c · ⌊1e9·ln count_c + ½⌋
    * over the 26-letter histogram — exactly the two aggregates the
    * explode + groupBy formulation computes (the oracle SQL keeps that
    * form; CorpusOpsSpec pins the equivalence). Only ASCII A-Z/a-z count,
    * mirroring strip-then-fold order: Unicode lowercasing FIRST could mint
    * ASCII letters (İ → i + combining dot), so the regex strip runs first
    * in the reference formulation and non-ASCII never reaches the fold.
    */
  def letterStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val counts = new Array[Long](26)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i) // ASCII letters are BMP chars; others don't count
      if (c >= 'A' && c <= 'Z') counts(c - 'A') += 1
      else if (c >= 'a' && c <= 'z') counts(c - 'a') += 1
      i += 1
    }
    var t = 0L
    var sum = 0L
    var k = 0
    while (k < 26) {
      val c = counts(k)
      if (c > 0) {
        t += c
        sum += c * math.floor(math.log(c.toDouble) * EntropyScale + 0.5).toLong
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](t, sum))
  }
}

/** letter_stats(text) → struct<t:bigint, s:bigint> (q109 entropy moments). */
case class LetterStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("s", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "letter_stats"
  override def checkInputDataTypes() =
    PortableHash.expectType(child.dataType == StringType,
      s"letter_stats needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.letterStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.letterStats($c)")

  override protected def withNewChildInternal(newChild: Expression): LetterStats =
    copy(child = newChild)
}

/** char_class_counts(text) → struct<n_words:int, n_numbers:int, n_punct:int>. */
case class CharClassCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_words", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_numbers", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_punct", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_class_counts"
  override def checkInputDataTypes() =
    PortableHash.expectType(child.dataType == StringType,
      s"char_class_counts needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.charClassCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.charClassCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}

/** toks(text) → array<string>: whitespace tokens, empties dropped —
  * bit-identical to `filter(split(trim(text), "\\s+"), len > 0)` (the
  * [[PortableHash.tokens]] contract every other native kernel already
  * tokenizes through), as one codegen'd call instead of an interpreted
  * per-element higher-order filter.
  */
case class Toks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "toks"
  override def checkInputDataTypes() =
    PortableHash.expectType(child.dataType == StringType,
      s"toks needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.toksArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.toksArray($c)")

  override protected def withNewChildInternal(newChild: Expression): Toks =
    copy(child = newChild)
}

/** shingle_hashes(text) → array<bigint>. */
case class ShingleHashes3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"
  override def checkInputDataTypes() =
    PortableHash.expectType(child.dataType == StringType,
      s"shingle_hashes needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.shingleHashes3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.shingleHashes3($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes3 =
    copy(child = newChild)
}

/** span_hashes(text, w) → array<bigint> (one h64 per rolling w-token
  * window, position order, occurrences kept). `w` must be a foldable
  * INT ≥ 2 — the window width is a plan-time constant, like the band
  * geometry of the other kernels.
  */
case class SpanHashes(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "span_hashes"
  override def checkInputDataTypes() = {
    // diagnose the actual problem: types, foldability, and width each get
    // their own message (a bare "got (StringType, IntegerType)" on a
    // width-value failure would show perfectly matching types)
    val widthProblem =
      if (left.dataType != StringType || right.dataType != IntegerType)
        Some(s"needs (STRING, INT), got (${left.dataType}, ${right.dataType})")
      else if (!right.foldable)
        Some("width must be a plan-time constant (foldable), got a non-literal")
      else {
        val w = right.eval()
        if (w == null || w.asInstanceOf[Int] < 2)
          Some(s"width must be >= 2, got $w")
        else None
      }
    PortableHash.expectType(widthProblem.isEmpty,
      s"span_hashes ${widthProblem.getOrElse("")}")
  }

  override protected def nullSafeEval(text: Any, w: Any): Any =
    PortableHash.spanHashes(text.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, w) => s"graft.functions.PortableHash.spanHashes($t, $w)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SpanHashes =
    copy(left = l, right = r)
}

/** cdc_chunks(text, k, m) → array<struct<fp:bigint, len:int>> —
  * content-defined chunks (see PortableHash.cdcChunks): rolling-hash cut
  * rule span_hash % m == 0, fp = h64 of the chunk text. Widths foldable,
  * like span_hashes.
  */
case class CdcChunks(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("len", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"
  override def checkInputDataTypes() = {
    val problem =
      if (first.dataType != StringType || second.dataType != IntegerType ||
          third.dataType != IntegerType)
        Some(s"needs (STRING, INT, INT), got (${first.dataType}, " +
          s"${second.dataType}, ${third.dataType})")
      else if (!second.foldable || !third.foldable)
        Some("k and m must be plan-time constants (foldable), got a non-literal")
      else {
        val k = second.eval()
        val m = third.eval()
        if (k == null || k.asInstanceOf[Int] < 2)
          Some(s"k must be >= 2, got $k")
        else if (m == null || m.asInstanceOf[Int] < 2)
          Some(s"m must be >= 2, got $m")
        else None
      }
    PortableHash.expectType(problem.isEmpty, s"cdc_chunks ${problem.getOrElse("")}")
  }

  override protected def nullSafeEval(text: Any, k: Any, m: Any): Any =
    PortableHash.cdcChunks(text.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, k, m) => s"graft.functions.PortableHash.cdcChunks($t, $k, $m)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): CdcChunks = copy(first = f, second = s, third = t)
}

/** minimizer_hashes(text, k, w) → array<bigint> — winnowing minimizer
  * stream (see PortableHash.minimizerHashes): min of each window of `w`
  * consecutive rolling `k`-token span hashes, position order. Both widths
  * are plan-time constants (foldable INTs), like span_hashes' width.
  */
case class MinimizerHashes(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minimizer_hashes"
  override def checkInputDataTypes() = {
    val problem =
      if (first.dataType != StringType || second.dataType != IntegerType ||
          third.dataType != IntegerType)
        Some(s"needs (STRING, INT, INT), got (${first.dataType}, " +
          s"${second.dataType}, ${third.dataType})")
      else if (!second.foldable || !third.foldable)
        Some("k and w must be plan-time constants (foldable), got a non-literal")
      else {
        val k = second.eval()
        val w = third.eval()
        if (k == null || k.asInstanceOf[Int] < 2)
          Some(s"k must be >= 2, got $k")
        else if (w == null || w.asInstanceOf[Int] < 2)
          Some(s"w must be >= 2, got $w")
        else None
      }
    PortableHash.expectType(problem.isEmpty,
      s"minimizer_hashes ${problem.getOrElse("")}")
  }

  override protected def nullSafeEval(text: Any, k: Any, w: Any): Any =
    PortableHash.minimizerHashes(text.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, k, w) => s"graft.functions.PortableHash.minimizerHashes($t, $k, $w)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): MinimizerHashes = copy(first = f, second = s, third = t)
}

/** simhash32(text) → bigint. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"
  override def checkInputDataTypes() =
    PortableHash.expectType(child.dataType == StringType,
      s"simhash32 needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** simhash64(text) → bigint (the scale-path fingerprint; see
  * PortableHash.simhash64).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes() =
    PortableHash.expectType(child.dataType == StringType,
      s"simhash64 needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** lang_id(text) → struct<lang: string, score: bigint> (see
  * PortableHash.langId). Replaces an explode + broadcast-join + two-agg
  * pipeline (two shuffles over the exploded token stream) with one narrow
  * map.
  */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("lang", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("score", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"
  override def checkInputDataTypes() =
    PortableHash.expectType(child.dataType == StringType,
      s"lang_id needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** minhash_sigs(shingles) → array<bigint> of k signatures; permutation
  * parameters are fixed literals carried by the expression (the operator
  * layer inlines the same constants into the oracle SQL). NULL for an empty
  * shingle array.
  */
case class MinHashSigs(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.minhashSigs(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sigs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.PortableHash.minhashSigs($c, $aRef, $bRef, ${p}L);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** hyperplane_bucket(vec) → bigint: LSH sign-bit bucket id over the fixed
  * PortableHash.Hyperplanes. Replaces a ~4600-node codegen'd literal
  * element_at chain (8 planes × 64 multiply-adds + CASEs) whose janino
  * compilation dominated short queries — one native loop, tiny codegen.
  */
case class HyperplaneBucket(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bucket"
  override def checkInputDataTypes() =
    PortableHash.expectType(
      child.dataType == ArrayType(FloatType, containsNull = true) ||
        child.dataType == ArrayType(FloatType, containsNull = false),
      s"hyperplane_bucket needs ARRAY<FLOAT>, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.hyperplaneBucketF(input.asInstanceOf[ArrayData], PortableHash.Hyperplanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planes = ctx.addReferenceObj("lshPlanes", PortableHash.Hyperplanes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHash.hyperplaneBucketF($c, $planes)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** hyperplane_margins(vec) → array<double>: the signed dot against each
  * fixed hyperplane (same arithmetic as hyperplane_bucket's sign test).
  */
case class HyperplaneMargins(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_margins"
  override def checkInputDataTypes() =
    PortableHash.expectType(
      child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == FloatType,
      s"hyperplane_margins needs ARRAY<FLOAT>, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.hyperplaneMarginsF(input.asInstanceOf[ArrayData], PortableHash.Hyperplanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planes = ctx.addReferenceObj("lshPlanesM", PortableHash.Hyperplanes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHash.hyperplaneMarginsF($c, $planes)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneMargins =
    copy(child = newChild)
}

/** bloom_might_contain(key) → boolean: probes a broadcast
  * `org.apache.spark.util.sketch.BloomFilter` from inside whole-stage
  * codegen — replaces the Scala `udf` pair that used to break the codegen
  * span around the q61 prefilter (no public Catalyst expression exposes
  * `BloomFilter.mightContain*`, so this is ours). The filter rides a
  * Broadcast handle: task binaries serialize the tiny handle, executors
  * fetch the filter blocks once per node — a megabyte-scale filter inlined
  * in the expression tree would instead reserialize per task.
  *
  * Typed probe contract (same as the udfs it replaces): LongType keys probe
  * `mightContainLong`, StringType keys `mightContainString` — matching how
  * `DataFrameStatFunctions.bloomFilter` ingested them. nullIntolerant: a
  * null key yields null, which `filter` drops — correct for the inner
  * equi-join this guards (null never matches).
  */
case class BloomMightContain(
    child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"
  override def checkInputDataTypes() =
    PortableHash.expectType(
      child.dataType == LongType || child.dataType == StringType,
      s"bloom_might_contain needs BIGINT or STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    if (child.dataType == LongType) bloom.value.mightContainLong(input.asInstanceOf[Long])
    else bloom.value.mightContainString(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    val probe =
      if (child.dataType == LongType) (c: String) => s"mightContainLong($c)"
      else (c: String) => s"mightContainString($c.toString())"
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $bRef.value()).${probe(c)}")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** vec_dot(a, b) → double; accepts array<float> or array<double> (both sides
  * same element type), widening to double and summing in element order.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }
  override def checkInputDataTypes() =
    PortableHash.expectType(
      Seq(left.dataType, right.dataType).forall {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      } && left.dataType.asInstanceOf[ArrayType].elementType ==
        right.dataType.asInstanceOf[ArrayType].elementType,
      s"vec_dot needs two ARRAY<FLOAT> or ARRAY<DOUBLE> of the same element type, " +
        s"got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (elemType == FloatType)
      PortableHash.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      PortableHash.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (elemType == FloatType) "dotF" else "dotD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PortableHash.$m($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}
