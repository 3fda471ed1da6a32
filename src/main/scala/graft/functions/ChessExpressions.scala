package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the chess normalizers (SURVEY.md §2.6 F1/F2,
  * reference: src/read-pgn.ts:48). Native `Expression`s with `doGenCode`, so
  * they stay inside whole-stage codegen rather than breaking the pipeline the
  * way a Scala `udf()` would — per-row cost is one static JVM call.
  */
case class ChessMovesNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "chess_moves_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(ChessNorm.normalizeMoves(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.ChessNorm.normalizeMoves($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): ChessMovesNormalize =
    copy(child = newChild)
}

/** `chess_timecontrol_normalize` — may return NULL for a non-null input
  * (unknown/unparseable tag), which the export's COALESCE fallback relies on.
  */
case class ChessTimecontrolNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "chess_timecontrol_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ChessNorm.normalizeTimecontrol(input.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("tcNorm")
      s"""
         |String $tmp = graft.functions.ChessNorm.normalizeTimecontrol($c.toString());
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($tmp);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ChessTimecontrolNormalize =
    copy(child = newChild)
}

/** Session extension registering the chess functions into the SQL
  * FunctionRegistry — build sessions with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or config
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("chess_moves_normalize"),
      new ExpressionInfo(classOf[ChessMovesNormalize].getName, "chess_moves_normalize"),
      (args: Seq[Expression]) => ChessMovesNormalize(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("chess_timecontrol_normalize"),
      new ExpressionInfo(classOf[ChessTimecontrolNormalize].getName, "chess_timecontrol_normalize"),
      (args: Seq[Expression]) => ChessTimecontrolNormalize(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes3].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes3(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("span_hashes8"),
      new ExpressionInfo(classOf[SpanHashes].getName, "span_hashes8"),
      (args: Seq[Expression]) =>
        SpanHashes(args.head, Literal(PortableHash.SpanW))))
    ext.injectFunction((
      new FunctionIdentifier("span_hashes"),
      new ExpressionInfo(classOf[SpanHashes].getName, "span_hashes"),
      {
        case Seq(t, w) => SpanHashes(t, w)
        case other => throw new IllegalArgumentException(
          s"span_hashes expects 2 arguments (text, width), got ${other.length}")
      }: Seq[Expression] => Expression))
    ext.injectFunction((
      new FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      {
        case Seq(t, k, m) => CdcChunks(t, k, m)
        case other => throw new IllegalArgumentException(
          s"cdc_chunks expects 3 arguments (text, k, m), got ${other.length}")
      }: Seq[Expression] => Expression))
    ext.injectFunction((
      new FunctionIdentifier("minimizer_hashes"),
      new ExpressionInfo(classOf[MinimizerHashes].getName, "minimizer_hashes"),
      {
        case Seq(t, k, w) => MinimizerHashes(t, k, w)
        case other => throw new IllegalArgumentException(
          s"minimizer_hashes expects 3 arguments (text, k, w), got ${other.length}")
      }: Seq[Expression] => Expression))
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (args: Seq[Expression]) => SimHash32(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangId].getName, "lang_id"),
      (args: Seq[Expression]) => LangId(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (args: Seq[Expression]) => MinHashSigs(args.head,
        PortableHash.HashParams.map(_._1), PortableHash.HashParams.map(_._2),
        PortableHash.P)))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket"),
      (args: Seq[Expression]) => HyperplaneBucket(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_margins"),
      new ExpressionInfo(classOf[HyperplaneMargins].getName, "hyperplane_margins"),
      (args: Seq[Expression]) => HyperplaneMargins(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("char_class_counts"),
      new ExpressionInfo(classOf[CharClassCounts].getName, "char_class_counts"),
      (args: Seq[Expression]) => CharClassCounts(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("letter_stats"),
      new ExpressionInfo(classOf[LetterStats].getName, "letter_stats"),
      (args: Seq[Expression]) => LetterStats(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("toks"),
      new ExpressionInfo(classOf[Toks].getName, "toks"),
      (args: Seq[Expression]) => Toks(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    ext.injectOptimizerRule(_ => CollapseChessNormalize)
    ext.injectOptimizerRule(_ => AutoRangeCumSum)
  }
}

/** Column-API entry points (work on any session built with GraftExtensions). */
object chess {
  def movesNormalize(c: Column): Column = call_function("chess_moves_normalize", c)
  def timecontrolNormalize(c: Column): Column = call_function("chess_timecontrol_normalize", c)
  def shingleHashes(c: Column): Column = call_function("shingle_hashes", c)
  def spanHashes8(c: Column): Column = call_function("span_hashes8", c)
  def spanHashes(c: Column, w: Int): Column =
    call_function("span_hashes", c, lit(w))
  def minimizerHashes(c: Column, k: Int, w: Int): Column =
    call_function("minimizer_hashes", c, lit(k), lit(w))
  def cdcChunks(c: Column, k: Int, m: Int): Column =
    call_function("cdc_chunks", c, lit(k), lit(m))
  def simhash32(c: Column): Column = call_function("simhash32", c)
  def simhash64(c: Column): Column = call_function("simhash64", c)
  def langId(c: Column): Column = call_function("lang_id", c)
  def charClassCounts(c: Column): Column = call_function("char_class_counts", c)
  def letterStats(c: Column): Column = call_function("letter_stats", c)
  def minhashSigs(c: Column): Column = call_function("minhash_sigs", c)
  def toks(c: Column): Column = call_function("toks", c)
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def hyperplaneBucket(c: Column): Column = call_function("hyperplane_bucket", c)
  def hyperplaneMargins(c: Column): Column = call_function("hyperplane_margins", c)

  /** Standard session builder for this engine: UTC, 32 shuffle partitions
    * (local[32] container — on a real cluster this is sized to cores), AQE on,
    * graft extensions registered.
    */
  def session(appName: String = "graft", master: String = "local[*]"): SparkSession =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
