package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.functions.chess

/** Exercises the Catalyst expressions through SQL + codegen (not just the
  * pure functions): registration via GraftExtensions, null propagation, and
  * the generated-code path over a real DataFrame.
  */
class ChessExpressionsSpec extends AnyFunSuite with SparkTestBase {

  test("functions registered and callable from SQL") {
    val row = spark.sql(
      """SELECT chess_moves_normalize('1.e4! {x} e5 2.Nf3 1-0') AS m,
        |       chess_timecontrol_normalize('0300+03') AS t""".stripMargin).head()
    assert(row.getString(0) == "1. e4 e5 2. Nf3")
    assert(row.getString(1) == "300+3")
  }

  test("codegen path over a DataFrame with nulls") {
    import spark.implicits._
    val df = Seq(
      Some("1. e4 e5 2. Nf3 Nc6 1-0"),
      Some("1.d4 {q} d5 (1...Nf6) 2.c4 *"),
      None
    ).toDF("movetext")
    val out = df.select(chess.movesNormalize(col("movetext")).as("m"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0).contains("1. e4 e5 2. Nf3 Nc6"))
    assert(out(1).contains("1. d4 d5 2. c4"))
    assert(out(2).isEmpty)
  }

  test("optimizer rule collapses nested idempotent normalize calls") {
    // parquet-backed column: a literal input would be constant-folded away
    // before the rule is observable
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(chess.movesNormalize(chess.movesNormalize(col("text"))).as("m"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("chess_moves_normalize".r.findAllIn(optimized).length == 1,
      s"nested call not collapsed:\n$optimized")
  }

  test("timecontrol null for unparseable, non-null preserved (COALESCE contract)") {
    import spark.implicits._
    val df = Seq("300+3", "blitz", "?", "-").toDF("tc")
    val out = df.select(chess.timecontrolNormalize(col("tc")).as("t"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("300+3"), None, None, Some("-")))
  }
}
