package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, Spark 4 moved Column to
  * opaque ColumnNodes). Needed to wrap runtime-parameterized expressions —
  * ones carrying a non-literal object like a Bloom-filter broadcast — which
  * cannot go through the FunctionRegistry path the rest of graft.functions
  * uses (a registry builder only receives child expressions). Living in the
  * `org.apache.spark.sql` namespace for access is the standard extension
  * technique; the alternative (an `ExpressionColumnNode` reimplementation)
  * would duplicate Spark internals instead of delegating to them.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
