package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, floor}
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite the scale-killer window shape — a
  * running SUM over a partition-less `ORDER BY key` frame, which Spark
  * plans as ONE task sorting the whole input — into the distributed
  * ranged form ([[graft.ops.ScaleOps.rangedCumSum]]: range-partitioned
  * local windows + a broadcast theta-join of catalog-sized range totals).
  * The hand-written recoveries (q172/q174 and the ranged prefix family)
  * prove that plan row-identical to the window form; this rule applies
  * the SAME rewrite automatically, so a user's naive
  * `sum(x).over(Window.orderBy(key))` survives a mega-corpus without the
  * user knowing the discipline.
  *
  * Deliberately narrow (the rewrite is only claimed where it is proven):
  * fires only when EVERY window expression in the node is a running
  * LongType SUM of an attribute over `ROWS BETWEEN UNBOUNDED PRECEDING
  * AND CURRENT ROW`, the partition spec is empty, and the ordering is a
  * single ascending LongType attribute. Anything else is left for
  * Spark's planner untouched.
  *
  * Opt-in via session conf [[AutoRangeCumSum.BucketKey]] (the range
  * width in key units — the max-rows-per-task knob, exactly
  * rangedCumSum's `rangeId` contract); unset/≤0 disables the rule.
  * Equal-key ties: the running sum within duplicate keys is
  * order-nondeterministic in the WINDOW form already — the rewrite
  * preserves the per-distinct-key prefix sums exactly and is
  * row-identical whenever the key is unique (the q51/q172 contract).
  *
  * Implementation note: the replacement plan is built through the
  * public DataFrame API (`Dataset.ofRows` on the window's child +
  * `ScaleOps.rangedCumSum`) and re-analyzed — the analyzer handles the
  * self-join attribute deduplication the ranged form needs, which a
  * hand-built logical tree would have to redo. A final Project restores
  * the original output attribute ids/names, so downstream operators are
  * untouched. The rule no-ops once rewritten (the produced windows are
  * range-PARTITIONED), so the fixed-point batch terminates.
  */
object AutoRangeCumSum extends Rule[LogicalPlan] {

  val BucketKey = "graft.autorange.bucket"

  private case class RunningSum(outName: String, outId: ExprId, value: Attribute)

  /** The running-sum frame: ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
    * ROW (also what an ORDER BY window defaults to via RANGE — accept the
    * RowFrame form only, where the equal-key caveat matches the ranged
    * local windows exactly).
    */
  private def isRunningFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    }

  private def asRunningSum(e: NamedExpression): Option[RunningSum] = e match {
    case a @ Alias(WindowExpression(
        AggregateExpression(Sum(v: AttributeReference, _), _, false, None, _),
        spec: WindowSpecDefinition), name)
      if spec.partitionSpec.isEmpty && isRunningFrame(spec) &&
        v.dataType == LongType =>
      Some(RunningSum(name, a.exprId, v))
    case _ => None
  }

  /** The NAME-based rebuild below is only safe when names identify
    * attributes uniquely: distinct child column names, no collision with
    * the rangedCumSum temp prefixes, distinct window output names. A
    * child violating any of these keeps its (correct, merely slow)
    * window plan — the rule bails rather than risks a wrong binding.
    */
  private def namesSafe(child: LogicalPlan,
      sums: Seq[RunningSum]): Boolean = {
    val childNames = child.output.map(_.name)
    childNames.distinct.size == childNames.size &&
      !childNames.exists(n => n == "__rid" || n.startsWith("__ar_") ||
        n.startsWith("__t_") || n.startsWith("__o_")) &&
      sums.map(_.outName).distinct.size == sums.size
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // an unparseable bucket disables the rule (a config typo must not
    // fail every query in the session from inside the optimizer)
    val bucket = SparkSession.getActiveSession
      .flatMap(_.conf.getOption(BucketKey)).flatMap(_.trim.toLongOption)
      .getOrElse(0L)
    if (bucket <= 0L) return plan
    plan.transformUp {
      // NULLS FIRST only (the Ascending default): NULL-key rows are the
      // GLOBAL head of the running sum, so they map below to a dedicated
      // Long.MinValue range — a bare floor(NULL/bucket) rangeId would
      // fall out of the offsets theta-join and silently undercount every
      // other row's prefix. NullsLast would need the mirror construction
      // and is left unmatched.
      case w @ Window(windowExprs, Nil,
          Seq(SortOrder(key: AttributeReference, Ascending, NullsFirst, _)),
          child, _)
          if key.dataType == LongType && windowExprs.nonEmpty &&
            windowExprs.forall(e => asRunningSum(e).isDefined) &&
            namesSafe(child, windowExprs.flatMap(asRunningSum)) =>
        val spark = SparkSession.getActiveSession.get
        val sums = windowExprs.flatMap(asRunningSum)
        // build the proven ranged plan over the child via the public API;
        // temp names cannot collide with child columns (prefixed)
        val childDf = org.apache.spark.sql.graft.PlanBridge.ofRows(spark, child)
        // NULL keys get their own first range (Long.MinValue — no real
        // key's bucket can reach it); within it they tie, which is the
        // same order-nondeterminism duplicate keys have in the window
        // form itself. Local windows order NULLS FIRST like the original.
        val rangeId = org.apache.spark.sql.functions.when(
          col(key.name).isNull, Long.MinValue)
          .otherwise(floor(col(key.name).cast("double") / bucket.toDouble))
        val ranged = graft.ops.ScaleOps.rangedCumSum(
          childDf, key.name, rangeId,
          sums.map(s => s.value.name -> s"__ar_${s.outName}"))
        // the rebuilt subtree is ANALYZED but not optimized, and the
        // optimizer batches that normalize analysis-only nodes
        // (EliminateResolvedHint for the broadcast() hints,
        // EliminateSubqueryAliases for the self-join aliases) already ran
        // before user-provided rules — run the session optimizer on the
        // subtree. Re-entrancy is safe: the ranged subtree's windows are
        // all range-PARTITIONED, so this rule cannot re-fire inside it.
        val analyzed = spark.sessionState.optimizer
          .execute(ranged.queryExecution.analyzed)
        // restore the window node's exact output: child attributes by
        // NAME (rangedCumSum preserves them), then each running sum
        // under its original name AND exprId
        def byName(n: String): Attribute =
          analyzed.output.find(_.name == n).getOrElse(
            throw new IllegalStateException(s"autorange lost column $n"))
        val restored: Seq[NamedExpression] = w.output.map { out =>
          sums.find(_.outId == out.exprId) match {
            case Some(s) =>
              Alias(byName(s"__ar_${s.outName}"), s.outName)(exprId = s.outId)
            case None => byName(out.name)
          }
        }
        Project(restored, analyzed)
    }
  }
}
