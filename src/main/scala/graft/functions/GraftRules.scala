package graft.functions

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: the chess normalizers are idempotent
  * (`f(f(x)) == f(x)`, property-tested in ChessNormSpec), so nested
  * applications collapse to one — the kind of domain rewrite Catalyst can't
  * know about. Nested calls arise naturally when a pipeline defensively
  * re-normalizes already-normalized columns (e.g. enriching a staged table
  * that was normalized at ingest). Injected via
  * [[GraftExtensions]]`.injectOptimizerRule`.
  */
object CollapseChessNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ChessMovesNormalize(inner @ ChessMovesNormalize(_)) => inner
    case ChessTimecontrolNormalize(inner @ ChessTimecontrolNormalize(_)) => inner
  }
}
