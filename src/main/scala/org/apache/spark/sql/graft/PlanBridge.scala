package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `Dataset.ofRows` (private[sql]) — the [[graft.functions
  * .AutoRangeCumSum]] optimizer rule rebuilds a matched window subtree
  * through the public DataFrame API (so the ANALYZER performs the
  * self-join attribute deduplication the ranged plan needs), which
  * requires lifting the window's child `LogicalPlan` back into a
  * DataFrame. Same namespace technique as [[ColumnBridge]].
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
