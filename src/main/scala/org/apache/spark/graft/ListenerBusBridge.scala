package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Access bridge for `SparkContext.listenerBus` (private[spark]), same
  * technique as `org.apache.spark.sql.graft.ColumnBridge`: the bench
  * attributes executor task-time/GC-time deltas to the query that just
  * ran, and task-end events are delivered asynchronously — without a
  * drain, a slow bus bleeds one query's metrics into the next row.
  * Used only by the measurement harness, never by operators.
  */
object ListenerBusBridge {
  /** Block until every queued listener event has been dispatched (bounded
    * by the bus's own timeout); swallow errors — a failed drain degrades
    * one metric row, it must never fail the bench.
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty() catch { case _: Throwable => () }
}
