package org.apache.spark

/**
 * Bridge into `private[spark]` scheduler internals, the sibling of
 * [[org.apache.spark.sql.GraftBridge]]: task-metric listeners post
 * asynchronously on the listener bus, so a benchmark snapshotting
 * per-query shuffle/spill deltas must drain the bus before reading its
 * counters or the tail of one query's tasks lands in the next query's
 * bucket.
 */
object GraftListenerBridge {
  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
