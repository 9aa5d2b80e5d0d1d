package org.apache.spark

/** Bridge to `private[spark]` core internals needed by the bench
  * harness: the listener bus must be drained before reading
  * accumulated stage metrics, or the last stages of a query are
  * attributed to the next one. Same technique as
  * [[org.apache.spark.sql.GraftSqlBridge]]; no Spark internals are
  * modified. */
object GraftSparkBridge {
  /** Block until all queued listener events have been delivered. */
  def flushListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
