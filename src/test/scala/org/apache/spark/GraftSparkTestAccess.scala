package org.apache.spark

/** Test-only bridge into package-private Spark internals: counts live
  * broadcast blocks in the local block manager so lifecycle specs can assert
  * that the round loop does not accumulate bloom broadcasts. */
object GraftSparkTestAccess {
  def broadcastBlockCount(sc: SparkContext): Int =
    sc.env.blockManager.getMatchingBlockIds(_.isBroadcast).size

  /** Drain the listener bus so SparkListener-based job counters are exact. */
  def waitListenerBusEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
