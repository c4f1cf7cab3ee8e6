package org.apache.spark

/** Test-only bridge into `SparkContext.listenerBus` (private[spark]):
  * deterministic drain of the async listener bus, replacing sleep-based
  * waits in specs that count scheduler events. */
object ListenerDrain {
  /** Block until every event posted so far has been delivered to all
    * registered listeners (or the timeout elapses, which fails the bus's
    * internal assertion). */
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
