package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.SparkListenerApplicationEnd

import scala.jdk.CollectionConverters._

/** Test-only accessor for the `private[spark]` listener bus, so MemosSpec
  * can exercise the `onApplicationEnd` eviction path WITHOUT stopping the
  * suite-shared SparkContext (local mode allows one context per JVM —
  * a literal two-context stop/start would tear down every other suite's
  * session). Posting the real `SparkListenerApplicationEnd` event through
  * the real bus drives the exact listener Memos registered; only the
  * context teardown itself is elided.
  *
  * Known blast radius (accepted, given the one-context-per-JVM
  * constraint): the fake ApplicationEnd reaches EVERY listener on the
  * shared context, not just the session under test — other concurrently
  * running suites' Memos eviction listeners fire too (their memoised
  * tables/preps drop and silently recompute on next touch), and Spark's
  * internal listeners also observe the event. Harmless for correctness
  * (memos are caches), but suites must never assert on cross-suite memo
  * state; MemosSpec's assertions are deliberately local to its own
  * freshly-registered entries. */
object TestListenerBus {

  /** Fire ApplicationEnd through the live bus and wait for delivery. */
  def postApplicationEnd(sc: SparkContext): Unit = {
    sc.listenerBus.post(
      SparkListenerApplicationEnd(java.lang.System.currentTimeMillis()))
    sc.listenerBus.waitUntilEmpty()
  }

  /** How many registered listeners belong to `ownerClassPrefix` (e.g. the
    * anonymous eviction listener class `graft.functions.Memos$$anon…`). */
  def countListeners(sc: SparkContext, ownerClassPrefix: String): Int =
    sc.listenerBus.listeners.asScala
      .count(_.getClass.getName.startsWith(ownerClassPrefix))
}
