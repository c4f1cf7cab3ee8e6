package graft.functions

import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Session-scoped memo registry — the single home for every "pure function
  * of session-immutable inputs" cache in the engine (table loads, the
  * dense-PK probe, shingle prep, the exact-Jaccard pair set, k-means
  * centroids, fixed-point propagation results, the bucketed graph).
  *
  * Why central and why reference-keyed: the previous per-site `TrieMap`s
  * were JVM-global and keyed by `System.identityHashCode(sparkSession)`,
  * which could collide a dead session's hash with a live one's, serving
  * frames bound to a dead SparkContext. Keying by the session REFERENCE
  * makes collision impossible. Eviction, however, cannot ride on the
  * `WeakHashMap` alone: the memoised values are DataFrames, which strongly
  * reference their session — the map's own values keep its weak keys
  * reachable (the documented WeakHashMap pitfall). So lifetime is managed
  * explicitly: the first memo for a session registers an
  * `onApplicationEnd` listener that drops the session's entries when its
  * SparkContext stops (sibling sessions of one context die with the
  * context — a cloned session has no narrower stop event), releasing any
  * checkpoint blocks via the ContextCleaner. The weak keying remains as a
  * second line for sessions whose maps were cleared.
  *
  * [[clear]] drops one session's memos on demand — the bench uses it
  * between measurement passes so every pass pays first-touch costs
  * honestly instead of timing memo hits.
  */
object Memos {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, TrieMap[Any, Any]]()
  // sessions that already carry the eviction listener: clear() + re-memo
  // must NOT stack a fresh listener per cycle (the bench clears per pass)
  private val evictorInstalled =
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  private def mapFor(spark: SparkSession): TrieMap[Any, Any] =
    bySession.synchronized {
      var m = bySession.get(spark)
      if (m == null) {
        m = TrieMap.empty[Any, Any]
        bySession.put(spark, m)
        if (!evictorInstalled.containsKey(spark)) {
          evictorInstalled.put(spark, java.lang.Boolean.TRUE)
          // evict on context stop — see scaladoc; a dead context's listener
          // bus is gone: a failed registration means nothing to evict
          try spark.sparkContext.addSparkListener(
            new org.apache.spark.scheduler.SparkListener {
              override def onApplicationEnd(
                  end: org.apache.spark.scheduler.SparkListenerApplicationEnd)
                  : Unit = clear(spark)
            })
          catch { case _: IllegalStateException => }
        }
      }
      m
    }

  /** Memoise `value` under `key` for `spark`'s lifetime. `key` must embed
    * everything the value depends on EXCEPT the session (canonicalised
    * plans, parameters, an algorithm tag — see call sites); distinct call
    * sites must lead the key with a distinct site tag. Like
    * `TrieMap.getOrElseUpdate`, `value` may evaluate more than once under
    * a race; it must be pure. */
  def getOrElseUpdate[V](spark: SparkSession, key: Any)(value: => V): V =
    mapFor(spark).getOrElseUpdate(key, value).asInstanceOf[V]

  /** Whether `key` is already memoised for `spark` (never computes). */
  def contains(spark: SparkSession, key: Any): Boolean =
    bySession.synchronized { Option(bySession.get(spark)) }
      .exists(_.contains(key))

  /** Forget every memo held for `spark` (the entries become garbage; any
    * checkpoint blocks they pinned are released by the ContextCleaner once
    * the frames are collected). Safe concurrently with reads: in-flight
    * frames keep working, later lookups recompute. */
  def clear(spark: SparkSession): Unit =
    bySession.synchronized { bySession.remove(spark) }
}
