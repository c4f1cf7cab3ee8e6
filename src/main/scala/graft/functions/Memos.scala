package graft.functions

import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Session-scoped memo registry — the single home for every "pure function
  * of session-immutable inputs" cache in the engine (table loads, the
  * dense-PK probe, shingle prep, the exact-Jaccard pair set, k-means
  * centroids, fixed-point propagation results, the bucketed graph).
  *
  * Why central and why weak: the previous per-site `TrieMap`s were
  * JVM-global and keyed by `System.identityHashCode(sparkSession)`, which
  * (a) let entries — including eagerly-checkpointed DataFrames pinning
  * their RDD blocks — outlive a stopped session forever, and (b) could
  * collide a dead session's hash with a live one's, serving frames bound
  * to a dead SparkContext. Keying a `WeakHashMap` by the session REFERENCE
  * fixes both: entries are unreachable (and collectable, along with their
  * checkpoint RDDs via the ContextCleaner) as soon as the session is, and
  * reference identity cannot collide.
  *
  * [[clear]] drops one session's memos on demand — the bench uses it
  * between measurement passes so every pass pays first-touch costs
  * honestly instead of timing memo hits.
  */
object Memos {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, TrieMap[Any, Any]]()

  private def mapFor(spark: SparkSession): TrieMap[Any, Any] =
    bySession.synchronized {
      var m = bySession.get(spark)
      if (m == null) { m = TrieMap.empty[Any, Any]; bySession.put(spark, m) }
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

  /** Forget every memo held for `spark` (the entries become garbage; any
    * checkpoint blocks they pinned are released by the ContextCleaner once
    * the frames are collected). Safe concurrently with reads: in-flight
    * frames keep working, later lookups recompute. */
  def clear(spark: SparkSession): Unit =
    bySession.synchronized { bySession.remove(spark) }
}
