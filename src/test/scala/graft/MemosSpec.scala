package graft

import graft.functions.Memos
import org.apache.spark.graft.TestListenerBus

/** Lifecycle contract of the session-scoped memo registry: the
  * `onApplicationEnd` eviction listener (the r5 leak fix) actually drops a
  * session's entries when its context ends, and `clear` + re-memo does not
  * stack a second listener per cycle. The ApplicationEnd event is posted
  * through the REAL listener bus (see [[TestListenerBus]]) because local
  * mode allows one SparkContext per JVM — stopping it would kill every
  * other suite's shared session. */
class MemosSpec extends SparkSpec {

  private val evictorPrefix = "graft.functions.Memos$$anon"

  test("clear + re-memo does not stack eviction listeners") {
    val s = spark.newSession()
    Memos.getOrElseUpdate(s, ("memos-spec", "stack", 1)) { 41 }
    val c1 = TestListenerBus.countListeners(s.sparkContext, evictorPrefix)
    assert(c1 >= 1, "first memo must register the eviction listener")
    Memos.clear(s)
    Memos.getOrElseUpdate(s, ("memos-spec", "stack", 2)) { 42 }
    val c2 = TestListenerBus.countListeners(s.sparkContext, evictorPrefix)
    assert(c2 == c1,
      s"re-memo after clear registered ${c2 - c1} extra listener(s)")
  }

  test("application end evicts the session's entries; re-memo recomputes") {
    val s = spark.newSession()
    var computes = 0
    def memo(): Int =
      Memos.getOrElseUpdate(s, ("memos-spec", "lifecycle")) {
        computes += 1; computes
      }
    assert(memo() == 1 && memo() == 1, "second call must hit the memo")
    assert(Memos.contains(s, ("memos-spec", "lifecycle")))

    TestListenerBus.postApplicationEnd(s.sparkContext)

    assert(!Memos.contains(s, ("memos-spec", "lifecycle")),
      "ApplicationEnd must drop the session's registry entry")
    assert(memo() == 2, "post-eviction lookup must recompute")
  }
}
