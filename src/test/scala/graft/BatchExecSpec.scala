package graft

import graft.streaming.BatchExec

/** Focused spec for the r18 per-batch execution helpers: the AQE
  * re-enable toggle must restore the previous conf value on every exit
  * path (the streaming engine relies on reading it DISABLED between
  * micro-batches), and the parallel-leg runner must await every leg and
  * surface a failure (a half-written batch must fail loudly so the
  * stream replays it — the families' at-least-once contract). */
class BatchExecSpec extends SparkSpec {

  private val Key = "spark.sql.adaptive.enabled"

  test("aqeOn enables for the body and restores a disabled conf") {
    spark.conf.set(Key, "false")
    try {
      var seen: String = null
      BatchExec.aqeOn(spark) { seen = spark.conf.get(Key) }
      assert(seen == "true")
      assert(spark.conf.get(Key) == "false")
    } finally spark.conf.set(Key, "true")
  }

  test("aqeOn restores a disabled conf when the body throws") {
    spark.conf.set(Key, "false")
    try {
      intercept[RuntimeException] {
        BatchExec.aqeOn(spark) { throw new RuntimeException("boom") }
      }
      assert(spark.conf.get(Key) == "false")
    } finally spark.conf.set(Key, "true")
  }

  test("aqeOn is a no-op re-entrant wrapper when AQE is already on") {
    spark.conf.set(Key, "true")
    BatchExec.aqeOn(spark) {
      // nested wrap (the CurationIngest → ImageIngest shape) must not
      // flip the conf off on inner exit
      BatchExec.aqeOn(spark) { assert(spark.conf.get(Key) == "true") }
      assert(spark.conf.get(Key) == "true")
    }
    assert(spark.conf.get(Key) == "true")
  }

  test("par runs every leg and rethrows the first failure after all") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      BatchExec.par(
        () => { ran.incrementAndGet(); () },
        () => throw new IllegalStateException("leg 2 failed"),
        () => { Thread.sleep(50); ran.incrementAndGet(); () })
    }
    assert(e.getMessage == "leg 2 failed")
    // both non-failing legs completed even though one leg threw — par
    // awaits ALL legs before surfacing the failure (no stray in-flight
    // writes behind a failed batch)
    assert(ran.get() == 2)
  }

  test("par runs concurrent Spark actions to completion") {
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    BatchExec.par(
      () => counts.add(spark.range(1000).count()),
      () => counts.add(spark.range(2000).count()))
    assert(counts.size == 2 && counts.contains(1000L) && counts.contains(2000L))
  }
}
