package graft

/** Dev harness: parallelism audit for named SparkEntry queries. For each
  * query, reports wall, summed task time, and the LONGEST single task —
  * `maxTask ≈ wall` with `taskTime ≈ maxTask` is the signature of a
  * stage running on one thread (the q89 serial-verify shape FUZZ_AB_r8.md
  * fixed); `taskTime ≫ wall` is healthy width. Memos cleared per query so
  * first-touch cost is attributed like a Bench pass.
  *
  * Usage: `runMain graft.ParProbe q44_dedup_jaccard q36_dedup_simhash …`
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS). */
object ParProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    val maxTaskNanos = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          val ns = t.taskMetrics.executorRunTime * 1000000L
          taskNanos.addAndGet(ns)
          maxTaskNanos.updateAndGet(m => math.max(m, ns))
        }
    })
    for (name <- args; r <- 1 to reps) {
      graft.functions.Memos.clear(spark)
      spark.catalog.clearCache()
      Thread.sleep(300)
      taskNanos.set(0); maxTaskNanos.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain the async listener bus (dev probe only)
      println(f"PARPROBE $name rep$r wall=$wall%.2f s " +
        f"taskTime=${taskNanos.get() / 1e9}%.2f s " +
        f"maxTask=${maxTaskNanos.get() / 1e9}%.2f s " +
        f"serialFrac=${maxTaskNanos.get() / 1e9 / wall}%.2f")
    }
    spark.stop()
  }
}
