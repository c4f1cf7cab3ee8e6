package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** r18 optimization measurement harness (guide §1: measure first):
  * run one or more SparkEntry queries with a listener that records every
  * Spark JOB — wall, task count, first stage name — so a lifecycle
  * query's wall can be attributed to its constituent jobs instead of
  * guessed at from phase totals. Usage:
  * {{{ runMain graft.JobProbe q173_stream_curation }}}
  * Honours SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like [[Bench]]. Prints
  * one line per job (ordered by start) and a per-query summary: total
  * job wall vs query wall (the difference is driver/scheduler gap time
  * between jobs — commit protocol, catalog ops, checkpoint writes).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, t0: Long, var t1: Long = 0L,
                   var stages: Int = 0, var tasks: Int = 0,
                   desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, Job(js.jobId, System.nanoTime(), desc = d))
        order.add(js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.t1 = System.nanoTime()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // session warm-up (untimed, mirrors Bench)
    try {
      spark.range(1L << 20).selectExpr("sum(id * 2) AS s")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    for (name <- args) {
      jobs.clear(); order.clear()
      graft.functions.Memos.clear(spark)
      spark.catalog.clearCache()
      graft.functions.Phases.drain()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — let it drain
      Thread.sleep(500)
      var sumJob = 0.0
      val it = order.iterator()
      println(s"== $name: jobs in start order ==")
      var idx = 0
      while (it.hasNext) {
        val j = jobs.get(it.next())
        if (j != null && j.t1 > 0) {
          val sec = (j.t1 - j.t0) / 1e9
          sumJob += sec
          println(f"  job[$idx%3d] ${sec}%8.3f s  ${j.desc.take(100)}")
        }
        idx += 1
      }
      val phases = graft.functions.Phases.drain()
        .map { case (l, s) => f"$l=$s%.2f" }.mkString(", ")
      println(f"== $name wall=$wall%.2f s, sum(job walls)=$sumJob%.2f s, " +
        f"gap=${wall - sumJob}%.2f s (driver/scheduler/commit), " +
        f"njobs=$idx ==")
      if (phases.nonEmpty) println(s"   phases: $phases")
    }
    spark.stop()
  }
}
