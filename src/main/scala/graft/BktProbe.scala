package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for q55 (dev-only; the BKT_AB_r8.md
  * evidence run). Splits the bucketed-store round trip into its real
  * phases — graph build materialisation, per-table CTAS save, catalog
  * load, and the 2-round propagate action — so the "attack q55" work
  * optimises the measured slice instead of the guessed one. Per-phase
  * job/task accounting (the PropProbe listener pattern): wall ≫ task
  * time means driver/scheduler overhead, not executor compute.
  *
  * Usage: `runMain graft.BktProbe [reps]` (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS). Each rep clears memos so the propagate pays its
  * real cost, like a Bench pass; the store is saved once (phase `save`)
  * and reloaded per rep (a store is written once, read many). */
object BktProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sp: SparkSession = spark

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
    })
    def time[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val n0 = taskNanos.get()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // drain the async listener bus (dev probe only)
      println(f"BKTPROBE $label $wall%.2f s jobs=${jobs.get() - j0} " +
        f"taskTime=${(taskNanos.get() - n0) / 1e9}%.2f s")
      r
    }

    def builtGraph() = graft.graph.GraphBuilder
      .build(graft.catalog.Catalogs.tpch,
        n => Tables.load(spark, sfDir, n), probeDense = true)
      .withReverseEdges
      .restrictTo(Set("customer", "orders"), hops = 1)

    def act(emb: Map[String, org.apache.spark.sql.DataFrame]): Unit =
      emb("customer")
        .select(lit("customer").as("node_type"), col("id"), col("h"))
        .unionByName(emb("orders")
          .select(lit("orders").as("node_type"), col("id"), col("h")))
        .write.format("noop").mode("overwrite").save()

    val prefix = "bktprobe"
    // drop leftovers so save pays the full path
    locally {
      val wh = new java.io.File(
        spark.sessionState.conf.warehousePath.stripPrefix("file:"))
      Option(wh.list()).getOrElse(Array.empty[String])
        .filter(n => n == s"${prefix}_meta" ||
          n.startsWith(s"${prefix}_n_") || n.startsWith(s"${prefix}_e_"))
        .foreach { n =>
          spark.sql(s"DROP TABLE IF EXISTS $n")
          scala.reflect.io.Directory(new java.io.File(wh, n)).deleteRecursively()
        }
    }
    locally {
      val g = time("build-def")(builtGraph())
      time("save")(g.saveBucketed(prefix,
        buckets = spark.sessionState.conf.numShufflePartitions))
    }

    for (rep <- 1 to reps) {
      println(s"BKTPROBE --- rep $rep ---")
      def reset() = {
        graft.functions.Memos.clear(spark)
        spark.catalog.clearCache()
        time("load")(graft.graph.HeteroGraph.loadBucketed(spark, prefix))
      }
      // A: the current q55 dispatch — per-type loop, no barriers
      locally {
        val loaded = reset()
        time("prop F (current)")(act(graft.learn.Propagate.meanRoundsFixed(
          loaded, graft.learn.Propagate.degreeInitFixedStructural(loaded),
          rounds = 2, checkpoint = false)))
      }
      // B: per-type loop, localCheckpoint barrier after round 1
      locally {
        val loaded = reset()
        time("prop T (ckpt)   ")(act(graft.learn.Propagate.meanRoundsFixed(
          loaded, graft.learn.Propagate.degreeInitFixedStructural(loaded),
          rounds = 2, checkpoint = true)))
      }
      // C: barrier the INIT frames only (≤|V|-row frames; the degree agg
      // over all edge types is the most-recomputed subplan), rounds free
      locally {
        val loaded = reset()
        val init0 = graft.learn.Propagate.degreeInitFixedStructural(loaded)
        val init = time("init barrier    ")(
          init0.map { case (t, d) => t -> d.localCheckpoint(eager = true) })
        time("prop F (initbar)")(act(graft.learn.Propagate.meanRoundsFixed(
          loaded, init, rounds = 2, checkpoint = false)))
      }
      // D: init barrier AND round-1 checkpoint
      locally {
        val loaded = reset()
        val init0 = graft.learn.Propagate.degreeInitFixedStructural(loaded)
        val init = time("init barrier    ")(
          init0.map { case (t, d) => t -> d.localCheckpoint(eager = true) })
        time("prop T (initbar)")(act(graft.learn.Propagate.meanRoundsFixed(
          loaded, init, rounds = 2, checkpoint = true)))
      }
    }
    spark.stop()
  }
}
