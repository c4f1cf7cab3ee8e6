package graft

import graft.catalog.Catalogs
import graft.graph.GraphBuilder
import graft.learn.{LinkSplit, Propagate}
import graft.topology.EdgeKey
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: per-phase wall times inside the flat scalar propagation
  * that dominates q28 (mirrors [[graft.learn.Propagate.meanRoundsFlat]]'s
  * dim=1 path step by step). Not part of the driver contract. */
object PropProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job/task accounting: wall >> task-time means scheduler/planning overhead
    if (sys.env.contains("PROP_JOB_STACKS")) {
      // sample the main thread: what is it doing during "lazy" phases?
      val mainTh = Thread.currentThread()
      new Thread(() => {
        while (true) {
          Thread.sleep(100)
          val fr = mainTh.getStackTrace
          val interesting = fr.filter(f =>
            f.getClassName.startsWith("graft") ||
            f.getClassName.contains("DAGScheduler") ||
            f.getClassName.contains("Canonicalize") ||
            f.getClassName.contains("QueryExecution") ||
            f.getClassName.contains("RuleExecutor") ||
            f.getClassName.contains("CacheManager"))
          if (interesting.nonEmpty)
            println("  TRACE " + interesting.take(4).mkString(" <- "))
        }
      }) { setDaemon(true) }.start()
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    val stageTime = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("PROP_JOB_NAMES")) {
          val cs = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.root.id")))
          val nt = j.stageInfos.map(_.numTasks).sum
          println("  JOB rootExec=" + cs.getOrElse("?") + " stages=" +
            j.stageInfos.size + " tasks=" + nt + " " +
            j.stageInfos.map(_.name).headOption.getOrElse("?"))
        }
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
          stageTime.merge(t.stageId, ("", t.taskMetrics.executorRunTime, 1),
            (a, b) => (a._1, a._2 + b._2, a._3 + b._3))
        }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stageTime.merge(s.stageInfo.stageId, (s.stageInfo.name, 0L, 0),
          (a, b) => (b._1, a._2, a._3))
    })
    def time[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val n0 = taskNanos.get()
      val t0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let the async listener bus drain (dev probe only)
      println(f"PROP $label $wall%.2f s  jobs=${jobs.get() - j0} taskTime=${(taskNanos.get() - n0) / 1e9}%.2f s")
      import scala.jdk.CollectionConverters._
      val hot = stageTime.asScala.toSeq.sortBy(-_._2._2).take(4)
        .filter(_._2._2 > 500)
      hot.foreach { case (id, (nm, ms, nt)) =>
        println(f"  stage $id $nm tasks=$nt time=${ms / 1e3}%.1f s") }
      stageTime.clear()
      r
    }

    // q46 layout A/B (PROP_AB=1): per-type vs flat fused fixed-point
    // attention over q46's EXACT graph/init/rounds, warm session, with
    // the propagation memo cleared before every call so each rep times
    // the real work (bit-identical results per LearnSpec — this is a
    // pure dispatch measurement). Rep 1 additionally pays the graph
    // mapping cache fill; judge on reps 2+.
    if (sys.env.contains("PROP_AB")) {
      implicit val sp: SparkSession = spark
      import org.apache.spark.sql.DataFrame
      val g = GraphBuilder.build(Catalogs.tpch, n => Tables.load(spark, sfDir, n),
          probeDense = true)
        .withReverseEdges
        .restrictTo(Set("customer", "nation"), hops = 1)
        .addDegree
      val init = Propagate.degreeInitFixedStructural(g, scale = 1000L)
      def act(emb: Map[String, DataFrame]): Unit =
        emb("customer").select(lit("customer").as("node_type"), col("id"), col("h"))
          .unionByName(emb("nation")
            .select(lit("nation").as("node_type"), col("id"), col("h")))
          .write.format("noop").mode("overwrite").save()
      for (r <- 1 to 5) {
        graft.functions.Memos.clear(spark)
        time(s"per-type rep$r")(
          act(Propagate.attentionRoundsFixed(g, init, rounds = 1)))
        graft.functions.Memos.clear(spark)
        time(s"flat     rep$r")(
          act(Propagate.attentionRoundsFixedFlat(g, init, rounds = 1)))
        // the memo key canonicalises every edge/init plan — in-bench the
        // frames are fresh objects per query, so this driver cost is paid
        // inside the timed window; measure it on a FRESH build
        val g2 = GraphBuilder.build(Catalogs.tpch,
            n => Tables.load(spark, sfDir, n), probeDense = true)
          .withReverseEdges
          .restrictTo(Set("customer", "nation"), hops = 1)
          .addDegree
        val i2 = Propagate.degreeInitFixedStructural(g2, scale = 1000L)
        time(s"memokey  rep$r") {
          g2.edges.foreach(_._2.queryExecution.analyzed.canonicalized)
          i2.foreach(_._2.queryExecution.analyzed.canonicalized)
        }
      }
      spark.stop()
      return
    }

    // bucketed-store propagation A/B (BKT_AB=1): q29's unbucketed flat
    // propagation vs the per-type loop over a bucketed-store reload, at
    // equal rounds — the "does the exchange-free |E|-side join pay for
    // itself at runtime" question. The save is untimed (a store is
    // written once, read many); the LOAD is timed separately. Before
    // every leg the session memos + cache are cleared and the graph
    // build's eager probes re-run UNTIMED, mirroring the bench, where
    // alphabetically-earlier queries pay the probe fill.
    if (sys.env.contains("BKT_AB")) {
      implicit val sp: SparkSession = spark
      import org.apache.spark.sql.DataFrame
      import graft.graph.HeteroGraph
      def builtGraph() = GraphBuilder.build(Catalogs.tpch,
          n => Tables.load(spark, sfDir, n), probeDense = true)
        .withReverseEdges
        .restrictTo(Set("customer", "orders"), hops = 1)
        .addDegree
      def act(emb: Map[String, DataFrame]): Unit =
        emb("customer").select(lit("customer").as("node_type"), col("id"), col("h"))
          .unionByName(emb("orders")
            .select(lit("orders").as("node_type"), col("id"), col("h")))
          .write.format("noop").mode("overwrite").save()
      val prefix = "bktab"
      builtGraph().saveBucketed(prefix, buckets = 32) // untimed, once
      def reset(): Unit = {
        graft.functions.Memos.clear(spark)
        spark.catalog.clearCache()
        builtGraph() // eager probes re-fill untimed
      }
      for (r <- 1 to 4; rounds <- Seq(2, 4)) {
        reset()
        locally {
          val g = builtGraph()
          time(s"unbkt flat   ${rounds}r rep$r")(act(
            Propagate.meanRoundsFixedFlat(g, Propagate.degreeInitFixedStructural(g), rounds)))
        }
        // same algorithm as the bucketed leg (isolates the STORE's
        // contribution; the flat fusion is orthogonal and unavailable over
        // buckets — the tagged union destroys the bucket partitioning)
        reset()
        locally {
          val g = builtGraph()
          time(s"unbkt pertype F ${rounds}r rep$r")(act(
            Propagate.meanRoundsFixed(g, Propagate.degreeInitFixedStructural(g), rounds,
              checkpoint = false)))
        }
        reset()
        locally {
          val gb = time(s"bkt load      rep$r")(HeteroGraph.loadBucketed(spark, prefix))
          time(s"bkt pertype F ${rounds}r rep$r")(act(
            Propagate.meanRoundsFixed(gb, Propagate.degreeInitFixedStructural(gb), rounds,
              checkpoint = false)))
        }
        reset()
        locally {
          val gb = HeteroGraph.loadBucketed(spark, prefix)
          time(s"bkt pertype T ${rounds}r rep$r")(act(
            Propagate.meanRoundsFixed(gb, Propagate.degreeInitFixedStructural(gb), rounds,
              checkpoint = true)))
        }
      }
      spark.stop()
      return
    }

    // fused-vs-HOF combine micro-measure (PROP_COMBINE=1): the dim>1 round
    // update `(vec[i]+msg[i])/(1+n_types)` as codegen VecCombine vs the
    // interpreted zip_with lambda, over 2M rows × dim 64.
    if (sys.env.contains("PROP_COMBINE")) {
      import graft.functions.ArrayOps
      val dim = 64
      val base = spark.range(2L * 1000 * 1000).select(
        expr(s"transform(sequence(1, $dim), i -> cast(id * i as double))").as("vec"),
        expr(s"transform(sequence(1, $dim), i -> cast(id + i as double))").as("msg"),
        (col("id") % 3 + 1).as("n_types"))
        .localCheckpoint(eager = true)
      for (r <- 1 to 3) {
        time(s"combine fused rep$r")(
          base.select(ArrayOps.combineMean(col("vec"), col("msg"), col("n_types")))
            .write.format("noop").mode("overwrite").save())
        time(s"combine HOF   rep$r")(
          base.select(ArrayOps.combineMeanHof(col("vec"), col("msg"), col("n_types")))
            .write.format("noop").mode("overwrite").save())
      }
      spark.stop()
      return
    }

    for (rep <- 1 to 2) {
      println(s"== rep $rep")
      implicit val sp: SparkSession = spark
      val g0 = time("graph build")(
        GraphBuilder.build(Catalogs.tpch, n => Tables.load(spark, sfDir, n),
          probeDense = true).addDegree.withReverseEdges.withSelfLoops)
      val target = graft.topology.Topology.classify(Catalogs.tpch).edges
        .find(e => e.srcTable == "orders" && e.dstTable == "customer")
        .map(e => EdgeKey(e.srcTable, e.relation, e.dstTable)).get
      val split = time("split")(LinkSplit.split(g0, target, 0.15, 42L))
      // mirrors TrainLR.train: NOT cached — the flat layout consumes each
      // frame exactly once
      val msg = time("restrict")(
        split.messageGraph.restrictTo(Set(target.src, target.dst), 2))
      val init = Propagate.degreeInit(msg)
      val types = init.keys.toSeq.sorted
      println(s"PROP types=${types.mkString(",")} edgeTypes=${msg.edges.size} hints=${msg.sizeHints.size}")

      val sizes = time("flatSizes")(types.map(t => t -> msg.idSpaceSize(t)))
      val offsets = sizes.scanLeft(("", 0L)) {
        case ((_, acc), (t, n)) => (t, acc + n)
      }.sliding(2).map { case Seq((_, off), (t, _)) => t -> off }.toMap

      val flatEdges0 = msg.edges.toSeq
        .filter { case (k, _) => offsets.contains(k.src) && offsets.contains(k.dst) }
        .sortBy(_._1.name)
        .zipWithIndex.map { case ((k, df), tag) =>
          df.select(
            (col("src") + offsets(k.src)).as("src"),
            (col("dst") + offsets(k.dst)).as("dst"),
            lit(tag).as("tag"))
        }
        .reduce(_ unionByName _)
      val flatEdgesCk = time("edge union ckpt")(flatEdges0.coalesce(32).localCheckpoint())

      var h = time("init union")(types.map { t =>
        init(t).select((col("id") + offsets(t)).as("gid"),
          element_at(col("vec"), 1).as("h"))
      }.reduce(_ unionByName _).coalesce(32).localCheckpoint())

      for (r <- 1 to 2) {
        h = time(s"round $r") {
          val perTypeMean = flatEdgesCk
            .join(h.select(col("gid").as("src"), col("h")), Seq("src"))
            .groupBy(col("dst"), col("tag"))
            .agg((sum(col("h")) / count(lit(1))).as("msg"))
          val msgs = perTypeMean
            .groupBy(col("dst").as("gid"))
            .agg(sum(col("msg")).as("msg_sum"), count(lit(1)).as("n_types"))
          h.join(msgs, Seq("gid"), "left")
            .select(col("gid"),
              when(col("msg_sum").isNull, col("h"))
                .otherwise((col("h") + col("msg_sum")) / (lit(1) + col("n_types")))
                .as("h"))
            .localCheckpoint()
        }
      }
      time("final count")(println("rows=" + h.count()))
    }
    spark.stop()
  }
}
