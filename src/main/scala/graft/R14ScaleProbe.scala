package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (SCALE_r14.md, r13 verdict Next #3/#6): the two curves the
  * r13 board still owed measurements for.
  *
  *  - SEMANTIC STORE ≫ BATCH (q142 headline): the per-batch in-cluster
  *    prior-count join cost as the accumulated ITEM store grows to
  *    K = 1/10/50× while the new batch stays constant. Stores are
  *    pre-seeded with K cid-perturbed replicas of the assigned corpus
  *    (`cid + k·10⁵` — replicas share no cluster ids with the live batch
  *    or each other, so in-cluster candidate volume stays constant and
  *    the measurement isolates exactly the claimed exchange; the live
  *    batch's new × new pairs are the constant control). Three variants
  *    per K, mirroring SCALE_r13 §1:
  *      plain      — parquet store; the join re-shuffles ALL store rows
  *                   (each carrying a dim-64 vector) on `cid`
  *      bucketed   — catalog table bucketed on `cid`, one append per
  *                   replica (multi-file buckets)
  *      compacted  — after [[graft.streaming.EmbIngest.compactBucketed]]
  *                   (one file per bucket)
  *    Expect: plain's shuffle bytes grow with K (the O(|store|)
  *    exchange, heavier per row than the signature path — the vector
  *    rides the wire), bucketed/compacted stay batch-constant.
  *  - FOLD COST (q137/q141's maintenance pass): what
  *    [[graft.streaming.StoreCompact.foldBucketedTable]] itself costs as
  *    the table grows K×, decomposed into its two exchanges — the
  *    latest-wins window's `doc_id` hash exchange (moves the whole
  *    ≤upToBatch slice: K-linear by construction) and the bucket-layout
  *    `repartition` (moves only the fold's OUTPUT: K-linear when
  *    nothing supersedes, batch-constant once the eviction horizon
  *    bounds retention — both legs measured, eviction off then on).
  *    The decomposition runs the window+distinct alone to a noop sink,
  *    then the full fold; the difference prices the rebuild exchange.
  *
  * Not part of the driver contract. Usage: `runMain graft.R14ScaleProbe`
  * (env: SPARK_GRAFT_SF_DIR / _CPUS; CASE=semstore|foldcost). */
object R14ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("CASE")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = spark.sessionState.conf.numShufflePartitions
    val off = 1L << 24

    // shuffle BYTES are the scale-transferable number (SCALE_r13 §1's
    // lesson): a local[32] shuffle runs at memory speed, so wall alone
    // hides the exchange; on a cluster it crosses the network
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            shuffleBytes.addAndGet(
              t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    /** (result, wall sec, shuffle MB written during `f`). */
    def timedSh[A](f: => A): (A, Double, Double) = {
      Thread.sleep(300) // drain the async listener bus (dev probe only)
      shuffleBytes.set(0L)
      val (a, t) = timed(f)
      Thread.sleep(300)
      (a, t, shuffleBytes.get() / 1e6)
    }

    // per-case session confs are snapshot/restored around each block: a
    // full (no-CASE) run must measure every section under the SAME
    // planner settings as a standalone run (r14 ADVICE — semstore's
    // broadcast kill and cumsum's AQE-coalesce kill leaked forward)
    def withConf[A](kvs: (String, String)*)(body: => A): A = {
      val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    if (only.forall(_ == "semstore")) withConf(
      // same framing as SCALE_r13 §1: micro-batches at 100 TB/day rates
      // are not broadcastable; with auto-broadcast on, Catalyst
      // broadcasts the fixture batch and every variant degenerates
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      println("== q142 in-cluster join: item store grows K×, batch constant ==")
      val emb = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
      val cents = graft.ext.Similarity.kmeansFixedCentroids(
        emb, "vec_id", "embedding", nCentroids = 16, iters = 3, seed = 42L)
      val tau = 300000000000L
      // the live batch, assigned once — constant across K
      val assigned = graft.ext.Similarity
        .assignFixed(emb, "vec_id", "embedding", cents)
        .select(col("id"), col("cid"), col("w"))
        .localCheckpoint(eager = true)
      // one store replica: same row count/shape/vector payload,
      // DISJOINT cluster ids (no in-cluster pairs against the batch)
      def replica(k: Int): DataFrame = assigned.select(
        (col("id") + k * off).as("vec_id"),
        (col("cid") + (k + 1) * 100000L).as("cid"), col("w"))
      val liveBatch = 1000000L

      for (k <- Seq(1, 10, 50)) {
        val seed = (0 until k).map(replica).reduce(_ unionByName _)
          .coalesce(parts)
        val store = java.nio.file.Files
          .createTempDirectory(s"r14sem$k").toString
        seed.withColumn("batch_id", expr(s"(vec_id div $off) - 1"))
          .write.partitionBy("batch_id")
          .mode("overwrite").parquet(s"$store/items")
        val tbl = s"r14probe_items_k$k"
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        (0 until k).foreach { i =>
          graft.streaming.StoreCompact.appendToBucketedIndex(spark, tbl,
            replica(i).withColumn("batch_id", lit(i.toLong)),
            buckets = 32, bucketCols = Seq("cid"))
        }
        val nStore = spark.read.parquet(s"$store/items").count()

        def countsPlain(): Long = {
          val prior = spark.read.parquet(s"$store/items")
            .filter(col("batch_id") =!= liveBatch)
            .select(col("vec_id").as("id"), col("cid"), col("w"))
          val all = prior.unionByName(assigned)
          assigned.as("b").join(all.as("a"),
              col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
            .filter(graft.functions.ArrayOps.dot(col("a.w"), col("b.w"))
              > lit(tau))
            .groupBy(col("b.id")).agg(count(lit(1))).count()
        }
        def countsBucketed(): Long = graft.streaming.EmbIngest
          .bucketedPriorCounts(spark, tbl, assigned, tau, batchId = liveBatch)
          .count()

        for (rep <- 1 to 3) {
          val (nP, tP, shP) = timedSh(countsPlain())
          val (nB, tB, shB) = timedSh(countsBucketed())
          println(f"R14SCALE semstore K=$k rep=$rep store_rows=$nStore%,d " +
            f"plain=$tP%.2f s/$shP%.1f MB " +
            f"bucketed_multifile=$tB%.2f s/$shB%.1f MB " +
            f"(counted plain=$nP%,d bucketed=$nB%,d)")
        }
        val (_, tc, shc) = timedSh(graft.streaming.EmbIngest.compactBucketed(
          spark, tbl, upToBatch = (k - 1).toLong, buckets = 32))
        for (rep <- 1 to 3) {
          val (nC, tC, shC) = timedSh(countsBucketed())
          println(f"R14SCALE semstore K=$k rep=$rep " +
            f"bucketed_compacted=$tC%.2f s/$shC%.1f MB " +
            f"(fold itself $tc%.2f s/$shc%.1f MB, counted=$nC%,d)")
        }
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        scala.reflect.io.Directory(new java.io.File(store)).deleteRecursively()
      }
    }

    if (only.forall(_ == "cumsum")) withConf(
      // fixture-scale regime flip (the q125/SCALE_r13 trap class): the
      // kernel's range exchange carries ~KB-scale partitions here, so
      // AQE COALESCES them toward one — max-task parity with the global
      // window is the coalescer working as designed at tiny bytes, not
      // the plan shape. Disable coalescing so the probe measures the
      // shape that holds when partitions carry real data.
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      println("== budgetSelect cumsum: runningSum kernel vs global window ==")
      // the q145/q148 claim: a budgeted admission needs a GLOBAL
      // ordered running total, and the textbook window funnels every
      // row through ONE task; the runningSum kernel (range partition +
      // broadcast offsets) spreads it. At fixture scale both walls are
      // small — the transferable number is the MAX-TASK share (the
      // naive window's single task does all the work) alongside wall.
      import org.apache.spark.sql.expressions.Window
      val maxTask = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (t.taskInfo != null)
              maxTask.getAndUpdate(m => math.max(m, t.taskInfo.duration))
        })
      val docsBase = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      def replica(i: Int): DataFrame = docsBase.select(
        (col("doc_id") + i * off).as("doc_id"), col("text"))
      for (k <- Seq(1, 10, 50)) {
        val docs = (0 until k).map(replica).reduce(_ unionByName _)
          .coalesce(parts).localCheckpoint(eager = true)
        val s = docs
          .select(col("doc_id"),
            regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
              .as("__ts"))
          .select(col("doc_id"),
            size(col("__ts")).cast("long").as("n_tok"),
            expr("""CASE WHEN size(__ts) = 0 THEN CAST(0 AS BIGINT)
              |ELSE CAST(size(array_distinct(__ts)) AS BIGINT) * 1000000
              |  div CAST(size(__ts) AS BIGINT) END""".stripMargin)
              .as("ttr_fp"))
          .localCheckpoint(eager = true)
        // both paths get the SAME pre-tokenised checkpointed input, so
        // the measurement isolates the cumulative-sum plan alone: the
        // naive variant is budgetSelect with its kernel swapped for the
        // textbook global window over identical columns
        def naive(): Long =
          s.withColumn("cum_tok", sum("n_tok").over(
              Window.orderBy(col("ttr_fp").desc, col("doc_id").asc)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .agg(max("cum_tok")).head().getLong(0)
        def kernel(): Long =
          graft.ext.Selection.runningSumForProbe(s, "n_tok", "cum_tok")
            .agg(max("cum_tok")).head().getLong(0)
        // onTaskEnd delivery is async on the listener bus (r14 ADVICE):
        // drain before reading maxTask — the headline number of this
        // case — exactly as timedSh does for shuffleBytes
        def timedMax(f: => Long): (Long, Double, Long) = {
          maxTask.set(0L)
          val (a, t) = timed(f)
          Thread.sleep(300)
          (a, t, maxTask.get())
        }
        val nRows = docs.count()
        for (rep <- 1 to 3) {
          val (nN, tN, mN) = timedMax(naive())
          val (nK, tK, mK) = timedMax(kernel())
          println(f"R14SCALE cumsum K=$k rep=$rep rows=$nRows%,d " +
            f"window=$tN%.2f s (max task $mN ms) " +
            f"kernel=$tK%.2f s (max task $mK ms) " +
            f"(totals agree: ${nN == nK})")
        }
      }
    }

    if (only.forall(_ == "foldcost")) {
      println("== foldBucketedTable cost: table grows K×, two exchanges ==")
      val docsBase = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val sigs = graft.ext.Dedup.signatures(docsBase, "doc_id", "text")
        .select(col("doc_id"), col("band"), col("key"))
        .localCheckpoint(eager = true)
      def replica(k: Int): DataFrame = sigs.select(
        (col("doc_id") + k * off).as("doc_id"), col("band"),
        xxhash64(col("key"), lit(k)).as("key"))

      for (k <- Seq(1, 10, 50)) {
        def seedTable(tbl: String): Unit = {
          spark.sql(s"DROP TABLE IF EXISTS $tbl")
          (0 until k).foreach { i =>
            graft.streaming.StoreCompact.appendToBucketedIndex(spark, tbl,
              replica(i).withColumn("batch_id", lit(i.toLong)),
              buckets = 32, bucketCols = Seq("band", "key"))
          }
        }
        val tbl = s"r14probe_fold_k$k"
        // (a) the latest-wins window + distinct alone, to a noop sink —
        // prices the doc_id hash exchange over the whole ≤upTo slice
        seedTable(tbl)
        val upTo = (k - 1).toLong
        val (_, tW, shW) = timedSh(
          graft.streaming.StoreCompact
            .latestWinsPerKey("doc_id")(
              spark.table(tbl).filter(col("batch_id") <= upTo))
            .distinct()
            .write.format("noop").mode("overwrite").save())
        // (b) the full fold, eviction OFF (nothing supersedes in this
        // seeding, so the rebuild repartition moves all K replicas)
        val (_, tF, shF) = timedSh(graft.streaming.DocIngest
          .compactBucketed(spark, tbl, upToBatch = upTo, buckets = 32))
        val rowsF = spark.table(tbl).count()
        // (c) re-seed and fold with the eviction horizon keeping only
        // the newest replica — the steady-state rebuild is batch-bounded
        seedTable(tbl)
        val (_, tE, shE) = timedSh(graft.streaming.DocIngest
          .compactBucketed(spark, tbl, upToBatch = upTo,
            evictBelow = upTo, buckets = 32))
        val rowsE = spark.table(tbl).count()
        println(f"R14SCALE foldcost K=$k window_only=$tW%.2f s/$shW%.1f MB " +
          f"fold_noevict=$tF%.2f s/$shF%.1f MB ($rowsF%,d rows) " +
          f"fold_evict=$tE%.2f s/$shE%.1f MB ($rowsE%,d rows) " +
          f"rebuild_exchange≈${shF - shW}%.1f MB")
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
      }
    }

    spark.stop()
  }
}
