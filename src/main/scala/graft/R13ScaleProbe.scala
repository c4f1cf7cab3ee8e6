package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (SCALE_r13.md, r12 verdict Next #2/#6): the two curves the
  * r12 board still owed measurements for.
  *
  *  - STORE ≫ BATCH (q137 headline): the per-batch CANDIDATE JOIN cost
  *    as the accumulated signature store grows to K = 1/10/50× while the
  *    new batch stays constant. Stores are pre-seeded with K
  *    key-perturbed replicas of the corpus signatures (`xxhash64(key,k)`
  *    — replicas share no band keys with the live batch or each other,
  *    so candidate volume stays constant and the measurement isolates
  *    exactly the claimed exchange). Three variants per K:
  *      plain      — parquet store; the join re-shuffles ALL store keys
  *      bucketed   — catalog table, one append per replica (multi-file
  *                   buckets: exchange-free but re-sorted store side)
  *      compacted  — after [[graft.streaming.DocIngest.compactBucketed]]
  *                   (one file per bucket: exchange-free AND sort-free)
  *    Expect: plain grows with K (the O(|store|) exchange), bucketed
  *    grows only with the scan, compacted flattest.
  *  - QUALITY CLASSIFIER (q134/q135): fit and frozen-serving wall at
  *    K = 1/2/4 corpus copies. The L-BFGS treeAggregate payload is
  *    dim-64-constant, so the fit wall should track the tokenise scan,
  *    not the iteration count; serving is a pure projection.
  *
  * Not part of the driver contract. Usage: `runMain graft.R13ScaleProbe`
  * (env: SPARK_GRAFT_SF_DIR / _CPUS; CASE=storebatch|quality). */
object R13ScaleProbe {
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

    // Wall alone under-reports the claim at fixture scale: a local[32]
    // shuffle runs at memory speed, so the O(|store|) exchange and the
    // O(|store|) sort price the same. Shuffle BYTES are the
    // scale-transferable number — on a cluster the exchange crosses the
    // network, the bucketed scan does not.
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

    val docsBase = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    if (only.forall(_ == "storebatch")) {
      println("== q137 candidate join: store grows K×, batch constant ==")
      // 100 TB/day framing: micro-batches are NOT broadcastable (a
      // minute of stream is tens of GB), so the candidate join is a
      // shuffled join — the regime where the store side's exchange is
      // the cost. With auto-broadcast left on, Catalyst broadcasts the
      // fixture's tiny batch and ALL variants degenerate to scan-only.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the live batch's signatures — computed once, constant across K
      val sigs = graft.ext.Dedup.signatures(docsBase, "doc_id", "text")
        .localCheckpoint(eager = true)
      val newKeys = sigs.select(col("doc_id"), col("band"), col("key"))
        .localCheckpoint(eager = true)
      // one store replica: same row count/shape, disjoint band keys
      def replica(k: Int): DataFrame = sigs.select(
        (col("doc_id") + k * off).as("doc_id"), col("band"),
        xxhash64(col("key"), lit(k)).as("key"))
      val liveBatch = 1000000L // excluded id; store rows use 0..K-1

      for (k <- Seq(1, 10, 50)) {
        val seed = (0 until k).map(replica).reduce(_ unionByName _)
          .coalesce(parts)
        // plain parquet store layout (batch_id partitions)
        val store = java.nio.file.Files
          .createTempDirectory(s"r13store$k").toString
        seed.withColumn("batch_id", expr(s"doc_id div $off"))
          .write.partitionBy("batch_id")
          .mode("overwrite").parquet(s"$store/sigs")
        // bucketed table: one append per replica (per-batch file sets)
        val tbl = s"r13probe_sigs_k$k"
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        (0 until k).foreach { i =>
          val w = replica(i).withColumn("batch_id", lit(i.toLong))
            .write.bucketBy(32, "band", "key").sortBy("band", "key")
          if (spark.catalog.tableExists(tbl)) w.mode("append").saveAsTable(tbl)
          else w.mode("overwrite").saveAsTable(tbl)
        }
        val nStore = spark.read.parquet(s"$store/sigs").count()

        def candPlain(): Long = {
          val allKeys = spark.read.parquet(s"$store/sigs")
            .filter(col("batch_id") =!= liveBatch).drop("batch_id")
            .unionByName(newKeys)
          newKeys.as("x").join(allKeys.as("y"),
              col("x.band") === col("y.band") &&
                col("x.key") === col("y.key") &&
                col("x.doc_id") =!= col("y.doc_id"))
            .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
              greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
            .distinct().count()
        }
        def candBucketed(): Long =
          graft.streaming.DocIngest
            .bucketedCandidates(spark, tbl, newKeys, batchId = liveBatch)
            .count()

        for (rep <- 1 to 3) {
          val (nP, tP, shP) = timedSh(candPlain())
          val (nB, tB, shB) = timedSh(candBucketed())
          println(f"R13SCALE storebatch K=$k rep=$rep store_rows=$nStore%,d " +
            f"plain=$tP%.2f s/$shP%.1f MB " +
            f"bucketed_multifile=$tB%.2f s/$shB%.1f MB " +
            f"(cand plain=$nP%,d bucketed=$nB%,d)")
        }
        val (_, tc) = timed(graft.streaming.DocIngest.compactBucketed(
          spark, tbl, upToBatch = (k - 1).toLong, buckets = 32))
        for (rep <- 1 to 3) {
          val (nC, tC, shC) = timedSh(candBucketed())
          println(f"R13SCALE storebatch K=$k rep=$rep " +
            f"bucketed_compacted=$tC%.2f s/$shC%.1f MB " +
            f"(fold itself $tc%.2f s, cand=$nC%,d)")
        }
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        scala.reflect.io.Directory(new java.io.File(store)).deleteRecursively()
      }
    }

    if (only.forall(_ == "bktsort")) {
      println("== q55 propagation: bucket-sort exploitation A/B ==")
      // same entry, conf flipped at runtime (it is a runtime SQL conf);
      // alternating reps so ambient drift cannot masquerade as the delta
      for (rep <- 1 to 4; on <- Seq(false, true)) {
        spark.conf.set(
          "spark.sql.legacy.bucketedTableScan.outputOrdering", on.toString)
        graft.functions.Memos.clear(spark)
        spark.catalog.clearCache()
        val (_, t) = timed(
          SparkEntry.queries("q55_propagate_bucketed")(spark, sfDir)
            .write.format("noop").mode("overwrite").save())
        println(f"R13SCALE bktsort rep=$rep sortOrdering=$on wall=$t%.2f s")
      }
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    }

    if (only.forall(_ == "quality")) {
      println("== q134 fit / q135 serving: K corpus copies ==")
      def docCopy(i: Int): DataFrame =
        docsBase.select((col("doc_id") + i * off).as("doc_id"),
          (if (i == 0) col("text")
           else regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1zq$i"))
            .as("text"))
      // rep 1 of each cell is JIT/codegen-cold (the first probe run
      // measured fit=7.3 s at K=1 falling to 2.9 s at K=4 — pure
      // warm-up); report warm reps
      for (k <- Seq(1, 2, 4); rep <- 1 to 3) {
        val docs = (0 until k).map(docCopy).reduce(_ unionByName _)
          .coalesce(parts).localCheckpoint(eager = true)
        val n = docs.count()
        val (env, tFit) = timed(graft.ext.QualityClassifier
          .trainQuality(docs, "doc_id", "text").collect())
        val (fpSum, tServe) = timed(graft.ext.QualityClassifier
          .scoreFrozen(docs, "doc_id", "text")
          .agg(sum(col("quality_fp"))).head().getLong(0))
        println(f"R13SCALE quality K=$k rep=$rep docs=$n%,d fit=$tFit%.2f s " +
          f"serve=$tServe%.2f s (flags=${env.head.toSeq.drop(4).mkString(",")} " +
          f"fp_sum=$fpSum%,d)")
      }
    }

    spark.stop()
  }
}
