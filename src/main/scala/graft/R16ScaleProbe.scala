package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (SCALE_r16.md): the curves the r16 verdict brief asked
  * for.
  *
  *  - VIDEO NEAR-DUP (q159, [[graft.multimodal.VideoDedup]]): the only
  *    r15 dedup-quartet member whose candidate curve was
  *    prototype-measured, not probe-ledgered (r15 verdict Missing #3 /
  *    Next #5). Candidates come from (frame, block) 16-bit keys —
  *    collisions only inside the same frame-and-block slot, so the
  *    chance term is |clips|² · (4 · f̄) / 2¹⁶ / 2 with f̄ the mean
  *    sampled-frame count (2.5 on the motif fixture) — and the
  *    frame-count equality filter prunes cross-length pairs before the
  *    verify. Measured: pairs / wall / shuffle / max-task at
  *    K = 1/4/8 corpus replicas, the SCALE_r15 §4 table shape.
  *  - AUDIO INGEST STORE (q167, [[graft.streaming.AudioIngest]]): the
  *    fifth ingest family's O(|batch|)-exchange claim. The machinery IS
  *    [[graft.streaming.FpIngest]] — shared object code with the image
  *    family whose curve SCALE_r15 §6 measured — so this case is the
  *    transfer check: one fixed batch ingested against 1×/4×/8× stores,
  *    exchange bytes expected flat (the imgstore shape, audio
  *    fingerprints in front).
  *
  * Not part of the driver contract. Usage: `runMain graft.R16ScaleProbe`
  * (env: SPARK_GRAFT_SF_DIR / _CPUS; CASE=videodup|audstore). */
object R16ScaleProbe {
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

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val maxTask = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (t.taskMetrics != null)
            shuffleBytes.addAndGet(
              t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          if (t.taskInfo != null)
            maxTask.getAndUpdate(m => math.max(m, t.taskInfo.duration))
        }
      })
    /** (result, wall s, shuffle MB, max task ms) with listener drains. */
    def timedSh[A](f: => A): (A, Double, Double, Long) = {
      Thread.sleep(300)
      shuffleBytes.set(0L); maxTask.set(0L)
      val t0 = System.nanoTime()
      val a = f
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain the async listener bus (dev probe only)
      (a, t, shuffleBytes.get() / 1e6, maxTask.get())
    }

    val docsBase = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def replica(i: Int): DataFrame = docsBase.select(
      (col("doc_id") + i * off).as("doc_id"), col("text"))

    if (only.forall(_ == "videodup")) {
      println("== q159 video near-dup: candidate curve ==")
      implicit val sp: SparkSession = spark
      for (k <- Seq(1, 4, 8)) {
        val docs = (0 until k).map(replica).reduce(_ unionByName _)
          .select("doc_id").coalesce(parts).localCheckpoint(eager = true)
        val nDocs = docs.count()
        val payload = graft.multimodal.MediaSynth.withGifMotifPayload(
          docs, "doc_id")
        for (rep <- 1 to 3) {
          val (res, t, sh, mx) = timedSh(
            graft.multimodal.VideoDedup.nearDupVideo(
              payload, "doc_id", "payload").count())
          // (frame, block) slots: 4 blocks × mean 2.5 sampled frames
          val chance = nDocs.toDouble * nDocs * 4 * 2.5 / 65536 / 2
          println(f"R16SCALE videodup K=$k rep=$rep docs=$nDocs%,d " +
            f"pairs=$res%,d wall=$t%.2f s shuffle=$sh%.1f MB " +
            f"max_task=$mx ms (chance-collision term ≈ $chance%,.0f)")
        }
      }
    }

    if (only.forall(_ == "audstore")) {
      println("== q167 audio ingest: per-batch exchange vs store size ==")
      // replica 0 ids, NOT a fresh offset: the audio motif fingerprint
      // is full-entropy per id/3 group (mixSq2), so a disjoint-group
      // batch would pair with nothing and the probe would never drive
      // the verify tail — re-arriving ids pair against their two group
      // mates already in the store (the at-least-once re-delivery
      // shape), so pairs_out is live while the exchange stays O(|batch|)
      val newBatch = replica(0).filter(col("doc_id") % 10 === 0)
        .select("doc_id")
        .coalesce(parts).localCheckpoint(eager = true)
      val nNew = newBatch.count()
      for (k <- Seq(1, 4, 8)) {
        val tbl = s"graft_probe_audstore_$k"
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        val tmp = java.nio.file.Files
          .createTempDirectory(s"audstore$k").toString
        (0 until k).foreach { r =>
          graft.streaming.StoreCompact.appendToBucketedIndex(spark, tbl,
            graft.streaming.AudioIngest.fingerprints(
              replica(r).select("doc_id"))
              .withColumn("batch_id", lit(r.toLong)),
            buckets = parts, Seq("key"))
        }
        graft.streaming.AudioIngest.compact(spark, s"$tmp/store", tbl,
          upToBatch = (k - 1).toLong, buckets = parts)
        val storeRows = spark.table(tbl).count()
        // each rep re-ingests the same batch under a FRESH batch id, so
        // its keys append to the index (reps 2-3 measure a store
        // |rep·batch| keys larger than the labeled K) and its pairs land
        // in a new partition — pairs_cum is CUMULATIVE across reps, not
        // per-rep output (r16 ADVICE; the wall/shuffle columns are the
        // probe's signal and are per-rep as labeled)
        for (rep <- 1 to 3) {
          val (_, t, sh, mx) = timedSh {
            graft.streaming.AudioIngest.ingestBatchBucketed(newBatch,
              s"$tmp/store", tbl, maxHamming = 3,
              batchId = (k + rep).toLong, buckets = parts)
          }
          val pairsNow = graft.streaming.AudioIngest
            .pairs(spark, s"$tmp/store").count()
          println(f"R16SCALE audstore K=$k rep=$rep store_rows=$storeRows%,d " +
            f"batch=$nNew%,d pairs_cum=$pairsNow%,d wall=$t%.2f s " +
            f"shuffle=$sh%.1f MB max_task=$mx ms")
        }
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        val tp = java.nio.file.Paths.get(tmp)
        if (java.nio.file.Files.exists(tp))
          java.nio.file.Files.walk(tp)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }

    spark.stop()
  }
}
