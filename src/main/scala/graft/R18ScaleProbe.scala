package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (SCALE_r18.md): the streaming curation chain's two scale
  * claims (q173 family, [[graft.streaming.CurationIngest]]).
  *
  * VERDICT (CASE=verdict): the family's headline claim is that the keep
  * verdict is DERIVED state — assembled from the gate store and the two
  * pairs logs with NO re-decode and NO re-fingerprint, O(|docs|+|pairs|)
  * joins plus the bounded HashMin CC. Measured: verdict wall at
  * K = 1/4/8 replica stores, against the batch q164-style recompute
  * (gate + image dHash + audio fp + CC from scratch — the R17ScaleProbe
  * curation legs minus the pack tail) over the SAME corpus. Expected:
  * both corpus-linear-ish (the aliasing regime bends pair counts — see
  * FIXTURES.md "Motif-lattice aliasing"), with the incremental verdict a
  * constant factor below batch at every K because the decode/fingerprint
  * work is simply absent; shuffle = id-keyed joins, max-task bounded.
  *
  * INGEST (CASE=ingest): the composed per-batch body must stay
  * O(|batch|) against a growing store — it is three certified bodies
  * under one batch id (gate row-local write + the image and audio ingest
  * bodies whose store sides read bucketed tables with no exchange), so
  * composition must not introduce a store-size term. One fixed
  * re-delivery batch (replica-0 ids ≡ 0 mod 10, the audstore/vidstore
  * shape — re-arriving ids pair against their group mates so both
  * verify tails are live) ingested against 1×/4×/8× stores. Expected:
  * wall and shuffle flat across K (the candidate joins move O(|batch|)
  * keys; aliased twins add candidate-stage work only).
  *
  * Not part of the driver contract. Usage: `runMain graft.R18ScaleProbe`
  * (env: SPARK_GRAFT_SF_DIR / _CPUS; CASE=verdict|ingest). */
object R18ScaleProbe {
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
    implicit val sp: SparkSession = spark
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
      .select(col("doc_id"), col("text"), col("n_chars"))
    def replica(i: Int): DataFrame = docsBase.select(
      (col("doc_id") + i * off).as("doc_id"), col("text"), col("n_chars"))

    /** Build a K-replica curation store (one composed batch per
      * replica) under fresh table names; returns (storeDir, imgTbl,
      * audTbl, cleanup). */
    def buildStore(k: Int, tag: String): (String, String, String, () => Unit) = {
      val imgTbl = s"graft_probe_cur${tag}_img_$k"
      val audTbl = s"graft_probe_cur${tag}_aud_$k"
      spark.sql(s"DROP TABLE IF EXISTS $imgTbl")
      spark.sql(s"DROP TABLE IF EXISTS $audTbl")
      val tmp = java.nio.file.Files
        .createTempDirectory(s"cur$tag$k").toString
      (0 until k).foreach { r =>
        graft.streaming.CurationIngest.ingestBatchBucketed(
          replica(r), s"$tmp/store", imgTbl, audTbl,
          maxHamming = 3, batchId = r.toLong, buckets = parts)
      }
      (s"$tmp/store", imgTbl, audTbl, () => {
        spark.sql(s"DROP TABLE IF EXISTS $imgTbl")
        spark.sql(s"DROP TABLE IF EXISTS $audTbl")
        val tp = java.nio.file.Paths.get(tmp)
        if (java.nio.file.Files.exists(tp))
          java.nio.file.Files.walk(tp)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
      })
    }

    if (only.forall(_ == "verdict")) {
      println("== q173 incremental verdict vs batch q164 recompute ==")
      for (k <- Seq(1, 4, 8)) {
        val docs = (0 until k).map(replica).reduce(_ unionByName _)
          .coalesce(parts).localCheckpoint(eager = true)
        val nDocs = docs.count()
        val (store, imgTbl, audTbl, cleanup) = buildStore(k, "v")
        try {
          for (rep <- 1 to 3) {
            val (nKeep, tv, shv, mxv) = timedSh {
              graft.streaming.CurationIngest.verdict(spark, store)
                .filter(col("keep") === 1L).count()
            }
            println(f"R18SCALE verdict K=$k rep=$rep docs=$nDocs%,d " +
              f"kept=$nKeep%,d wall=$tv%.2f s shuffle=$shv%.1f MB " +
              f"max_task=$mxv ms")
          }
          // the batch recompute over the same corpus — the work the
          // incremental verdict does NOT pay (decode + fingerprint +
          // candidate joins), once per K for the comparison line
          val (nKeepB, tb, shb, mxb) = timedSh {
            val ids = docs.select("doc_id")
            val gate = graft.ext.Filters.gopherGate(docs, "doc_id", "text")
              .select(col("doc_id"), col("keep").as("text_keep"))
            val hashed = graft.multimodal.ImageDedup.dhashFrame(
              graft.multimodal.MediaSynth.withPgmPayload(ids, "doc_id"),
              "doc_id", "payload")
            val groups = graft.ext.Dedup.dedupGroups(ids,
              graft.multimodal.ImageDedup.nearDupFromHashes(hashed))
            val kept = graft.ext.Dedup.canonicalDocs(groups,
                docs.select(col("doc_id"), col("n_chars")), "n_chars")
              .select(col("kept_doc").as("doc_id"), lit(1L).as("image_keep"))
            val audioDrop = graft.multimodal.AudioDedup.nearDupAudio(
                graft.multimodal.MediaSynth.withWavMotifPayload(ids, "doc_id"),
                "doc_id", "payload")
              .select(col("doc_b").as("doc_id")).distinct()
              .withColumn("audio_dup", lit(1L))
            ids.join(gate, Seq("doc_id"))
              .join(kept, Seq("doc_id"), "left")
              .join(audioDrop, Seq("doc_id"), "left")
              .select(col("doc_id"),
                (col("text_keep") *
                  coalesce(col("image_keep"), lit(0L)) *
                  when(col("audio_dup").isNull, 1L).otherwise(0L))
                  .as("keep"))
              .filter(col("keep") === 1L).count()
          }
          println(f"R18SCALE verdict K=$k BATCH docs=$nDocs%,d " +
            f"kept=$nKeepB%,d wall=$tb%.2f s shuffle=$shb%.1f MB " +
            f"max_task=$mxb ms")
        } finally cleanup()
      }
    }

    if (only.forall(_ == "ingest")) {
      println("== q173 composed per-batch ingest vs store size ==")
      val newBatch = replica(0).filter(col("doc_id") % 10 === 0)
        .coalesce(parts).localCheckpoint(eager = true)
      val nNew = newBatch.count()
      for (k <- Seq(1, 4, 8)) {
        val (store, imgTbl, audTbl, cleanup) = buildStore(k, "i")
        try {
          val storeRows = spark.table(imgTbl).count() +
            spark.table(audTbl).count()
          // reps re-ingest the same batch under fresh batch ids (the
          // vidstore convention: the index grows by |rep·batch| keys
          // across reps; wall/shuffle/max_task are the per-rep signal)
          for (rep <- 1 to 3) {
            val (_, t, sh, mx) = timedSh {
              graft.streaming.CurationIngest.ingestBatchBucketed(newBatch,
                store, imgTbl, audTbl, maxHamming = 3,
                batchId = (k + rep).toLong, buckets = parts)
            }
            println(f"R18SCALE ingest K=$k rep=$rep " +
              f"store_rows=$storeRows%,d batch=$nNew%,d wall=$t%.2f s " +
              f"shuffle=$sh%.1f MB max_task=$mx ms")
          }
        } finally cleanup()
      }
    }

    spark.stop()
  }
}
