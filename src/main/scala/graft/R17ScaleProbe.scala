package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (SCALE_r17.md): the composed-curation curve the r16
  * verdict brief asked for (Next #4).
  *
  * CURATION CHAIN (q164 verdict + q165 semi-join + pack): each LEG has
  * its own r12–r15 probe curve (Gopher gate: one tokenise pass; image
  * near-dup: SCALE_r15 §2; audio near-dup: SCALE_r15 §4; HashMin CC:
  * r12; runningSum packing: SCALE_r15 §1), but the COMPOSITION — three
  * modality legs joined into one keep verdict, the keep set semi-joined
  * against the corpus, the survivors packed and persisted — was never
  * run at K corpus replicas as ONE flow. The runningSum lesson (r15) is
  * that composition seams are where fixture-luck hides: a leg that is
  * linear alone can still be quadratic THROUGH a seam (e.g. a keep set
  * that stops pruning, a join that re-keys the whole corpus). Measured:
  * kept docs / packed sequences / wall / shuffle / max-task at
  * K = 1/4/8 corpus replicas, the SCALE_r16 table shape. Expected if
  * the seams are clean: kept and sequences corpus-LINEAR, max-task
  * flat, shuffle linear (the verdict joins key on doc_id at |corpus|
  * rows × a few long columns).
  *
  * The chain is re-composed here from the same shipped kernels q164/
  * q165 call ([[graft.ext.Filters.gopherGate]], [[graft.multimodal
  * .ImageDedup]] dHash + banded pairs, [[graft.ext.Dedup.dedupGroups]]/
  * [[graft.ext.Dedup.canonicalDocs]], [[graft.multimodal.AudioDedup
  * .nearDupAudio]], [[graft.ext.Packing.writeShards]]) — NOT through
  * the SparkEntry memo, because the probe must pay the verdict cost
  * inside the timed window at every K, exactly as a fresh curation run
  * over a K× corpus would.
  *
  * VIDEO INGEST STORE (q170, [[graft.streaming.VideoIngest]]): the
  * sixth family's exchange-shape claim. Unlike the single-fp families
  * (whose store side never leaves the bucketed layout), the multi-fp
  * verify pulls candidate docs' FULL frame sets out of the store — the
  * claim is that this exchange is O(|candidate docs| · frames), never
  * O(|store|), because the candidate set broadcast-semi-joins the frame
  * rows before any shuffle. One fixed batch ingested against 1×/4×/8×
  * stores; exchange bytes expected flat (the audstore shape with the
  * frame fan-out in front). Per the r16 ADVICE on the audstore probe:
  * pairs_cum is labeled cumulative (each rep re-ingests under a fresh
  * batch id), and the per-K temp dirs are deleted after the loop.
  *
  * Not part of the driver contract. Usage: `runMain graft.R17ScaleProbe`
  * (env: SPARK_GRAFT_SF_DIR / _CPUS; CASE=curation|vidstore). */
object R17ScaleProbe {
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

    if (only.forall(_ == "curation")) {
      println("== q164+q165 composed curation chain: verdict + semi-join + pack ==")
      for (k <- Seq(1, 4, 8)) {
        val docs = (0 until k).map(replica).reduce(_ unionByName _)
          .coalesce(parts).localCheckpoint(eager = true)
        val nDocs = docs.count()
        val tmp = java.nio.file.Files
          .createTempDirectory(s"curation$k").toString
        try {
          for (rep <- 1 to 3) {
            val ((nKept, nSeqs), t, sh, mx) = timedSh {
              val ids = docs.select("doc_id")
              // q164's three modality legs, composed exactly as
              // SparkEntry.curationVerdict composes them
              val gate = graft.ext.Filters.gopherGate(docs, "doc_id", "text")
                .select(col("doc_id"), col("keep").as("text_keep"))
              val hashed = graft.multimodal.ImageDedup.dhashFrame(
                graft.multimodal.MediaSynth.withPgmPayload(ids, "doc_id"),
                "doc_id", "payload")
              val groups = graft.ext.Dedup.dedupGroups(ids,
                graft.multimodal.ImageDedup.nearDupFromHashes(hashed))
              val kept = graft.ext.Dedup.canonicalDocs(groups,
                  docs.select(col("doc_id"), col("n_chars")), "n_chars")
                .select(col("kept_doc").as("doc_id"),
                  lit(1L).as("image_keep"))
              val audioDrop = graft.multimodal.AudioDedup.nearDupAudio(
                  graft.multimodal.MediaSynth.withWavMotifPayload(
                    ids, "doc_id"),
                  "doc_id", "payload")
                .select(col("doc_b").as("doc_id")).distinct()
                .withColumn("audio_dup", lit(1L))
              val verdict = ids.join(gate, Seq("doc_id"))
                .join(kept, Seq("doc_id"), "left")
                .join(audioDrop, Seq("doc_id"), "left")
                .select(col("doc_id"), col("text_keep"),
                  coalesce(col("image_keep"), lit(0L)).as("image_keep"),
                  when(col("audio_dup").isNull, 1L).otherwise(0L)
                    .as("audio_keep"))
                .withColumn("keep",
                  col("text_keep") * col("image_keep") * col("audio_keep"))
                .localCheckpoint(eager = true) // the q164 memo barrier
              val keepIds = verdict.filter(col("keep") === 1L)
                .select("doc_id")
              // q165's tail: semi-join + pack + persist + read back
              val curated = docs.join(keepIds, Seq("doc_id"), "left_semi")
              val out = graft.ext.Packing.writeShards(
                curated, "doc_id", "text",
                shards = 8, seqTokens = 256L, seed = 42L,
                outDir = s"$tmp/shards_$rep")
              (keepIds.count(), out.count())
            }
            println(f"R17SCALE curation K=$k rep=$rep docs=$nDocs%,d " +
              f"kept=$nKept%,d seqs=$nSeqs%,d wall=$t%.2f s " +
              f"shuffle=$sh%.1f MB max_task=$mx ms")
          }
        } finally {
          val tp = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(tp))
            java.nio.file.Files.walk(tp)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.deleteIfExists(f))
        }
      }
    }

    if (only.forall(_ == "vidstore")) {
      println("== q170 video ingest: per-batch exchange vs store size ==")
      // replica-0 ids re-arrive (the at-least-once re-delivery shape, as
      // in the audstore probe): the GIF motif fingerprint is full-entropy
      // per id/3 group, so a disjoint-group batch would pair with nothing
      // and never drive the clip-level verify tail
      val newBatch = replica(0).filter(col("doc_id") % 10 === 0)
        .select("doc_id")
        .coalesce(parts).localCheckpoint(eager = true)
      val nNew = newBatch.count()
      for (k <- Seq(1, 4, 8)) {
        val tbl = s"graft_probe_vidstore_$k"
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        val tmp = java.nio.file.Files
          .createTempDirectory(s"vidstore$k").toString
        try {
          (0 until k).foreach { r =>
            graft.streaming.StoreCompact.appendToBucketedIndex(spark, tbl,
              graft.streaming.VideoIngest.frameFingerprints(
                replica(r).select("doc_id"))
                .withColumn("batch_id", lit(r.toLong)),
              buckets = parts, Seq("key"))
          }
          graft.streaming.VideoIngest.compact(spark, s"$tmp/store", tbl,
            upToBatch = (k - 1).toLong, buckets = parts)
          val storeRows = spark.table(tbl).count()
          // reps re-ingest the same batch under fresh batch ids: the
          // index grows by |rep·batch| keys across reps and pairs_cum
          // is CUMULATIVE — wall/shuffle/max_task are the per-rep signal
          for (rep <- 1 to 3) {
            val (_, t, sh, mx) = timedSh {
              graft.streaming.VideoIngest.ingestBatchBucketed(newBatch,
                s"$tmp/store", tbl, maxTotalHamming = 3,
                batchId = (k + rep).toLong, buckets = parts)
            }
            val pairsNow = graft.streaming.VideoIngest
              .pairs(spark, s"$tmp/store").count()
            println(f"R17SCALE vidstore K=$k rep=$rep " +
              f"store_rows=$storeRows%,d batch=$nNew%,d " +
              f"pairs_cum=$pairsNow%,d wall=$t%.2f s " +
              f"shuffle=$sh%.1f MB max_task=$mx ms")
          }
        } finally {
          spark.sql(s"DROP TABLE IF EXISTS $tbl")
          val tp = java.nio.file.Paths.get(tmp)
          if (java.nio.file.Files.exists(tp))
            java.nio.file.Files.walk(tp)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.deleteIfExists(f))
        }
      }
    }

    spark.stop()
  }
}
