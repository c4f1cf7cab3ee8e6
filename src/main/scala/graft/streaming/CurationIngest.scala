package graft.streaming

import graft.ext.{Dedup, Filters}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CURATION chain — the capstone that composes the ingest
  * families into an incrementally-maintained corpus keep verdict (r17
  * verdict Next #2). The batch q164 verdict (text gate × image
  * retention × audio first-seen) recomputes every leg from scratch;
  * this family maintains the same verdict as an always-on stream: one
  * file stream, one checkpoint, and per micro-batch
  *
  *   1. the GATE leg — [[graft.ext.Filters.gopherGate]] over the NEW
  *      docs only (row-local flags, so per-batch ≡ corpus-global),
  *      persisted as `(doc_id, n_chars, text_keep, batch_id)` rows
  *      with the same dynamic-partition-overwrite idempotency as every
  *      pairs log (a replayed batch REPLACES its own partition);
  *   2. the IMAGE leg — [[ImageIngest.ingestBatchBucketed]] against
  *      this family's own accumulated bucketed fingerprint index
  *      (dHash candidates new × store, O(|batch|) exchange — the
  *      certified q161 machinery, verbatim);
  *   3. the AUDIO leg — [[AudioIngest.ingestBatchBucketed]], likewise
  *      (the certified q167 machinery).
  *
  * The VERDICT ([[verdict]]) is then derived state: text_keep rides
  * the gate store, image_keep is CC-retention over the accumulated
  * image pairs log ([[graft.ext.Dedup.dedupGroups]] +
  * [[graft.ext.Dedup.canonicalDocs]] keep-largest-n_chars — exactly
  * the batch q164 legs), audio_keep drops accumulated audio pair
  * `doc_b`s. Nothing re-decodes and nothing re-fingerprints at verdict
  * time: the expensive per-doc work happened once, at ingest, and the
  * assembly is O(|docs| + |pairs|) joins over the stores. CC retention
  * is deliberately NOT maintained monotonically per batch: a new pair
  * can merge two components and flip a previously-kept doc to dropped
  * (the canonical moves), so the keep verdict is a FOLD over the pair
  * log, recomputed from the (small) accumulated pairs — the same
  * shape as the batch path, minus all decode work.
  *
  * Maintenance ([[compact]] / [[Maintenance.compactCurationStore]]):
  * the gate store folds to one partition (distinct — replay files are
  * the only duplicates), both fingerprint indexes fold/evict under
  * their families' own contracts. EVICTION applies to the fingerprint
  * INDEXES only (docs below the horizon can no longer pair against new
  * arrivals — the q162/q168 semantics); gate rows and already-emitted
  * pairs persist (output, not state), so the verdict still covers
  * every ingested doc. `upToBatch` MUST be committed to the stream
  * checkpoint ([[StoreCompact.foldBucketedTable]]'s precondition).
  *
  * Crash/restart: all three legs hang off ONE `foreachBatch`, so a
  * kill + checkpoint-replay re-runs the whole batch body — the gate
  * store's partition overwrite and both index appends' own-batch
  * exclusion + candidate distinct make the replay byte-identical (the
  * q163/q169 contracts, now certified THROUGH a composed body).
  *
  * The corpus carries no image/audio tables, so the modality legs
  * synthesise payloads from `doc_id` inside their family objects (the
  * q154/q157 conventions); with a real corpus the stream's rows carry
  * binary payload columns and nothing here changes. */
object CurationIngest {

  private[graft] def gateDir(storeDir: String): String = s"$storeDir/gate"
  private[graft] def imageDir(storeDir: String): String = s"$storeDir/image"
  private[graft] def audioDir(storeDir: String): String = s"$storeDir/audio"

  /** Start the composed ingest stream over a directory of documents
    * parquet: one checkpoint drives the gate store and both bucketed
    * fingerprint indexes. */
  def startBucketed(
      spark: SparkSession,
      inDir: String,
      storeDir: String,
      imgTable: String,
      audTable: String,
      checkpointDir: String,
      maxHamming: Int = 3,
      buckets: Int = 32): StreamingQuery =
    spark.readStream.schema(DocIngest.docSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchBucketed(batch, storeDir, imgTable, audTable, maxHamming,
          batchId, buckets)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** One micro-batch: gate rows for the NEW docs (dynamic partition
    * overwrite — replay replaces, never appends), then the image and
    * audio ingest bodies against their accumulated stores.
    *
    * r18 optimization (guide §2.6): the three legs are INDEPENDENT —
    * disjoint output dirs/tables (`gate`, `image/...`+imgTable,
    * `audio/...`+audTable), each reading only the shared immutable
    * `batch` frame and its own family's state — so they run
    * concurrently ([[BatchExec.par]]): the composed per-batch wall is
    * max(leg) instead of sum(legs), and each leg's small stages
    * back-fill the others' scheduling gaps. [[BatchExec.aqeOn]] is
    * toggled HERE, outside the parallel region, so the nested family
    * bodies see AQE already on and never touch the conf. Replay
    * semantics are unchanged: a failed leg fails the whole batch (par
    * rethrows), and the replay idempotency of each leg never depended
    * on leg order (gate = partition overwrite; both indexes = own-batch
    * exclusion + candidate distinct). */
  def ingestBatchBucketed(
      batch: DataFrame,
      storeDir: String,
      imgTable: String,
      audTable: String,
      maxHamming: Int,
      batchId: Long = 0L,
      buckets: Int = 32): Unit = BatchExec.aqeOn(batch.sparkSession) {
    if (batch.isEmpty) return
    BatchExec.par(
      () => Filters.gopherGate(batch, "doc_id", "text")
        .select(col("doc_id"), col("keep").as("text_keep"))
        .join(batch.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(gateDir(storeDir)),
      () => ImageIngest.ingestBatchBucketed(batch, imageDir(storeDir),
        imgTable, maxHamming, batchId, buckets),
      () => AudioIngest.ingestBatchBucketed(batch, audioDir(storeDir),
        audTable, maxHamming, batchId, buckets))
  }

  /** The accumulated per-doc keep VERDICT `(doc_id, text_keep,
    * image_keep, audio_keep, keep)` — the batch q164 assembly off the
    * stores: no decode, no fingerprint, O(|docs| + |pairs|) joins. */
  def verdict(spark: SparkSession, storeDir: String): DataFrame = {
    val gate = if (StoreCompact.storeExists(spark, gateDir(storeDir)))
      spark.read.parquet(gateDir(storeDir))
        .select("doc_id", "n_chars", "text_keep").distinct()
    else {
      import spark.implicits._
      Seq.empty[(Long, Long, Long)].toDF("doc_id", "n_chars", "text_keep")
    }
    val ids = gate.select("doc_id")
    val groups = Dedup.dedupGroups(ids,
      FpIngest.pairs(spark, imageDir(storeDir)))
    val kept = Dedup.canonicalDocs(groups,
        gate.select(col("doc_id"), col("n_chars")), "n_chars")
      .select(col("kept_doc").as("doc_id"), lit(1L).as("image_keep"))
    val audioDrop = FpIngest.pairs(spark, audioDir(storeDir))
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("audio_dup", lit(1L))
    ids.join(gate.select("doc_id", "text_keep"), Seq("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .join(audioDrop, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text_keep"),
        coalesce(col("image_keep"), lit(0L)).as("image_keep"),
        when(col("audio_dup").isNull, 1L).otherwise(0L).as("audio_keep"))
      .withColumn("keep",
        col("text_keep") * col("image_keep") * col("audio_keep"))
  }

  /** Fold the gate store (distinct — replay files are the only
    * duplicates; gate rows NEVER evict, see the class scaladoc) and
    * both fingerprint families' stores. `upToBatch` MUST be committed
    * to the stream checkpoint. */
  def compact(
      spark: SparkSession,
      storeDir: String,
      imgTable: String,
      audTable: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue,
      buckets: Int = 32): Unit =
    // r18 optimization (guide §2.6): the three folds touch disjoint
    // stores (gate dir; image pairs dir + imgTable; audio pairs dir +
    // audTable) — run them concurrently, same quiesce window as before
    // (the whole call still runs between committed batches).
    BatchExec.par(
      () => StoreCompact.fold(spark, gateDir(storeDir), upToBatch)(df =>
        df.drop("batch_id").distinct()),
      () => ImageIngest.compact(spark, imageDir(storeDir), imgTable,
        upToBatch, evictBelow, buckets),
      () => AudioIngest.compact(spark, audioDir(storeDir), audTable,
        upToBatch, evictBelow, buckets))
}
