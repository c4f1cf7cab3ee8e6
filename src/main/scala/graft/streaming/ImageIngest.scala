package graft.streaming

import graft.multimodal.{ImageDedup, MediaSynth}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest → IMAGE near-dedup loop — the FOURTH ingest family
  * (text signatures [[DocIngest]], embeddings [[EmbIngest]], PQ codes
  * [[PqIngest]], image fingerprints here), extending the engine's
  * incremental-dedup story to the multimodal tier: a file stream of
  * documents lands through `foreachBatch`, each micro-batch is decoded
  * and dHash-fingerprinted (the q154 kernels) for the NEW images only,
  * candidates come from the 16-bit block-key join against the
  * accumulated BUCKETED fingerprint index (new × all, never all × all),
  * the exact Hamming verify runs INLINE on the joined fingerprints (the
  * fp rides the index — 8 bytes per row — so unlike the text path there
  * is no second verification store), and verified pairs append to the
  * output log. At 100 TB/day of images the per-batch work is |batch|
  * decodes plus an equi-join whose store side reads a catalog table
  * bucketed on exactly the join key — the only exchange moves the
  * |batch| new keys into the bucket layout, O(|batch|) not O(|store|)
  * (the q137 shape; ImageIngest's StreamingSpec leg pins the
  * no-store-side-exchange plan).
  *
  * State: the bucketed index table `(doc_id, key, fp, batch_id)`
  * (append-only between compactions — [[StoreCompact.
  * appendToBucketedIndex]] with the swap guard) plus one parquet
  * `pairs` dir `(doc_a, doc_b, hamming)` hash-partitioned by
  * `batch_id`. Every pair involves at least one new image exactly once
  * (old × old pairs were emitted by earlier batches), so the
  * accumulated pairs equal the batch [[ImageDedup.nearDupDHash]] over
  * the same corpus — the q154 oracle, across batch boundaries.
  *
  * Idempotency under at-least-once replay: pairs overwrite their own
  * `batch_id=N` partition (dynamic partition overwrite), index reads
  * exclude the current batch id, and a replay's duplicate index append
  * leaves only rows that collapse in the candidate `distinct` —
  * benign re-work the next [[compactBucketed]] fold removes (the
  * [[DocIngest.ingestBatchBucketed]] contract, verbatim).
  *
  * The corpus carries no image table, so the batch synthesises its
  * payloads from `doc_id` ([[MediaSynth.withPgmPayload]] — the q154
  * convention, putting the REAL decode + resize + hash kernels under
  * the oracle); with a real corpus the stream's rows carry a binary
  * payload column and [[fingerprints]]' synth line disappears.
  */
object ImageIngest {

  /** Start the bucketed-index ingest stream over a directory of
    * documents parquet. */
  def startBucketed(
      spark: SparkSession,
      inDir: String,
      storeDir: String,
      fpTable: String,
      checkpointDir: String,
      maxHamming: Int = 3,
      buckets: Int = 32): StreamingQuery =
    spark.readStream.schema(DocIngest.docSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchBucketed(batch, storeDir, fpTable, maxHamming, batchId,
          buckets)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** One decode + resize + dHash pass over the batch → `(doc_id, key,
    * fp)`, one exploded row per 16-bit block key (the
    * [[ImageDedup.nearDupDHash]] candidate convention: block value
    * offset by q·2³² so key slots never collide). The ONLY
    * modality-specific step — everything downstream is [[FpIngest]],
    * shared with the audio family. */
  private[graft] def fingerprints(batch: DataFrame): DataFrame = {
    implicit val spark: SparkSession = batch.sparkSession
    FpIngest.keyed(ImageDedup.dhashFrame(
      MediaSynth.withPgmPayload(batch.select(col("doc_id")), "doc_id"),
      "doc_id", "payload")
      .localCheckpoint(eager = true)) // one decode pass, read twice
  }

  /** One micro-batch: fingerprints for the NEW images, candidates from
    * the key join against (bucketed index ∪ new), inline Hamming
    * verify, overwrite this batch's pairs partition, append the new
    * keys to the index ([[FpIngest.ingestBatch]]). */
  def ingestBatchBucketed(
      batch: DataFrame,
      storeDir: String,
      fpTable: String,
      maxHamming: Int,
      batchId: Long = 0L,
      buckets: Int = 32): Unit = BatchExec.aqeOn(batch.sparkSession) {
    FpIngest.ingestBatch(fingerprints(batch), storeDir, fpTable,
      maxHamming, batchId, buckets)
  }

  /** The per-batch verified pairs `(doc_a, doc_b, hamming)` — exposed
    * for the StreamingSpec plan assert (store-side scan carries NO
    * exchange into the join). */
  private[graft] def bucketedCandidates(
      spark: SparkSession,
      fpTable: String,
      newKeys: DataFrame,
      maxHamming: Int,
      batchId: Long): DataFrame =
    FpIngest.candidates(spark, fpTable, newKeys, maxHamming, batchId)

  /** Rebuild the fingerprint-index table to one file per bucket —
    * latest-wins per `doc_id`, eviction horizon, rename swap; the
    * [[DocIngest.compactBucketed]] contract bound to the fingerprint
    * schema (bucket/sort on the block `key`). Also folds the pairs
    * parquet store (distinct — an output log, duplicates are only
    * replay files). */
  def compact(
      spark: SparkSession,
      storeDir: String,
      fpTable: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue,
      buckets: Int = 32): Unit =
    FpIngest.compact(spark, storeDir, fpTable, upToBatch, evictBelow,
      buckets)

  /** The accumulated verified pairs (empty frame if nothing ingested). */
  def pairs(spark: SparkSession, storeDir: String): DataFrame =
    FpIngest.pairs(spark, storeDir)
}
