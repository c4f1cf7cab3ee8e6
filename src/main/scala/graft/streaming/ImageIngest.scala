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
    * offset by q·2³² so key slots never collide). */
  private[graft] def fingerprints(batch: DataFrame): DataFrame = {
    implicit val spark: SparkSession = batch.sparkSession
    val hashed = ImageDedup.dhashFrame(
      MediaSynth.withPgmPayload(batch.select(col("doc_id")), "doc_id"),
      "doc_id", "payload")
      .localCheckpoint(eager = true) // one decode pass, read twice
    hashed.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(q =>
        shiftrightunsigned(col("fp"), q * 16).bitwiseAND(lit(0xffffL)) +
          lit(q.toLong * 4294967296L)): _*)).as("key"))
  }

  /** One micro-batch: fingerprints for the NEW images, candidates from
    * the key join against (bucketed index ∪ new), inline Hamming
    * verify, overwrite this batch's pairs partition, append the new
    * keys to the index. */
  def ingestBatchBucketed(
      batch: DataFrame,
      storeDir: String,
      fpTable: String,
      maxHamming: Int,
      batchId: Long = 0L,
      buckets: Int = 32): Unit = {
    val spark = batch.sparkSession
    val newKeys = fingerprints(batch)
    if (newKeys.isEmpty) return
    val pairs = bucketedCandidates(spark, fpTable, newKeys, maxHamming,
      batchId)
    pairs.withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$storeDir/pairs")
    StoreCompact.appendToBucketedIndex(spark, fpTable,
      newKeys.withColumn("batch_id", lit(batchId)),
      buckets, Seq("key"))
  }

  /** The per-batch verified pairs `(doc_a, doc_b, hamming)` — exposed
    * for the StreamingSpec plan assert (store-side scan carries NO
    * exchange into the join). */
  private[graft] def bucketedCandidates(
      spark: SparkSession,
      fpTable: String,
      newKeys: DataFrame,
      maxHamming: Int,
      batchId: Long): DataFrame = {
    def pairsOf(ys: DataFrame): DataFrame =
      newKeys.as("x")
        .join(ys.as("y"),
          col("x.key") === col("y.key") && col("x.doc_id") =!= col("y.doc_id"))
        .filter(bit_count(col("x.fp").bitwiseXOR(col("y.fp"))) <= maxHamming)
        .select(
          least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"),
          bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).cast("long")
            .as("hamming"))
    // swap-aware resolution: None only when the index was never created;
    // a mid-swap absent table resumes or THROWS (StoreCompact.liveIndexTable)
    val vsStore = StoreCompact.liveIndexTable(spark, fpTable).map(t =>
      pairsOf(t.filter(col("batch_id") =!= batchId)
        .select("doc_id", "key", "fp")))
    vsStore.map(_.unionByName(pairsOf(newKeys))).getOrElse(pairsOf(newKeys))
      .distinct()
  }

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
      buckets: Int = 32): Unit = {
    StoreCompact.fold(spark, s"$storeDir/pairs", upToBatch)(
      df => df.drop("batch_id").distinct())
    StoreCompact.foldBucketedTable(spark, fpTable, upToBatch,
      keyCol = "doc_id", bucketCols = Seq("key"),
      sortCols = Seq("key"), buckets = buckets,
      evictBelow = evictBelow)
  }

  /** The accumulated verified pairs (empty frame if nothing ingested). */
  def pairs(spark: SparkSession, storeDir: String): DataFrame =
    if (StoreCompact.storeExists(spark, s"$storeDir/pairs"))
      spark.read.parquet(s"$storeDir/pairs")
        .select("doc_a", "doc_b", "hamming")
    else {
      import spark.implicits._
      Seq.empty[(Long, Long, Long)].toDF("doc_a", "doc_b", "hamming")
    }
}
