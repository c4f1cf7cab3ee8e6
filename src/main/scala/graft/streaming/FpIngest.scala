package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SHARED 64-bit-fingerprint streaming-dedup machinery behind the
  * image ([[ImageIngest]]) and audio ([[AudioIngest]]) ingest families
  * — one implementation of the candidate/verify/store contract, never
  * a diverging copy (the [[graft.multimodal.AudioDedup]] batch path
  * already shares [[graft.multimodal.ImageDedup.nearDupFromHashes]]
  * the same way). Everything modality-specific — decode + fingerprint
  * of a micro-batch — stays in the family objects; everything below
  * the fingerprint is byte-identical:
  *
  *   - `keyed`: 64-bit fp → 4× 16-bit block keys (the
  *     [[graft.multimodal.ImageDedup]] candidate convention, block
  *     value offset by q·2³² so key slots never collide);
  *   - `ingestBatch`: candidates from the key join against (bucketed
  *     index ∪ new) — new × all, never all × all — inline exact
  *     Hamming verify, dynamic-partition overwrite of this batch's
  *     pairs, append the new keys to the index;
  *   - `compact` / `pairs`: the fold + read-back contract.
  *
  * Scale/idempotency contracts are the [[ImageIngest]] scaladoc's,
  * unchanged by this extraction: O(|batch|) exchange into the bucket
  * layout, own-batch exclusion + dynamic partition overwrite under
  * at-least-once replay, committed-`upToBatch`-only folds. */
private[graft] object FpIngest {

  /** Explode a `(doc_id, fp)` frame into `(doc_id, fp, key)` — one row
    * per 16-bit block key. */
  def keyed(hashed: DataFrame): DataFrame =
    hashed.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(q =>
        shiftrightunsigned(col("fp"), q * 16).bitwiseAND(lit(0xffffL)) +
          lit(q.toLong * 4294967296L)): _*)).as("key"))

  /** One micro-batch over precomputed `(doc_id, fp, key)` rows. */
  def ingestBatch(
      newKeys: DataFrame,
      storeDir: String,
      fpTable: String,
      maxHamming: Int,
      batchId: Long,
      buckets: Int): Unit = {
    val spark = newKeys.sparkSession
    if (newKeys.isEmpty) return
    val pairs = candidates(spark, fpTable, newKeys, maxHamming, batchId)
    pairs.withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$storeDir/pairs")
    StoreCompact.appendToBucketedIndex(spark, fpTable,
      newKeys.withColumn("batch_id", lit(batchId)),
      buckets, Seq("key"))
  }

  /** The per-batch verified pairs `(doc_a, doc_b, hamming)` — exposed
    * for the StreamingSpec plan asserts (store-side scan carries NO
    * exchange into the join). */
  def candidates(
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
    * latest-wins per `doc_id`, eviction horizon, rename swap — and
    * fold the pairs parquet store (distinct — an output log,
    * duplicates are only replay files). `upToBatch` MUST be committed
    * to the stream checkpoint ([[StoreCompact.foldBucketedTable]]'s
    * load-bearing precondition). */
  def compact(
      spark: SparkSession,
      storeDir: String,
      fpTable: String,
      upToBatch: Long,
      evictBelow: Long,
      buckets: Int): Unit = {
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
