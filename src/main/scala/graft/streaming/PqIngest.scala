package graft.streaming

import graft.ext.Similarity
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming PQ indexing — the incremental twin of
  * [[graft.ext.Similarity.pqAssignCodes]], completing the deployed PQ
  * loop: codebooks are FITTED once ([[graft.ext.Similarity
  * .pqCodebooksFixed]], frozen model state like [[EmbIngest]]'s
  * centroids), every arriving embedding is CODED at ingest by this
  * stream, and queries serve from the accumulated 8-byte codes through
  * the ADC table without ever touching a raw vector again.
  *
  * Coding is per-row against the broadcast codebooks — no cross-batch
  * state at all — so the accumulated store equals the batch coding of
  * the union bit-for-bit under ANY arrival order (StreamingSpec asserts
  * it). State is one parquet dir `storeDir/codes` `(vec_id, codes)`
  * partitioned by `batch_id`; idempotency under at-least-once
  * `foreachBatch` replay is [[DocIngest]]'s contract — a replayed batch
  * dynamic-partition-OVERWRITES its own `batch_id=N` partition.
  *
  * At 100 TB/day rates the per-batch work is |batch| scaled-image
  * computations and one broadcast join against blocks×nCodes centroid
  * rows; the store grows by 8 longs per vector.
  */
object PqIngest {

  /** Start the ingest stream. `codebooks` is the frozen fit — a
    * `(blk, cid, cv)` frame from [[Similarity.pqCodebooksFixed]]; its
    * (tiny, model-state) rows are collected once and re-broadcast into
    * every micro-batch. */
  def start(
      spark: SparkSession,
      inDir: String,
      storeDir: String,
      checkpointDir: String,
      codebooks: DataFrame): StreamingQuery = {
    val books = codebooks.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .toSeq.sortBy(b => (b._1, b._2))
    spark.readStream.schema(EmbIngest.embSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, storeDir, books, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  private def storeExists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One micro-batch: code the new vectors, overwrite this batch's
    * partition. */
  def ingestBatch(batch: DataFrame, storeDir: String,
      books: Seq[(Long, Long, Seq[Long])], batchId: Long = 0L): Unit =
      BatchExec.aqeOn(batch.sparkSession) {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    Similarity
      .pqAssignCodes(batch, "vec_id", "embedding",
        books.toDF("blk", "cid", "cv"))
      .select(col("id").as("vec_id"), col("codes"))
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$storeDir/codes")
  }

  /** Compact the code store ([[StoreCompact]]'s shared contract —
    * replay/crash safety, `upToBatch` ≤ last committed batch): folds the
    * per-batch partitions into one, latest-batch-wins per `vec_id` —
    * materialising exactly the max-batch choice [[result]]'s `max_by`
    * read applies, so the serving read is unchanged while its input
    * shrinks to one row per vector. */
  def compact(spark: SparkSession, storeDir: String, upToBatch: Long): Unit =
    StoreCompact.fold(spark, s"$storeDir/codes", upToBatch)(
      StoreCompact.latestWinsPerKey("vec_id"))

  /** The accumulated code index — [[Similarity.pqAssignCodes]]'s schema
    * (empty frame if nothing ingested). A replayed batch already
    * overwrites its own `batch_id` partition, but a vector RE-DELIVERED
    * under a different batch id (source re-send, not foreachBatch replay)
    * would otherwise surface twice — so the read dedups per `vec_id`,
    * keeping the latest (max `batch_id`) coding. Coding is deterministic
    * against frozen codebooks, so any surviving copy carries identical
    * codes; max-batch-wins just makes the choice canonical. `max_by` keeps
    * the dedup a hash aggregate with a map-side partial (one exchange of
    * partial maxima) instead of a full-store window sort — this is the
    * deployed serving read path. */
  def result(spark: SparkSession, storeDir: String): DataFrame =
    if (storeExists(spark, s"$storeDir/codes")) {
      spark.read.parquet(s"$storeDir/codes")
        .groupBy(col("vec_id").as("id"))
        .agg(max_by(col("codes"), col("batch_id")).as("codes"))
    } else {
      import spark.implicits._
      Seq.empty[(Long, Seq[Long])].toDF("id", "codes")
    }
}
