package graft.streaming

import graft.ext.Similarity
import graft.functions.ArrayOps
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming ingest → semantic near-dedup loop: the incremental twin of
  * [[graft.ext.Similarity.semanticDedup]], the same shape [[DocIngest]]
  * gives MinHash dedup. A file stream of embeddings lands through
  * `foreachBatch`; each micro-batch is assigned to FROZEN k-means
  * centroids (model state fitted once, like any deployed clustering) and
  * compared against the accumulated item store WITHIN its cluster only —
  * new × all, never all × all; the corpus is never re-scanned.
  *
  * The verdict rule is first-seen-wins: an item is dropped iff a
  * smaller-id item of the same cluster already in (store ∪ this batch)
  * exceeds the exact fixed-point similarity threshold. A verdict is FINAL
  * at ingest — a later near-dup can never retroactively drop an earlier
  * item, which is exactly what an append-only pipeline needs. When ids
  * arrive in nondecreasing order the accumulated result equals the batch
  * [[Similarity.semanticDedup]] over the same corpus bit-for-bit
  * (StreamingSpec asserts it); under arbitrary arrival order the rule is
  * the arrival-order variant of the paper's keep-one choice — the kept
  * SET differs only inside duplicate groups, the freedom SemDeDup grants.
  *
  * State is one parquet dir `storeDir/items` (vec_id, cid, w,
  * n_neardup_prior, kept), hash-partitioned by `batch_id`. Idempotency
  * under at-least-once `foreachBatch` replay: writes dynamic-partition
  * OVERWRITE the batch's own `batch_id=N` partition and reads exclude the
  * current batch id, so a replay recomputes against exactly the pre-batch
  * state and replaces its earlier output ([[DocIngest]]'s contract).
  *
  * At 100 TB/day rates the per-batch work is |batch| scaled-image
  * computations, one broadcast centroid assignment, and one equi-join on
  * the cluster key against a store partitioned the same way — the
  * quadratic step stays confined within clusters, bounded by the fit's k.
  */
object EmbIngest {

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Start the ingest stream. `centroids` is the frozen fit — a
    * `(cid, cv)` frame from [[Similarity.kmeansFixedCentroids]]; its
    * (tiny, model-state) rows are collected once here and re-broadcast
    * into every micro-batch. */
  def start(
      spark: SparkSession,
      inDir: String,
      storeDir: String,
      checkpointDir: String,
      centroids: DataFrame,
      simThresholdFixed: Long): StreamingQuery = {
    val cents = centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    spark.readStream.schema(embSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, storeDir, cents, simThresholdFixed, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  private def storeExists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One micro-batch: assign the new vectors, count smaller-id in-cluster
    * near-dups against (store ∪ new), overwrite this batch's partition. */
  def ingestBatch(batch: DataFrame, storeDir: String,
      cents: Seq[(Long, Seq[Long])], simThresholdFixed: Long,
      batchId: Long = 0L): Unit = BatchExec.aqeOn(batch.sparkSession) {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    val cDf = cents.toDF("cid", "cv")
    val assigned = Similarity
      .assignFixed(batch, "vec_id", "embedding", cDf)
      .localCheckpoint(eager = true) // one image+assignment pass, read 3×

    // exclude the current batch id: a replayed batch must see the
    // pre-batch store, not its own earlier partial output
    val prior: Option[DataFrame] =
      if (storeExists(spark, s"$storeDir/items"))
        Some(spark.read.parquet(s"$storeDir/items")
          .filter(col("batch_id") =!= batchId)
          .select(col("vec_id").as("id"), col("cid"), col("w")))
      else None
    val all = prior
      .map(_.unionByName(assigned)).getOrElse(assigned)

    val n = assigned.as("b").join(all.as("a"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .filter(ArrayOps.dot(col("a.w"), col("b.w")) > lit(simThresholdFixed))
      .groupBy(col("b.id").as("id"))
      .agg(count(lit(1)).as("n_neardup_prior"))

    assigned.join(n, Seq("id"), "left")
      .select(col("id").as("vec_id"), col("cid"), col("w"),
        coalesce(col("n_neardup_prior"), lit(0L)).as("n_neardup_prior"))
      .withColumn("kept", (col("n_neardup_prior") === 0L).cast("long"))
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$storeDir/items")
  }

  /** Start the ingest stream with the BUCKETED item index (q142 — the
    * [[DocIngest.startBucketed]] treatment for the semantic path). */
  def startBucketed(
      spark: SparkSession,
      inDir: String,
      storeDir: String,
      itemsTable: String,
      checkpointDir: String,
      centroids: DataFrame,
      simThresholdFixed: Long,
      buckets: Int = 32): StreamingQuery = {
    val cents = centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    spark.readStream.schema(embSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchBucketed(batch, storeDir, itemsTable, cents,
          simThresholdFixed, batchId, buckets)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** [[ingestBatch]] with the item index kept as a catalog table
    * BUCKETED on the cluster key — [[DocIngest.ingestBatchBucketed]]'s
    * shape for the semantic path. The plain store re-shuffles the WHOLE
    * accumulated item set on `cid` every micro-batch (the store side of
    * the in-cluster pair join); bucketing by `cid` makes the store scan
    * already hash-partitioned, so the only per-batch exchange moves the
    * |batch| new items — O(|batch|), not O(|store|). The same
    * replay-safe split applies: verdict rows stay in the parquet
    * `items` store (dynamic partition overwrite — [[result]] is
    * unchanged), only the join side `(vec_id, cid, w)` lives in the
    * append-only table; `batch_id` is a DATA column (see
    * [[DocIngest.ingestBatchBucketed]] on why not a partition), and the
    * prior count is a `count_distinct` so the duplicate rows a replayed
    * append leaves behind can never inflate a verdict. Maintain with
    * [[compactBucketed]]. */
  def ingestBatchBucketed(
      batch: DataFrame,
      storeDir: String,
      itemsTable: String,
      cents: Seq[(Long, Seq[Long])],
      simThresholdFixed: Long,
      batchId: Long = 0L,
      buckets: Int = 32): Unit = BatchExec.aqeOn(batch.sparkSession) {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    val cDf = cents.toDF("cid", "cv")
    val assigned = Similarity
      .assignFixed(batch, "vec_id", "embedding", cDf)
      .localCheckpoint(eager = true)

    val n = bucketedPriorCounts(spark, itemsTable, assigned,
      simThresholdFixed, batchId)
    // r18 optimization (guide §2.6): verdict write ∥ index append — the
    // prior-count join reads the PRE-batch index slice (own-batch
    // exclusion drops the concurrently appended rows), and the
    // append-or-create swap guard (see DocIngest) is unchanged.
    BatchExec.par(
      () => assigned.join(n, Seq("id"), "left")
        .select(col("id").as("vec_id"), col("cid"), col("w"),
          coalesce(col("n_neardup_prior"), lit(0L)).as("n_neardup_prior"))
        .withColumn("kept", (col("n_neardup_prior") === 0L).cast("long"))
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$storeDir/items"),
      () => StoreCompact.appendToBucketedIndex(spark, itemsTable,
        assigned.select(col("id").as("vec_id"), col("cid"), col("w"))
          .withColumn("batch_id", lit(batchId)),
        buckets, Seq("cid")))
  }

  /** The bucketed-index smaller-id near-dup counts for one batch —
    * exposed for the StreamingSpec plan assert (store-side scan carries
    * NO exchange into the in-cluster join). The candidate join splits
    * (new × store-table) ∪ (new × new) so the union cannot erase the
    * scan's bucketed distribution; `count_distinct(a.id)` makes
    * replay-appended duplicate store rows count once. */
  private[graft] def bucketedPriorCounts(
      spark: SparkSession,
      itemsTable: String,
      assigned: DataFrame,
      simThresholdFixed: Long,
      batchId: Long): DataFrame = {
    def pairsOf(ys: DataFrame): DataFrame =
      assigned.as("b").join(ys.as("a"),
          col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
        .filter(ArrayOps.dot(col("a.w"), col("b.w")) > lit(simThresholdFixed))
        .select(col("a.id").as("aid"), col("b.id").as("id"))
    // swap-aware resolution (StoreCompact.liveIndexTable): None only
    // when the index was never created; a mid-swap absent table is
    // resumed or THROWN, never read as an empty index (which would
    // silently undercount priors for this batch) — and the relation
    // cache is refreshed before the read (streaming-clone session)
    val vsStore = StoreCompact.liveIndexTable(spark, itemsTable).map(t =>
      pairsOf(t.filter(col("batch_id") =!= batchId)
        .select(col("vec_id").as("id"), col("cid"), col("w"))))
    vsStore.map(_.unionByName(pairsOf(assigned))).getOrElse(pairsOf(assigned))
      .groupBy("id")
      .agg(count_distinct(col("aid")).as("n_neardup_prior"))
  }

  /** Compact the BUCKETED item-index table — latest-wins per `vec_id`,
    * rebuilt to one file per bucket on the `cid` join key
    * ([[StoreCompact.foldBucketedTable]]'s mechanics and contracts).
    * Post-fold the in-cluster join's store side carries neither
    * exchange nor sort. */
  def compactBucketed(
      spark: SparkSession,
      itemsTable: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue,
      buckets: Int = 32): Unit =
    StoreCompact.foldBucketedTable(spark, itemsTable, upToBatch,
      keyCol = "vec_id", bucketCols = Seq("cid"), sortCols = Seq("cid"),
      buckets = buckets, evictBelow = evictBelow)

  /** Compact the items store ([[StoreCompact]]'s shared contract —
    * replay/crash safety, `upToBatch` ≤ last committed batch): folds the
    * per-batch partitions into one, latest-batch-wins per `vec_id` so a
    * vector re-delivered under a later batch id keeps exactly one row —
    * materialising exactly the max-batch choice [[result]]'s `max_by`
    * read applies, so compacted and uncompacted reads agree
    * ([[PqIngest.result]]'s arrangement). */
  def compact(spark: SparkSession, storeDir: String, upToBatch: Long): Unit =
    StoreCompact.fold(spark, s"$storeDir/items", upToBatch)(
      StoreCompact.latestWinsPerKey("vec_id"))

  /** The accumulated verdicts — [[Similarity.semanticDedup]]'s schema
    * (empty frame if nothing ingested). A replayed batch already
    * overwrites its own `batch_id` partition, but a vector RE-DELIVERED
    * under a different batch id (source re-send, not foreachBatch
    * replay) would otherwise surface once per batch with possibly
    * conflicting verdicts — so the read dedups per `vec_id`, keeping the
    * latest (max `batch_id`) verdict, the same row [[compact]]'s
    * latest-wins fold materialises: compacted and uncompacted reads
    * agree. `max_by` keeps the dedup a hash aggregate with a map-side
    * partial instead of a full-store window sort ([[PqIngest.result]]'s
    * serving-read arrangement). */
  def result(spark: SparkSession, storeDir: String): DataFrame =
    if (storeExists(spark, s"$storeDir/items"))
      spark.read.parquet(s"$storeDir/items")
        .groupBy("vec_id")
        .agg(max_by(
          struct(col("cid"), col("n_neardup_prior"), col("kept")),
          col("batch_id")).as("v"))
        .select(col("vec_id"), col("v.cid").as("cid"),
          col("v.n_neardup_prior").as("n_neardup_prior"),
          col("v.kept").as("kept"))
    else {
      import spark.implicits._
      Seq.empty[(Long, Long, Long, Long)]
        .toDF("vec_id", "cid", "n_neardup_prior", "kept")
    }
}
