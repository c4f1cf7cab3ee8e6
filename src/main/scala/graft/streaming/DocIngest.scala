package graft.streaming

import graft.ext.Dedup
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming ingest → near-dedup loop (SURVEY.md §2.10 open idea): a file
  * stream of documents lands through `foreachBatch`, and each micro-batch
  * is near-dedup'd INCREMENTALLY — MinHash signatures are computed for the
  * new documents only and joined against the accumulated signature store
  * via the LSH band index (new × all, never all × all), exact-verified,
  * then appended. At 100 TB/day rates this is the shape that works: per
  * batch the work is |batch| signature computations plus an equi-join
  * keyed on short band keys against a bucketed store; the full corpus is
  * never re-shingled.
  *
  * State lives in three parquet dirs under `storeDir`, each
  * hash-partitioned by `batch_id`:
  *   - `sigs`      (doc_id, band, key)  — the LSH index
  *   - `shingles`  (doc_id, sh)         — for the exact verify
  *   - `pairs`     (doc_a, doc_b)       — verified near-dup pairs
  *
  * Every pair involves at least one new document exactly once (old × old
  * pairs were emitted by earlier batches), so the accumulated `pairs`
  * equal the batch [[Dedup.nearDupMinhash]] over the same corpus —
  * asserted by StreamingSpec.
  *
  * Idempotency under at-least-once `foreachBatch` replay: every write is a
  * dynamic-partition OVERWRITE of the batch's own `batch_id=N` partition,
  * and store reads exclude the current batch id — a replayed micro-batch
  * recomputes against exactly the pre-batch state and REPLACES its earlier
  * (possibly partial) output instead of appending a second copy.
  */
object DocIngest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Start the ingest stream over a directory of documents parquet. */
  def start(
      spark: SparkSession,
      inDir: String,
      storeDir: String,
      checkpointDir: String,
      tau: Double = 0.8): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, storeDir, tau, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** See [[StoreCompact.storeExists]] — at least one `batch_id=`
    * partition present (an eviction-emptied store reads as absent). */
  private def storeExists(spark: SparkSession, dir: String): Boolean =
    StoreCompact.storeExists(spark, dir)

  /** One micro-batch: signatures for the NEW docs, candidates from the
    * band-key join against (store ∪ new), exact-Jaccard verify, overwrite
    * this batch's partition of each store. */
  def ingestBatch(batch: DataFrame, storeDir: String, tau: Double,
      batchId: Long = 0L): Unit = BatchExec.aqeOn(batch.sparkSession) {
    val spark = batch.sparkSession
    val sigs = Dedup.signatures(batch, "doc_id", "text")
      .localCheckpoint(eager = true) // one tokenize+hash pass, read 4×
    if (sigs.isEmpty) return
    val newKeys = sigs.select(col("doc_id"), col("band"), col("key"))
    val newSh = sigs.select(col("doc_id"), col("sh")).distinct()

    // exclude the current batch id: a replayed batch must see the
    // pre-batch store, not its own earlier partial output
    def readStore(name: String): Option[DataFrame] =
      if (storeExists(spark, s"$storeDir/$name"))
        Some(spark.read.parquet(s"$storeDir/$name")
          .filter(col("batch_id") =!= batchId)
          .drop("batch_id"))
      else None

    val allKeys = readStore("sigs")
      .map(_.unionByName(newKeys)).getOrElse(newKeys)
    val allSh = readStore("shingles")
      .map(_.unionByName(newSh)).getOrElse(newSh)

    // new × all on the band index; least/greatest orders the pair, and the
    // distinct collapses the both-new double match
    val cand = newKeys.as("x")
      .join(allKeys.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()

    // dynamic partitionOverwriteMode: replace ONLY batch_id=<this batch>
    def writeStore(df: DataFrame, name: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$storeDir/$name")

    // r18 optimization (guide §2.6): the three store writes are
    // independent actions with disjoint output dirs; the pairs verify
    // reads the PRE-batch sigs/shingles slices (own-batch exclusion:
    // concurrent writes land only under batch_id=<this batch>, which
    // the readers' partition filter prunes), so they overlap safely —
    // the batch wall is the verify leg, with the two appends hidden
    // under it instead of serialised after it.
    BatchExec.par(
      () => writeStore(Dedup.verifyJaccard(cand, allSh, tau), "pairs"),
      () => writeStore(newKeys, "sigs"),
      () => writeStore(newSh, "shingles"))
  }

  /** Start the ingest stream with the BUCKETED signature index. */
  def startBucketed(
      spark: SparkSession,
      inDir: String,
      storeDir: String,
      sigsTable: String,
      checkpointDir: String,
      tau: Double = 0.8,
      buckets: Int = 32): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchBucketed(batch, storeDir, sigsTable, tau, batchId, buckets)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** [[ingestBatch]] with the signature index kept as a BUCKETED catalog
    * table on the join keys — the 100 TB shape of the per-batch candidate
    * join. The plain store re-shuffles the WHOLE accumulated index on
    * (band, key) every micro-batch (the store side of the SortMergeJoin
    * pays an exchange that grows with the corpus while the batch stays
    * constant-size). Bucketing the table by exactly the join keys makes
    * the store side's scan already hash-partitioned: per batch the only
    * exchange moves the |batch| new signatures into the bucket layout —
    * per-batch shuffle cost O(|batch|), not O(|store|)
    * (StreamingSpec pins the no-store-side-exchange plan).
    *
    * The candidate join splits into (new × store-table) ∪ (new × new):
    * unioning the table with the in-memory batch first — the plain
    * path's shape — would erase the scan's bucketed distribution.
    *
    * `sortBy(band, key)` declares the within-bucket order, but Spark only
    * EXPLOITS a bucket sort when each bucket holds one file — the
    * per-batch partitions put several files in every bucket, so the SMJ
    * re-sorts the (exchange-free) store side; a [[compactBucketed]]
    * rebuild folds the table back to one file per bucket, after which
    * the store-side scan satisfies the join's sort requirement too
    * (StreamingSpec asserts the sort-free plan). The exchange
    * elimination — the claim StreamingSpec pins — never depends on the
    * sort.
    *
    * Index maintenance between compactions is APPEND-ONLY (Spark
    * datasource tables do not support per-partition dynamic overwrite
    * together with buckets), and replay stays correct without overwrite:
    * a replayed batch excludes its own `batch_id` when reading, so it
    * recomputes against exactly the pre-batch index, and the duplicate
    * index rows its second append leaves behind are candidate-join
    * duplicates that collapse in the pair `distinct` — benign re-work,
    * never wrong pairs ([[compactBucketed]]'s fold removes them). The
    * pairs and shingles stores keep the plain parquet layout and its
    * dynamic partition overwrite (their joins are id-keyed: the tiny
    * candidate side broadcasts at scale, so those stores never pay a
    * corpus-scale exchange to begin with). */
  def ingestBatchBucketed(
      batch: DataFrame,
      storeDir: String,
      sigsTable: String,
      tau: Double,
      batchId: Long = 0L,
      buckets: Int = 32): Unit = BatchExec.aqeOn(batch.sparkSession) {
    val spark = batch.sparkSession
    val sigs = Dedup.signatures(batch, "doc_id", "text")
      .localCheckpoint(eager = true)
    if (sigs.isEmpty) return
    val newKeys = sigs.select(col("doc_id"), col("band"), col("key"))
    val newSh = sigs.select(col("doc_id"), col("sh")).distinct()

    def readStore(name: String): Option[DataFrame] =
      if (storeExists(spark, s"$storeDir/$name"))
        Some(spark.read.parquet(s"$storeDir/$name")
          .filter(col("batch_id") =!= batchId)
          .drop("batch_id"))
      else None

    val allSh = readStore("shingles")
      .map(_.unionByName(newSh)).getOrElse(newSh)
    val cand = bucketedCandidates(spark, sigsTable, newKeys, batchId)

    def writeStore(df: DataFrame, name: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$storeDir/$name")

    // `batch_id` is a plain DATA column here, not a partition: every
    // appended file carries one constant batch_id, so the own-batch
    // exclusion filter still skips whole files on parquet row-group
    // stats, while [[compactBucketed]]'s rename-swap stays safe (the
    // in-memory catalog's table rename moves the directory but not
    // partition metadata — a partitioned table would come back empty).
    // append-or-create with the swap guard: a swap racing this batch
    // after the candidate read fails loudly instead of re-creating the
    // live name over the rebuild (StoreCompact.appendToBucketedIndex).
    // r18 optimization (guide §2.6): the verify write, the shingles
    // write and the index append are independent actions — the verify
    // reads the PRE-batch index/shingle slices (own-batch exclusion:
    // the concurrent append only ADDS files whose every row carries
    // this batch's id, which the `batch_id =!= batchId` filter drops;
    // the shingles write lands under the pruned batch_id=<this batch>
    // partition) — so they overlap: the batch wall is the verify leg,
    // the two appends hidden under it instead of serialised after it.
    BatchExec.par(
      () => writeStore(Dedup.verifyJaccard(cand, allSh, tau), "pairs"),
      () => writeStore(newSh, "shingles"),
      () => StoreCompact.appendToBucketedIndex(spark, sigsTable,
        newKeys.withColumn("batch_id", lit(batchId)),
        buckets, Seq("band", "key")))
  }

  /** The bucketed-index candidate pairs `(doc_a, doc_b)` for one batch —
    * exposed for the StreamingSpec plan assert (store-side scan carries
    * NO exchange into the join). */
  private[graft] def bucketedCandidates(
      spark: SparkSession,
      sigsTable: String,
      newKeys: DataFrame,
      batchId: Long): DataFrame = {
    def pairsOf(ys: DataFrame): DataFrame =
      newKeys.as("x")
        .join(ys.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") =!= col("y.doc_id"))
        .select(
          least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
    // swap-aware resolution (StoreCompact.liveIndexTable): None only
    // when the index was never created; a mid-swap/crashed-swap absent
    // table is resumed or THROWN, never read as an empty index (which
    // would silently emit this batch's pairs as new × new only) — and
    // the relation cache is refreshed before the read (this session is
    // a streaming clone a maintenance session's refresh cannot reach)
    val vsStore = StoreCompact.liveIndexTable(spark, sigsTable).map(t =>
      pairsOf(t.filter(col("batch_id") =!= batchId)
        .select("doc_id", "band", "key")))
    vsStore.map(_.unionByName(pairsOf(newKeys))).getOrElse(pairsOf(newKeys))
      .distinct()
  }

  /** Compact the signature store (r11 verdict, Missing #4): without this
    * the store accumulates one `batch_id=N` partition per micro-batch
    * forever — unbounded small files, and every [[ingestBatch]] reads an
    * ever-longer partition list. `compact` folds every partition with
    * `batch_id <= upToBatch` into the SINGLE partition
    * `batch_id = upToBatch`:
    *
    *   - `sigs` / `shingles`: latest-batch-wins per `doc_id` — a document
    *     re-ingested in a later batch supersedes its earlier signatures,
    *     so the folded index holds exactly one signature set per doc;
    *   - `pairs`: distinct (the output log just loses duplicate files);
    *   - rows whose winning batch is below `evictBelow` are DROPPED —
    *     the retention bound: documents older than the dedup horizon
    *     leave the index entirely (their already-emitted pairs stay in
    *     `pairs`, which is output, not state).
    *
    * Pairs-parity contract (StreamingSpec): with `evictBelow` at its
    * default, and provided no `doc_id` recurs across the folded batches,
    * ingesting after a compact produces EXACTLY the pairs the
    * uncompacted store would have produced — the fold changes layout,
    * never the visible (doc_id, band, key) / (doc_id, sh) sets. When a
    * doc IS re-ingested with different text, the fold intentionally
    * SUPERSEDES: the uncompacted store would keep matching the stale
    * signature set alongside the new one, the compacted store keeps only
    * the latest (the supersede leg of the spec pins this) — so later
    * batches can legitimately emit fewer stale-text pairs post-compact.
    *
    * Replay safety: call only with `upToBatch` ≤ the last COMMITTED
    * batch. A later batch N > upToBatch that replays still sees the
    * pre-batch store exactly (the folded partition's id `upToBatch` ≠ N,
    * so the `=!= batchId` exclusion keeps it). Crash safety: the folded
    * frame is materialised (localCheckpoint) before the partition
    * overwrite, and the superseded `batch_id < upToBatch` partitions are
    * deleted only after the overwrite commits; a crash in between leaves
    * duplicate rows that the NEXT compact folds away — candidates are
    * distinct'd downstream, so no wrong pairs, only transient re-work.
    *
    * Scale shape: one shuffle of the ≤upToBatch slice keyed on doc_id
    * (the latest-wins window) — a maintenance job, amortised across the
    * batches it folds; nothing corpus-quadratic. */
  def compact(
      spark: SparkSession,
      storeDir: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue): Unit = {
    val latestWins = StoreCompact.latestWinsPerKey("doc_id", evictBelow)
    // r18 optimization (guide §2.6): three disjoint store dirs — fold
    // them concurrently inside the same quiesce window.
    BatchExec.par(
      () => StoreCompact.fold(spark, s"$storeDir/sigs", upToBatch)(latestWins),
      () => StoreCompact.fold(spark, s"$storeDir/shingles", upToBatch)(
        latestWins),
      () => StoreCompact.fold(spark, s"$storeDir/pairs", upToBatch)(
        df => df.drop("batch_id").distinct()))
  }

  /** Compact the BUCKETED signature-index table (the [[compact]] of the
    * [[ingestBatchBucketed]] path — r12 verdict Missing #1): the table
    * is append-only between compactions, so it accretes one file set per
    * micro-batch — unbounded small files, and multi-file buckets force
    * the candidate SMJ to re-sort the (exchange-free) store side every
    * batch. Mechanics, replay/crash contracts, and the one-file-per-
    * bucket rebuild live in [[StoreCompact.foldBucketedTable]]; this
    * binds them to the signature schema (latest-wins per `doc_id` — a
    * re-ingested doc keeps only its newest signature set — bucket/sort
    * on the (band, key) join keys). Post-fold the candidate join's
    * store side carries neither exchange NOR sort (StreamingSpec
    * asserts the plan; the store≫batch curve is SCALE_r13.md §1).
    * Pairs-parity under compaction is the [[compact]] contract (no
    * recurring doc_id across folded batches; re-ingested docs
    * intentionally supersede).
    *
    * Scale shape: one job over the table — a hash exchange on `doc_id`
    * for the latest-wins window plus the `repartition` exchange into
    * bucket layout — amortised across the batches it folds; nothing
    * corpus-quadratic, and the steady state it restores is the
    * one-file-per-bucket layout the 100 TB candidate join wants. */
  def compactBucketed(
      spark: SparkSession,
      sigsTable: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue,
      buckets: Int = 32): Unit =
    StoreCompact.foldBucketedTable(spark, sigsTable, upToBatch,
      keyCol = "doc_id", bucketCols = Seq("band", "key"),
      sortCols = Seq("band", "key"), buckets = buckets,
      evictBelow = evictBelow)

  /** The accumulated near-dup pairs (empty frame if nothing ingested). */
  def pairs(spark: SparkSession, storeDir: String): DataFrame =
    if (storeExists(spark, s"$storeDir/pairs"))
      spark.read.parquet(s"$storeDir/pairs").select("doc_a", "doc_b")
    else {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    }
}
