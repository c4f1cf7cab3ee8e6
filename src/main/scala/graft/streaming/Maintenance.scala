package graft.streaming

import org.apache.spark.sql.SparkSession

/** The ONE operational entry point for ingest-store maintenance (r13
  * verdict, Next #7): each ingest family keeps its state in one or two
  * stores — per-batch-partitioned parquet dirs plus, on the bucketed
  * paths, an append-only bucketed index table — and each store has its
  * own fold method with its own contract scattered across
  * [[DocIngest]]/[[EmbIngest]]/[[PqIngest]]/[[StoreCompact]]. This
  * facade binds them into one quiesce-aware call per family that
  *
  *   1. finishes any interrupted bucketed-table swap FIRST
  *      ([[StoreCompact.resumeSwap]] — idempotent, no-op when the live
  *      table exists), so the fold never starts behind a crashed one;
  *   2. folds the parquet stores (verdict/pairs/shingles/codes — the
  *      dynamic-partition-overwrite stores);
  *   3. rebuilds the bucketed index table last
  *      ([[StoreCompact.foldBucketedTable]] — latest-wins, eviction
  *      horizon, one-file-per-bucket, rename swap).
  *
  * Shared contract (see [[StoreCompact]] for the mechanics):
  *
  *   - REPLAY SAFETY: `upToBatch` must be ≤ the last batch COMMITTED to
  *     the stream checkpoint (its `commits/` dir — NOT a batch merely
  *     observed to have produced output); later batches still see the
  *     pre-batch state exactly. The precondition is load-bearing on
  *     the bucketed index tables: folded rows are re-stamped
  *     `batch_id = upToBatch`, so an UNCOMMITTED `upToBatch` makes
  *     that batch's replay exclude the whole folded index through its
  *     own-batch exclusion — silent pair loss, not a crash
  *     ([[StoreCompact.foldBucketedTable]] has the mechanics).
  *   - QUIESCE: run between micro-batches (the stream idle). The read
  *     paths are swap-aware ([[StoreCompact.liveIndexTable]]), so a
  *     violated quiesce costs a loud failure — a rename race or an
  *     [[IllegalStateException]] — never silently incomplete output.
  *   - EVICTION: rows whose winning batch sits below `evictBelow` leave
  *     the INDEX stores entirely (the retention horizon); emitted
  *     outputs (pairs, verdicts, codes) are logs, not state, and are
  *     never evicted.
  *   - CRASH SAFETY: every fold is durable before it replaces anything;
  *     a crash anywhere leaves a state the next call (or the next
  *     swap-aware read) finishes or rolls back.
  */
object Maintenance {

  /** Maintenance pass for a [[DocIngest]] deployment: fold the parquet
    * sigs/shingles/pairs stores, then — when the stream runs the
    * bucketed path ([[DocIngest.startBucketed]]) — rebuild the
    * signature-index table. Pass the same `buckets` the stream uses. */
  def compactDocStore(
      spark: SparkSession,
      storeDir: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue,
      sigsTable: Option[String] = None,
      buckets: Int = 32): Unit = {
    sigsTable.foreach(StoreCompact.resumeSwap(spark, _))
    // r18 optimization (guide §2.6): the parquet stores and the bucketed
    // index table are disjoint — fold them concurrently (resumeSwap above
    // stays FIRST: the index rebuild must never start behind a crashed
    // swap).
    BatchExec.par(
      () => DocIngest.compact(spark, storeDir, upToBatch, evictBelow),
      () => sigsTable.foreach(t =>
        DocIngest.compactBucketed(spark, t, upToBatch, evictBelow, buckets)))
  }

  /** Maintenance pass for an [[EmbIngest]] deployment: fold the parquet
    * items (verdict) store, then — on the bucketed path
    * ([[EmbIngest.startBucketed]]) — rebuild the item-index table. */
  def compactEmbStore(
      spark: SparkSession,
      storeDir: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue,
      itemsTable: Option[String] = None,
      buckets: Int = 32): Unit = {
    itemsTable.foreach(StoreCompact.resumeSwap(spark, _))
    // r18 optimization (guide §2.6): disjoint stores — fold concurrently
    // (resume-first, as above).
    BatchExec.par(
      () => EmbIngest.compact(spark, storeDir, upToBatch),
      () => itemsTable.foreach(t =>
        EmbIngest.compactBucketed(spark, t, upToBatch, evictBelow, buckets)))
  }

  /** Maintenance pass for an [[ImageIngest]] deployment: fold the
    * parquet pairs log, then rebuild the bucketed fingerprint-index
    * table (resume-first, like the other bucketed families).
    * `upToBatch` MUST be a batch committed to the stream checkpoint —
    * see REPLAY SAFETY above for why an uncommitted id silently drops
    * the folded index from that batch's replay. */
  def compactImageStore(
      spark: SparkSession,
      storeDir: String,
      fpTable: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue,
      buckets: Int = 32): Unit = {
    StoreCompact.resumeSwap(spark, fpTable)
    ImageIngest.compact(spark, storeDir, fpTable, upToBatch, evictBelow,
      buckets)
  }

  /** Maintenance pass for an [[AudioIngest]] deployment — the image
    * family's pass bound to the audio stores ([[FpIngest]] carries the
    * shared mechanics). `upToBatch` MUST be a batch committed to the
    * stream checkpoint — see REPLAY SAFETY above. */
  def compactAudioStore(
      spark: SparkSession,
      storeDir: String,
      fpTable: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue,
      buckets: Int = 32): Unit = {
    StoreCompact.resumeSwap(spark, fpTable)
    AudioIngest.compact(spark, storeDir, fpTable, upToBatch, evictBelow,
      buckets)
  }

  /** Maintenance pass for a [[VideoIngest]] deployment — the image
    * family's contract over the multi-fingerprint store (per-row fold:
    * a clip's whole frame set folds/evicts together). */
  def compactVideoStore(
      spark: SparkSession,
      storeDir: String,
      fpTable: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue,
      buckets: Int = 32): Unit = {
    StoreCompact.resumeSwap(spark, fpTable)
    VideoIngest.compact(spark, storeDir, fpTable, upToBatch, evictBelow,
      buckets)
  }

  /** Maintenance pass for a [[CurationIngest]] deployment — resume any
    * interrupted swap on BOTH fingerprint tables first, then the
    * composed fold (gate store distinct + both families' folds;
    * eviction touches the fingerprint indexes only — gate rows are
    * verdict coverage, not pairing state). `upToBatch` MUST be a batch
    * committed to the stream checkpoint — see REPLAY SAFETY above. */
  def compactCurationStore(
      spark: SparkSession,
      storeDir: String,
      imgTable: String,
      audTable: String,
      upToBatch: Long,
      evictBelow: Long = Long.MinValue,
      buckets: Int = 32): Unit = {
    StoreCompact.resumeSwap(spark, imgTable)
    StoreCompact.resumeSwap(spark, audTable)
    CurationIngest.compact(spark, storeDir, imgTable, audTable, upToBatch,
      evictBelow, buckets)
  }

  /** Maintenance pass for a [[PqIngest]] deployment (one parquet codes
    * store; no bucketed index variant). */
  def compactPqStore(
      spark: SparkSession, storeDir: String, upToBatch: Long): Unit =
    PqIngest.compact(spark, storeDir, upToBatch)

  /** Finish an interrupted bucketed-index swap without folding anything
    * — the explicit ops recovery entry ([[StoreCompact.resumeSwap]]).
    * Safe to call any time; no-op when the live table exists. */
  def resume(spark: SparkSession, table: String): Unit =
    StoreCompact.resumeSwap(spark, table)
}
