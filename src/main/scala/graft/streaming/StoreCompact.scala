package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared compaction for the batch-partitioned parquet state stores the
  * foreachBatch ingest family keeps ([[DocIngest]] signatures/shingles/
  * pairs, [[EmbIngest]] items, [[PqIngest]] codes). Every store shares
  * one layout — rows under `batch_id=N` partitions, writes overwriting
  * only their own partition, reads excluding the current batch — and
  * therefore one failure mode: the partition list grows by one per
  * micro-batch FOREVER, so per-batch reads pay an ever-longer file
  * listing and the store accretes small files without bound.
  *
  * [[fold]] collapses every partition with `batch_id <= upToBatch` into
  * the single partition `batch_id = upToBatch` under a caller-supplied
  * fold (latest-wins per key, distinct, …). Contracts shared by every
  * caller:
  *
  *  - REPLAY SAFETY: only fold batches that can no longer replay
  *    (`upToBatch` ≤ the last batch committed to the stream checkpoint).
  *    A later batch N > upToBatch still sees the pre-batch store exactly:
  *    the folded partition's id `upToBatch` ≠ N survives N's own-batch
  *    exclusion filter.
  *  - CRASH SAFETY: the folded frame is materialised (localCheckpoint)
  *    BEFORE the partition overwrite, and the superseded partitions are
  *    deleted only after the overwrite commits. A crash in between
  *    leaves duplicate rows that the next fold removes; callers'
  *    downstream reads already tolerate duplicates (pair distincts,
  *    per-id max_by).
  *  - EMPTY FOLD: if the fold drops every row (an eviction horizon), no
  *    partition is written and the whole `<= upToBatch` slice is removed
  *    by deletion, including `batch_id = upToBatch`.
  *
  * Scale shape: one job over the `<= upToBatch` slice (whatever shuffle
  * the fold itself needs — typically one hash exchange on the store key)
  * — a maintenance pass, amortised across the batches it folds. */
object StoreCompact {

  /** True when `dir` holds at least one `batch_id=` partition (a fold
    * whose eviction emptied the store leaves the bare directory and its
    * `_SUCCESS` marker, which plain parquet reads reject). */
  def storeExists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch_id="))
  }

  /** True when a [[foldBucketedTable]] swap sibling exists for `table` —
    * a compaction swap is in flight (between the two RENAMEs) or was
    * interrupted by a crash. In either state the absence of the live
    * name must NOT be read as "no index yet". */
  def swapInFlight(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table + "__compact") ||
      spark.catalog.tableExists(table + "__old")

  /** Complete an interrupted [[foldBucketedTable]] swap, if one is
    * pending: the live name absent with `__compact` (the durable,
    * complete rebuild — finish the rename pair) or only `__old` (the
    * pre-fold table — restore it) present. Idempotent, and safe to race:
    * a rename lost to a concurrent resume is swallowed iff the live
    * table came into existence, so two resumers converge and any other
    * failure still throws. No-op when the live table already exists. */
  def resumeSwap(spark: SparkSession, table: String): Unit = {
    val tmpTable = table + "__compact"
    val oldTable = table + "__old"
    def exists(t: String) = spark.catalog.tableExists(t)
    if (exists(table)) return
    if (exists(tmpTable)) {
      try spark.sql(s"ALTER TABLE $tmpTable RENAME TO $table")
      catch { case _: Exception if exists(table) => () }
      if (exists(table) && exists(oldTable)) spark.sql(s"DROP TABLE $oldTable")
    } else if (exists(oldTable)) {
      try spark.sql(s"ALTER TABLE $oldTable RENAME TO $table")
      catch { case _: Exception if exists(table) => () }
    }
    // the recovery renames move managed directories exactly like the
    // normal swap — a session holding a pre-crash cached relation would
    // otherwise keep listing moved files
    if (exists(table)) spark.catalog.refreshTable(table)
  }

  /** Read-path resolution of a bucketed index table that is SAFE across
    * [[foldBucketedTable]]'s swap window: returns the live table, or
    * None only when the index was genuinely never created (no swap
    * sibling either — the first-batch case). A mid-swap or crashed-swap
    * absence is NEVER reported as "no index": the resume runs right here
    * (the rebuild is durable before the first rename, so finishing the
    * rename pair is always safe — worst case a racing maintenance
    * session's second rename fails loudly), and if the live name still
    * cannot be produced this THROWS rather than letting the caller
    * silently compute against an empty index and emit incomplete
    * output. Always refreshes the relation cache before handing the
    * table out: foreachBatch readers run in a cloned session whose
    * cache a maintenance session's post-swap refresh cannot reach. */
  def liveIndexTable(spark: SparkSession, table: String): Option[DataFrame] = {
    def exists(t: String) = spark.catalog.tableExists(t)
    if (!exists(table)) {
      if (!swapInFlight(spark, table)) return None
      resumeSwap(spark, table)
      if (!exists(table))
        throw new IllegalStateException(
          s"bucketed index '$table' is mid-compaction-swap (sibling " +
            s"${table}__compact/${table}__old present) and could not be " +
            "resumed — refusing to treat it as an empty index")
    }
    spark.catalog.refreshTable(table)
    Some(spark.table(table))
  }

  /** Append one batch's rows to a bucketed index table, creating it on
    * first use — the ingest families' shared index write. Buckets AND
    * sorts on `bucketCols` (the join keys). The create leg refuses
    * LOUDLY when a swap sibling exists: the table vanishing mid-batch
    * means a compaction swap raced this batch, and re-creating the live
    * name would orphan the complete rebuild (the next fold drops
    * `__compact` as stale) — the whole accumulated index silently lost.
    *
    * The append leg re-checks AFTER its commit: the exists check and the
    * append are not atomic, so a fold's rename pair landing in between
    * commits this batch's rows into the renamed-aside `__old` directory
    * (dropped at swap end) — rows silently lost under a violated
    * quiesce. Observing a swap sibling (or the live name gone) right
    * after a "successful" append is exactly that interleaving: throw so
    * the stream fails the batch and replays it against the folded table,
    * instead of acknowledging an append the store no longer holds.
    * Deliberately conservative: a fold that crashed BEFORE its swap
    * leaves the same signature (stale `__compact`, live table intact,
    * appended rows actually safe) and trips this too — an active fold
    * between rebuild and rename is indistinguishable from that debris,
    * so appends pause loudly until the next fold/[[foldBucketedTable]]
    * clears the stale sibling, rather than risk acknowledging rows a
    * landing swap is about to drop. */
  def appendToBucketedIndex(
      spark: SparkSession,
      table: String,
      rows: DataFrame,
      buckets: Int,
      bucketCols: Seq[String]): Unit = {
    val w = rows.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
    if (spark.catalog.tableExists(table)) {
      w.mode("append").saveAsTable(table)
      if (swapInFlight(spark, table) || !spark.catalog.tableExists(table))
        throw new IllegalStateException(
          s"bucketed index '$table': a compaction swap raced this batch's " +
            "index append — the appended rows may sit in a renamed-aside " +
            "directory; failing the batch so the replay lands on the " +
            "folded table")
    } else if (swapInFlight(spark, table))
      throw new IllegalStateException(
        s"bucketed index '$table' disappeared mid-batch with a compaction " +
          "swap in flight — refusing to re-create it over the rebuild")
    else w.mode("overwrite").saveAsTable(table)
  }

  /** Latest-batch-wins per `keyCol`, dropping keys whose winning batch
    * sits below `evictBelow` — the standard fold for stores where a
    * re-delivered key supersedes its earlier rows. */
  def latestWinsPerKey(
      keyCol: String, evictBelow: Long = Long.MinValue): DataFrame => DataFrame =
    df => {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("__mx",
          max("batch_id").over(Window.partitionBy(keyCol)))
        .filter(col("batch_id") === col("__mx") && col("__mx") >= evictBelow)
        .drop("__mx", "batch_id")
    }

  /** Fold a BUCKETED catalog index table (the [[fold]] of the
    * `ingestBatchBucketed` family — [[DocIngest]]'s signature index,
    * [[EmbIngest]]'s item index). Those tables are append-only between
    * compactions (datasource tables cannot combine `bucketBy` with
    * dynamic partition overwrite), so they accrete one file set per
    * micro-batch; this rebuilds them in place:
    *
    *   1. fold `batch_id <= upToBatch` latest-batch-wins per `keyCol`
    *      ([[latestWinsPerKey]] semantics incl. the `evictBelow`
    *      horizon), `distinct` away the duplicate rows replayed appends
    *      left, re-stamp as `batch_id = upToBatch`;
    *   2. union the `batch_id > upToBatch` rows verbatim (`batch_id` is
    *      a DATA column on these tables — the in-memory catalog's table
    *      rename moves the directory but not partition metadata, so a
    *      partitioned table would come back empty after the swap);
    *   3. write to `<table>__compact` with the same bucket/sort layout,
    *      `repartition(buckets, bucketCols)` first — the bucket id is
    *      the same Murmur3 hash, so each task holds exactly one bucket
    *      and writes ONE file ([[graft.sources.BucketedStore]]'s trick;
    *      single-file buckets make the declared sort exploitable under
    *      `spark.sql.legacy.bucketedTableScan.outputOrdering`);
    *   4. swap: rename the live table aside, rename the rebuild in,
    *      drop the old, refresh the relation cache.
    *
    * Replay safety is [[fold]]'s contract (`upToBatch` ≤ last committed
    * batch; later batches' own-batch exclusion sees the folded rows
    * under id `upToBatch`). This precondition is LOAD-BEARING, not
    * advisory: every folded index row is re-stamped `batch_id =
    * upToBatch`, so if `upToBatch` ever names a batch that has NOT yet
    * committed, that batch's replay excludes the ENTIRE folded index
    * via its own-batch exclusion (`batch_id =!= batchId`) and silently
    * loses every old-vs-new pair — wrong output, not a crash. Callers
    * must take `upToBatch` from the stream's committed offsets (the
    * checkpoint's `commits/` dir), never from a batch merely observed
    * to have produced output. Crash safety: the rebuild is durable before
    * the first rename; a crash inside the swap window leaves the live
    * name absent with the rebuild intact, and BOTH the next fold call
    * and any [[liveIndexTable]] read finish the rename pair — callers
    * observe the old table or the new, never a partial fold and never
    * a silently-empty index. Run quiesced (between micro-batches) all
    * the same: a violated quiesce costs a loud rename race, not wrong
    * output. */
  def foldBucketedTable(
      spark: SparkSession,
      table: String,
      upToBatch: Long,
      keyCol: String,
      bucketCols: Seq[String],
      sortCols: Seq[String],
      buckets: Int,
      evictBelow: Long = Long.MinValue): Unit = {
    val tmpTable = table + "__compact"
    val oldTable = table + "__old"
    def exists(t: String) = spark.catalog.tableExists(t)
    if (!exists(table)) {
      // finish an interrupted swap ([[resumeSwap]] — the read path runs
      // the same recovery, so batches between a crash and this call
      // never see the absent table as an empty index)
      resumeSwap(spark, table)
      return
    }
    if (exists(oldTable)) spark.sql(s"DROP TABLE $oldTable") // stale leftover
    if (exists(tmpTable)) spark.sql(s"DROP TABLE $tmpTable") // stale rebuild
    val full = spark.table(table)
    val folded = latestWinsPerKey(keyCol, evictBelow)(
        full.filter(col("batch_id") <= upToBatch))
      .distinct() // replayed appends duplicate rows under the SAME batch id
      .withColumn("batch_id", lit(upToBatch))
    folded.unionByName(full.filter(col("batch_id") > upToBatch))
      .repartition(buckets, bucketCols.map(col): _*)
      .write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(tmpTable)
    spark.sql(s"ALTER TABLE $table RENAME TO $oldTable")
    spark.sql(s"ALTER TABLE $tmpTable RENAME TO $table")
    spark.sql(s"DROP TABLE $oldTable")
    // the rename pair moves the managed directories; readers that
    // resolved the live name before the swap hold a cached relation
    // pointing at moved files — invalidate it
    spark.catalog.refreshTable(table)
  }

  /** Fold `batch_id <= upToBatch` of one store into partition
    * `upToBatch`, then delete the superseded partitions. `fold` receives
    * the slice WITH its `batch_id` column and must drop it. */
  def fold(
      spark: SparkSession,
      dir: String,
      upToBatch: Long)(fold: DataFrame => DataFrame): Unit = {
    if (!storeExists(spark, dir)) return
    val slice = spark.read.parquet(dir)
      .filter(col("batch_id") <= upToBatch)
    if (slice.isEmpty) return
    val folded = fold(slice).localCheckpoint(eager = true)
    val foldedEmpty = folded.isEmpty
    if (!foldedEmpty)
      folded.withColumn("batch_id", lit(upToBatch))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(dir)
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("batch_id=")) {
        val b = nm.stripPrefix("batch_id=").toLong
        if (b < upToBatch || (foldedEmpty && b == upToBatch))
          fs.delete(st.getPath, true)
      }
    }
  }
}
