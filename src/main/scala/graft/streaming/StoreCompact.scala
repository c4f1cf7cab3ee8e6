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
    * under id `upToBatch`). Crash safety: the rebuild is durable before
    * the first rename; a crash inside the swap window leaves the live
    * name absent with the rebuild intact and the next call finishes the
    * rename pair — callers observe the old table or the new, never a
    * partial fold. Run quiesced (between micro-batches): a read DURING
    * the swap window sees an absent table as an empty index. */
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
      // finish an interrupted swap: the rebuild is complete on disk
      if (exists(tmpTable)) {
        spark.sql(s"ALTER TABLE $tmpTable RENAME TO $table")
        if (exists(oldTable)) spark.sql(s"DROP TABLE $oldTable")
      } else if (exists(oldTable)) {
        // crashed before the rebuild finished: restore the live table
        spark.sql(s"ALTER TABLE $oldTable RENAME TO $table")
      }
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
