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
  * at-least-once replay, committed-`upToBatch`-only folds.
  *
  * STORE VERSIONING (r16 ADVICE): a persisted index is only comparable
  * to fingerprints produced by the SAME kernel version. The r16
  * frame-true windowing fix ([[graft.multimodal.AudioDedup]] — windows
  * count frames = samples × channels, min length 65·windowFrames·
  * channels samples) changed every MULTI-CHANNEL clip's fingerprint;
  * a store built from multi-channel clips before that fix must be
  * REBUILT (re-ingest from source) — new ingests would compare
  * new-format fps against old-format stored fps and silently miss
  * pairs. The repo's own committed stores are unaffected (every audio
  * fixture is mono, whose fingerprints the fix preserved bit-for-bit).
  * Deployments should stamp a kernel-version column or store-level
  * marker when operating fleets of long-lived indexes.
  *
  * MULTI-FINGERPRINT DOCUMENTS (r17 — the video family): clips carry
  * one fingerprint PER SAMPLED FRAME, not one per doc, and the match
  * semantics are clip-level ([[graft.multimodal.VideoDedup]]: same
  * sampled frame count, total Hamming over ALIGNED frames ≤ T). The
  * `keyedFrames`/`ingestBatchFrames`/`frameCandidates` trio carries
  * that contract over the same store machinery: index rows are
  * `(doc_id, f, nf, fp, key, batch_id)` — the frame index `f` rides
  * the key (only aligned frames collide) and the clip's sampled-frame
  * count `nf` rides every row (so the clip-level verify needs no
  * second store) — and `compact`/`pairs` are REUSED verbatim
  * ([[StoreCompact.latestWinsPerKey]] is per-row, so a doc's whole
  * frame set folds/evicts together under its one batch). */
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
    // r18 optimization (guide §2.6): the pairs write and the index
    // append are independent actions — the candidate join reads the
    // PRE-batch index slice (own-batch exclusion: the concurrent append
    // only ADDS files whose every row carries this batch's id, dropped
    // by the `batch_id =!= batchId` filter) — so they overlap instead
    // of serialising two per-batch job walls.
    BatchExec.par(
      () => pairs.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$storeDir/pairs"),
      () => StoreCompact.appendToBucketedIndex(spark, fpTable,
        newKeys.withColumn("batch_id", lit(batchId)),
        buckets, Seq("key")))
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
      buckets: Int): Unit =
    // r18 optimization (guide §2.6): the pairs dir and the index table
    // are disjoint stores — fold them concurrently inside the same
    // quiesce window.
    BatchExec.par(
      () => StoreCompact.fold(spark, s"$storeDir/pairs", upToBatch)(
        df => df.drop("batch_id").distinct()),
      () => StoreCompact.foldBucketedTable(spark, fpTable, upToBatch,
        keyCol = "doc_id", bucketCols = Seq("key"),
        sortCols = Seq("key"), buckets = buckets,
        evictBelow = evictBelow))

  /** Explode a `(doc_id, f, nf, fp)` frame-fingerprint frame into
    * `(doc_id, f, nf, fp, key)` — one row per 16-bit block key, the
    * [[graft.multimodal.VideoDedup.nearDupVideo]] key convention:
    * `block + (f·blocks + q)·2³²` so only ALIGNED frames collide and
    * key slots never collide across (frame, block) positions. */
  def keyedFrames(frames: DataFrame, blocks: Int = 4): DataFrame = {
    require(blocks > 0 && 64 % blocks == 0, s"blocks must divide 64: $blocks")
    val w = 64 / blocks
    frames.select(col("doc_id"), col("f"), col("nf"), col("fp"),
      explode(array((0 until blocks).map(q =>
        shiftrightunsigned(col("fp"), q * w)
          .bitwiseAND(lit((1L << w) - 1)) +
          lit(q.toLong * 4294967296L) +
          col("f").cast("long") * lit(blocks.toLong * 4294967296L)): _*))
        .as("key"))
  }

  /** One micro-batch over precomputed `(doc_id, f, nf, fp, key)` rows —
    * [[ingestBatch]]'s multi-fingerprint twin: clip-level verified
    * pairs to the pairs log (dynamic partition overwrite), frame keys
    * appended to the bucketed index. */
  def ingestBatchFrames(
      newKeyed: DataFrame,
      storeDir: String,
      fpTable: String,
      maxTotalHamming: Int,
      batchId: Long,
      buckets: Int,
      blocks: Int = 4): Unit = {
    val spark = newKeyed.sparkSession
    if (newKeyed.isEmpty) return
    // materialise the candidate pair set BEFORE spawning the parallel
    // legs: frameCandidates localCheckpoints `cand` eagerly (its head
    // reads the index table), so the store-table read inside it
    // completes strictly before the concurrent append below — the
    // verify aggregation that follows only touches the checkpointed
    // candidates, the frame rows and the (filtered, own-batch-excluded)
    // store slice.
    val pairs = frameCandidates(spark, fpTable, newKeyed, maxTotalHamming,
      batchId, blocks)
    // r18 optimization (guide §2.6): pairs write ∥ index append — same
    // independence argument as [[ingestBatch]].
    BatchExec.par(
      () => pairs.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$storeDir/pairs"),
      () => StoreCompact.appendToBucketedIndex(spark, fpTable,
        newKeyed.withColumn("batch_id", lit(batchId)),
        buckets, Seq("key")))
  }

  /** The per-batch CLIP-level verified pairs `(doc_a, doc_b, hamming)`
    * — candidates from (frame, block) key collisions of new × (store ∪
    * new), verify = [[graft.multimodal.VideoDedup.alignedClipPairs]]
    * (total aligned-frame Hamming ≤ T, frame counts match both sides).
    *
    * Scale shape: the candidate join reads the store side from the
    * catalog table bucketed on exactly the join key (no store-side
    * exchange — the [[candidates]] plan contract); the verify then
    * needs FULL frame sets, but only for candidate-pair docs — `cand`
    * is materialised small (localCheckpoint), its doc set broadcast
    * semi-joins the frame rows, so the verify exchange is O(|candidate
    * docs| · frames), never O(|store|). Frame rows are `distinct`-ed
    * after the semi-join: a replayed append's duplicate index rows
    * would otherwise double-count the Hamming sums (the single-fp
    * path's pair `distinct` collapses them for free; the clip-level
    * aggregation needs it explicit). LATEST-BATCH-WINS (r17 ADVICE): a
    * doc re-ingested with a CHANGED frame set before a fold holds index
    * rows under two batch ids with differing `nf`; the count join in
    * `alignedClipPairs` would fan out over both versions. Frame rows
    * therefore resolve to each doc's highest batch id — the same
    * winner [[StoreCompact.latestWinsPerKey]] picks at the next fold,
    * applied after the candidate semi-join so the resolution costs one
    * aggregation over the (small) candidate frame set, never a pass
    * over the store. Same-content replays are unaffected (same rows,
    * same or replayed batch id → identical survivors). */
  def frameCandidates(
      spark: SparkSession,
      fpTable: String,
      newKeyed: DataFrame,
      maxTotalHamming: Int,
      batchId: Long,
      blocks: Int = 4): DataFrame = {
    require(blocks > 0 && 64 % blocks == 0, s"blocks must divide 64: $blocks")
    // the batch path's completeness guard (VideoDedup.nearDupVideo),
    // r17 ADVICE: per-(frame, block) keys are pigeonhole-complete at the
    // clip radius only while total <= blocks-1 — fail fast here too
    // rather than silently missing pairs
    require(maxTotalHamming <= blocks - 1,
      s"per-frame block keys are complete only for total <= blocks-1: " +
        s"$maxTotalHamming > ${blocks - 1}")
    val store = StoreCompact.liveIndexTable(spark, fpTable).map(t =>
      t.filter(col("batch_id") =!= batchId)
        .select("doc_id", "f", "nf", "fp", "key", "batch_id"))
    val cand = frameCandidatePairs(spark, fpTable, newKeyed, batchId)
      .localCheckpoint(eager = true) // small; read thrice below
    val candDocs = cand.select(col("a").as("doc_id"))
      .unionByName(cand.select(col("b").as("doc_id"))).distinct()
    // one row per (doc, frame): keep key slot q = 0 — key >> 32 =
    // f·blocks + q, so slot = (key >> 32) mod blocks
    def framesOf(df: DataFrame): DataFrame =
      df.filter(pmod(shiftrightunsigned(col("key"), 32), lit(blocks)) === 0)
        .select("doc_id", "f", "nf", "fp", "batch_id")
    val all = store.map(st => framesOf(st).unionByName(
        framesOf(newKeyed.withColumn("batch_id", lit(batchId)))))
      .getOrElse(framesOf(newKeyed.withColumn("batch_id", lit(batchId))))
    val candFrames = all.join(broadcast(candDocs), Seq("doc_id"))
    val latest = candFrames.groupBy("doc_id")
      .agg(max(col("batch_id")).as("batch_id"))
    val frames = candFrames.join(broadcast(latest), Seq("doc_id", "batch_id"))
      .select("doc_id", "f", "nf", "fp").distinct()
    graft.multimodal.VideoDedup.alignedClipPairs(cand,
      frames.select("doc_id", "f", "fp"),
      frames.select("doc_id", "nf").distinct(), maxTotalHamming)
  }

  /** The candidate CLIP pairs `(a, b)` from (frame, block) key
    * collisions of new × (store ∪ new) — the un-materialised head of
    * [[frameCandidates]], exposed for the StreamingSpec plan assert
    * (the store-side scan of the candidate key join carries NO
    * exchange; [[frameCandidates]] checkpoints this frame, so the
    * join is not visible in ITS executed plan). */
  private[graft] def frameCandidatePairs(
      spark: SparkSession,
      fpTable: String,
      newKeyed: DataFrame,
      batchId: Long): DataFrame = {
    val store = StoreCompact.liveIndexTable(spark, fpTable).map(t =>
      t.filter(col("batch_id") =!= batchId)
        .select("doc_id", "f", "nf", "fp", "key"))
    def candOf(ys: DataFrame): DataFrame =
      newKeyed.as("x")
        .join(ys.as("y"),
          col("x.key") === col("y.key") && col("x.doc_id") =!= col("y.doc_id"))
        .select(
          least(col("x.doc_id"), col("y.doc_id")).as("a"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("b"))
    store.map(st => candOf(st).unionByName(candOf(newKeyed)))
      .getOrElse(candOf(newKeyed))
      .distinct()
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
