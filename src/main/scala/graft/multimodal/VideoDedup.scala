package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VIDEO near-duplicate detection — the fourth modality next to text
  * (q34/q36), image (q154/q156/q158) and audio (q157): the standard
  * clip-dedup recipe of frame-level perceptual hashes plus temporal
  * alignment. A clip explodes into sampled frames
  * ([[GifFrameSampler]] through [[Multimodal.sampleFramesPartitions]] —
  * the q105 seam), each sampled frame gets a 64-bit dHash
  * ([[ImageDedup.dhash64]] — the q154 kernel), and two clips are
  * near-dups when they sample the SAME frame count and the total
  * Hamming distance over ALIGNED frames is ≤ `maxTotalHamming`.
  *
  * Candidates come from (frame index, 16-bit block) key collisions:
  * a clip-pair total ≤ T means SOME aligned frame pair is within
  * Hamming ≤ T, and with T ≤ blocks − 1 that frame shares a block
  * verbatim (pigeonhole) — so the per-frame banded key is complete for
  * the CLIP-level verdict at the same radius as q154's per-image one.
  * The verify is exact: join the two clips' aligned frame fingerprints,
  * sum XOR popcounts, and require every sampled frame to have matched
  * (clips with different frame counts can never pair — alignment is the
  * semantic, not a prefix match).
  *
  * Scale shape: decode + sample + hash are row-local partition-batched
  * kernels (frame payloads never shuffle — fan-out happens inside the
  * partition and only (id, frame_idx, 8-byte fp) rows leave it); the
  * candidate join moves |corpus| × sampled-frames × 4 keys; the verify
  * join moves fingerprints for candidate pairs only. At 100 TB of video
  * the exchanged state is the fingerprint ledger, not pixels.
  */
object VideoDedup {

  /** Near-dup clip pairs `(doc_a, doc_b, hamming)` where `hamming` is
    * the total over aligned sampled frames, ≤ `maxTotalHamming`, and
    * both clips sampled the same frame count. Frames whose dHash is
    * NULL (undecodable / over-wide) leave that clip's frame count, so a
    * degraded clip can only pair with an identically-degraded one —
    * totals never silently shrink against a full clip. */
  def nearDupVideo(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      stride: Int = 2,
      maxTotalHamming: Int = 3,
      blocks: Int = 4)(implicit spark: SparkSession): DataFrame = {
    require(blocks > 0 && 64 % blocks == 0, s"blocks must divide 64: $blocks")
    require(maxTotalHamming <= blocks - 1,
      s"per-frame block keys are complete only for total <= blocks-1: " +
        s"$maxTotalHamming > ${blocks - 1}")
    val w = 64 / blocks
    val frames = Multimodal.sampleFramesPartitions(
      docs.select(col(idCol).cast("long").as("doc_id"), col(payloadCol)),
      payloadCol, GifFrameSampler(stride), "__frame", "f")
    val fps = Multimodal.dhashPartitions(frames, "__frame", "fp")
      .filter(col("fp").isNotNull)
      .select(col("doc_id"), col("f"), col("fp"))
      .localCheckpoint(eager = true) // one decode+sample+hash pass
    val counts = fps.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    // (frame, block) keys: the frame index rides the key so only
    // ALIGNED frames collide; block slot offset keeps slots disjoint
    val blocked = fps.select(col("doc_id"), col("f"), col("fp"),
      explode(array((0 until blocks).map(q =>
        shiftrightunsigned(col("fp"), q * w)
          .bitwiseAND(lit((1L << w) - 1)) +
          lit(q.toLong * 4294967296L) +
          col("f").cast("long") * lit(blocks.toLong * 4294967296L)): _*))
        .as("key"))
    val cand = blocked.as("x").join(blocked.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    alignedClipPairs(cand, fps, counts, maxTotalHamming)
  }

  /** The exact CLIP-level verify shared by this batch path (q159) and
    * the streaming video family ([[graft.streaming.VideoIngest]] via
    * [[graft.streaming.FpIngest.frameCandidates]]) — one implementation
    * of the aligned-frame semantics, never a diverging copy (the
    * [[graft.streaming.FpIngest]] extraction pattern). `cand` carries
    * candidate doc pairs `(a, b)`; `frames` one row per sampled frame
    * `(doc_id, f, fp)`; `counts` the per-clip sampled-frame count
    * `(doc_id, nf)`. A pair survives iff every sampled frame of BOTH
    * clips matched an aligned partner (`matched = nf_a = nf_b`) and the
    * total Hamming over aligned frames is ≤ `maxTotalHamming`.
    *
    * Scale shape: the frame joins move fingerprints for candidate-pair
    * docs only (callers pre-filter `frames`/`counts` to candidate docs
    * where the corpus is a store, not a batch); the aggregation is one
    * hash exchange on `(a, b)`. */
  private[graft] def alignedClipPairs(
      cand: DataFrame,
      frames: DataFrame,
      counts: DataFrame,
      maxTotalHamming: Int): DataFrame = {
    val verified = cand
      .join(frames.as("fa"), col("a") === col("fa.doc_id"))
      .join(frames.as("fb"),
        col("b") === col("fb.doc_id") && col("fa.f") === col("fb.f"))
      .groupBy(col("a"), col("b"))
      .agg(
        sum(bit_count(col("fa.fp").bitwiseXOR(col("fb.fp"))).cast("long"))
          .as("hm"),
        count(lit(1)).as("matched"))
    verified
      .join(counts.as("ca"), col("a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("b") === col("cb.doc_id"))
      .filter(col("hm") <= maxTotalHamming &&
        col("matched") === col("ca.nf") && col("matched") === col("cb.nf"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("hm").as("hamming"))
  }
}
