package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IMAGE near-duplicate detection — the multimodal twin of the text
  * SimHash path ([[graft.ext.Dedup.nearDupSimhash]], q36): a perceptual
  * difference hash (dHash — resize to 9×8, grayscale, one gradient bit
  * per horizontally adjacent pixel pair → 64 bits), then Hamming-banded
  * candidates (split the fingerprint into equal-width blocks; by
  * pigeonhole, two fingerprints within Hamming distance `blocks − 1`
  * share at least one block verbatim), exact Hamming verify. The
  * standard near-dup recipe for multimodal corpora (aHash/dHash/pHash
  * family, e.g. Krizhevsky-era image dedup and every large crawl
  * pipeline since) — never all-pairs.
  *
  * Scale shape: decode + resize + hash are row-local partition-batched
  * kernels (no shuffle; the payload column never crosses the wire — only
  * the 8-byte fingerprint does). Candidates come from an equi-join on
  * 16-bit block keys — bucketed, like the text path; the Hamming
  * prefilter is one XOR + popcount per candidate. At 100 TB of images
  * the exchanged state is |corpus| × (id + fingerprint + 4 keys), not
  * pixels.
  */
object ImageDedup {

  /** 64-bit dHash of a decodable raster: per-pixel grayscale (integer
    * mean over bands), bit `y·(w−1)+x` set iff gray(x+1, y) > gray(x, y).
    * None when the payload is undecodable or the gradient grid exceeds
    * 64 bits ((w−1)·h > 64) — feed it the 9×8 [[ImageResizer]] output,
    * which yields exactly 64. Pure integer arithmetic: the DuckDB oracle
    * replays every bit from the fixture formula. */
  def dhash64(bytes: Array[Byte]): Option[Long] =
    ImageResizer.readRaster(bytes).flatMap { case (w, h, bands, sample) =>
      if (w < 2 || (w - 1) * h > 64) None
      else {
        def gray(x: Int, y: Int): Int = {
          var s = 0; var b = 0
          while (b < bands) { s += sample(x, y, b); b += 1 }
          s / bands
        }
        var fp = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w - 1) {
            if (gray(x + 1, y) > gray(x, y))
              fp |= 1L << (y * (w - 1) + x)
            x += 1
          }
          y += 1
        }
        Some(fp)
      }
    }

  /** Near-dup pairs `(doc_a, doc_b, hamming)` with exact Hamming
    * distance ≤ `maxHamming` between dHash fingerprints. Candidates are
    * block-key collisions (complete for hamming ≤ blocks−1 by
    * pigeonhole — pick `blocks = maxHamming + 1`); each block value is
    * offset by `q·2³²` so values from different block positions never
    * collide in the single key column (the
    * [[graft.ext.Dedup.simhashBlocksFromHashes]] convention). */
  def nearDupDHash(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 3,
      blocks: Int = 4)(implicit spark: SparkSession): DataFrame =
    nearDupFromHashes(dhashFrame(docs, idCol, payloadCol), maxHamming, blocks)

  /** [[nearDupDHash]]'s candidate + verify tail over a pre-computed
    * `(doc_id, fp)` frame — lets one decode + hash pass (memoised
    * [[dhashFrame]]) feed several candidate schemes. */
  def nearDupFromHashes(
      hashed: DataFrame,
      maxHamming: Int = 3,
      blocks: Int = 4)(implicit spark: SparkSession): DataFrame = {
    require(blocks > 0 && 64 % blocks == 0, s"blocks must divide 64: $blocks")
    val w = 64 / blocks
    bandedPairs(hashed, maxHamming,
      (0 until blocks).map(q =>
        shiftrightunsigned(col("fp"), q * w)
          .bitwiseAND(lit((1L << w) - 1)) +
          lit(q.toLong * 4294967296L)))
  }

  /** q154's candidate scheme capped: single 16-bit block keys collide by
    * CHANCE at a rate of |corpus|²·blocks/2¹⁶ pairs — negligible at
    * fixture scale, dominant around ~10⁶ images (the measured cap,
    * SCALE_r15 §2). This variant is the documented auxiliary split for
    * that regime: candidates must share TWO of the four 16-bit blocks
    * (the C(4,2) = 6 ordered-pair 32-bit keys), complete for
    * Hamming ≤ 2 by pigeonhole (2 flipped bits corrupt ≤ 2 blocks,
    * leaving ≥ 2 intact — some intact pair i < j matches verbatim),
    * with the chance term down to |corpus|²·6/2³². Same decode + hash
    * pass, same exact-Hamming verify; only the key explode differs. */
  def nearDupDHashCoBucket(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 2)(implicit spark: SparkSession): DataFrame =
    coBucketFromHashes(dhashFrame(docs, idCol, payloadCol), maxHamming)

  /** [[nearDupDHashCoBucket]]'s tail over a pre-computed `(doc_id, fp)`
    * frame (see [[nearDupFromHashes]]). */
  def coBucketFromHashes(
      hashed: DataFrame,
      maxHamming: Int = 2)(implicit spark: SparkSession): DataFrame = {
    require(maxHamming <= 2,
      s"2-of-4 co-bucket keys are complete only for hamming <= 2: $maxHamming")
    def blk(q: Int) =
      shiftrightunsigned(col("fp"), q * 16).bitwiseAND(lit(0xffffL))
    val pairKeys = for {
      q1 <- 0 until 4; q2 <- (q1 + 1) until 4
    } yield blk(q1) * lit(65536L) + blk(q2) +
      lit((q1 * 4 + q2).toLong * 68719476736L) // pair-slot offset 2^36
    bandedPairs(hashed, maxHamming, pairKeys)
  }

  /** 256-bit block-mean perceptual hash of a 16×16 raster (the
    * blockhash / Block Mean Value Hash family, Yang et al. 2006) — the
    * WIDE fingerprint [[nearDupBlockhash]] builds on, and the documented
    * scale path past the 64-bit dHash's 16-bit-key cap: 16 blocks of 16
    * bits keep the pigeonhole guarantee to Hamming ≤ 15 while each key
    * still carries full 16-bit entropy. Bit `y·16 + x` is set iff
    * gray(x, y) exceeds the LOWER MEDIAN (the 128-th smallest of the 256
    * grayscale values — an order statistic, not an average, so the
    * threshold is always an attained integer the DuckDB oracle replays
    * with a rank). Packed little-endian into 4 longs (word k carries
    * bits 64k..64k+63). None when the payload is undecodable or not
    * exactly 16×16 — feed it the [[ImageResizer]](16, 16) output. */
  def blockhash256(bytes: Array[Byte]): Option[Array[Long]] =
    ImageResizer.readRaster(bytes).flatMap { case (w, h, bands, sample) =>
      if (w != 16 || h != 16) None
      else {
        val gray = new Array[Int](256)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            var s = 0; var b = 0
            while (b < bands) { s += sample(x, y, b); b += 1 }
            gray(y * 16 + x) = s / bands
            x += 1
          }
          y += 1
        }
        val sorted = gray.clone()
        java.util.Arrays.sort(sorted)
        val median = sorted(127)
        val fp = new Array[Long](4)
        var p = 0
        while (p < 256) {
          if (gray(p) > median) fp(p >> 6) |= 1L << (p & 63)
          p += 1
        }
        Some(fp)
      }
    }

  /** Near-dup pairs under the 256-bit [[blockhash256]] fingerprint —
    * resize to 16×16, hash, then 16× 16-bit block-key candidates
    * (complete for Hamming ≤ 15 ≥ `maxHamming` by pigeonhole) and an
    * exact 256-bit Hamming verify (4 XOR+popcounts per candidate via
    * `zip_with`). Same wire shape as [[nearDupDHash]] at 4× the
    * fingerprint bytes: the payload never shuffles — only (id, 32-byte
    * fp, 16 keys). */
  def nearDupBlockhash(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 6)(implicit spark: SparkSession): DataFrame = {
    require(maxHamming <= 15,
      s"16 blocks guarantee completeness only to hamming <= 15: $maxHamming")
    val resized = Multimodal.transformPartitions(
      docs.select(col(idCol).cast("long").as("doc_id"), col(payloadCol)),
      payloadCol, ImageResizer(16, 16), "__rs")
    val hashed = Multimodal.blockhashPartitions(resized, "__rs", "fp")
      .filter(col("fp").isNotNull)
      .select(col("doc_id"), col("fp"))
    val keys = (0 until 16).map { q =>
      shiftrightunsigned(element_at(col("fp"), q / 4 + 1), (q % 4) * 16)
        .bitwiseAND(lit(0xffffL)) + lit(q.toLong * 4294967296L)
    }
    val ham = aggregate(
      zip_with(col("x.fp"), col("y.fp"), (a, b) => bit_count(a.bitwiseXOR(b))),
      lit(0L), (acc, v) => acc + v)
    val blocked = hashed.select(col("doc_id"), col("fp"),
        explode(array(keys: _*)).as("key"))
      .localCheckpoint(eager = true) // one decode+hash pass, self-joined
    blocked.as("x").join(blocked.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
      .filter(ham <= maxHamming)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        ham.as("hamming"))
      .distinct()
  }

  /** One resize + dHash pass over a payload column → (doc_id, fp) — the
    * shared front of [[nearDupFromHashes]] / [[coBucketFromHashes]];
    * memoise + checkpoint it when several candidate schemes run over the
    * same corpus. */
  def dhashFrame(docs: DataFrame, idCol: String, payloadCol: String)(
      implicit spark: SparkSession): DataFrame = {
    val resized = Multimodal.transformPartitions(
      docs.select(col(idCol).cast("long").as("doc_id"), col(payloadCol)),
      payloadCol, ImageResizer(9, 8), "__rs")
    Multimodal.dhashPartitions(resized, "__rs", "fp")
      .filter(col("fp").isNotNull)
      .select(col("doc_id"), col("fp"))
  }

  /** Shared candidate-generation + exact-verify tail over a
    * `(doc_id, fp: long)` frame: explode `keyCols` (each a banded view of
    * `fp`, position-offset so different key slots never collide), pin the
    * ONE hash pass with a checkpoint, self-join on the key, verify with
    * one XOR+popcount per candidate. Used by every 64-bit fingerprint
    * family (image dHash, audio energy-delta) — candidates are bucketed,
    * never all-pairs. */
  private[multimodal] def bandedPairs(
      hashed: DataFrame,
      maxHamming: Int,
      keyCols: Seq[Column])(implicit spark: SparkSession): DataFrame = {
    val blocked = hashed.select(col("doc_id"), col("fp"),
        explode(array(keyCols: _*)).as("key"))
      .localCheckpoint(eager = true) // one decode+hash pass, self-joined
    blocked.as("x").join(blocked.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
      .filter(bit_count(col("x.fp").bitwiseXOR(col("y.fp"))) <= maxHamming)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).cast("long")
          .as("hamming"))
      .distinct()
  }
}
