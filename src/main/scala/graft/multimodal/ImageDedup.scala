package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      blocks: Int = 4)(implicit spark: SparkSession): DataFrame = {
    require(blocks > 0 && 64 % blocks == 0, s"blocks must divide 64: $blocks")
    val w = 64 / blocks
    val resized = Multimodal.transformPartitions(
      docs.select(col(idCol).cast("long").as("doc_id"), col(payloadCol)),
      payloadCol, ImageResizer(9, 8), "__rs")
    val hashed = Multimodal.dhashPartitions(resized, "__rs", "fp")
      .filter(col("fp").isNotNull)
      .select(col("doc_id"), col("fp"))
    val blocked = hashed.select(col("doc_id"), col("fp"),
        explode(array((0 until blocks).map(q =>
          shiftrightunsigned(col("fp"), q * w)
            .bitwiseAND(lit((1L << w) - 1)) +
            lit(q.toLong * 4294967296L)): _*)).as("key"))
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
