package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Deterministic binary media FIXTURES — the audio/video twin of
  * [[Multimodal.withPayload]]: the test corpus carries no media table, so
  * each `doc_id` deterministically synthesises a REAL container payload
  * (a RIFF/WAVE clip, an animated GIF) whose decoded features are pure
  * integer arithmetic over the id. That puts the actual JDK decode
  * kernels ([[WavAudioDecoder]], [[GifFrameSampler]],
  * [[ImageIoDecoder]]) under the DuckDB CORRECTNESS gate: Spark
  * round-trips id → container bytes → decode → features, the oracle
  * replays the closed-form feature arithmetic from the id alone, and the
  * two must hash-match. With a real corpus this file disappears — the
  * ingest mapping supplies payloads and the same downstream pipeline
  * runs unchanged.
  *
  * Fixture formulas (the oracle's contract, all exact integer math):
  *
  * WAV (16-bit signed PCM mono, 8000 Hz, little-endian):
  *   n_frames  nf = 50 + id % 50
  *   sample_i  s(i) = ((id·31 + i·7) mod 65536) − 32768,  i ∈ [0, nf)
  *
  * GIF (nfr solid full-size frames, explicit 1-bit palette per frame so
  * the encoder stores the EXACT color — no quantisation):
  *   width  w = 3 + id % 5,  height h = 2 + id % 3,  frames nfr = 2 + id % 5
  *   frame f color:  r = (id·7 + f·13) mod 256,  g = (id·11 + f·17) mod 256,
  *     b = b₀ − ((r + g + b₀) mod 3) adjusted by +3 if negative, where
  *     b₀ = (id·13 + f·19) mod 256  —  so r+g+b ≡ 0 (mod 3) and the
  *     per-pixel band mean (r+g+b)/3 is an exact integer-valued double.
  *
  * Scale shape: per-row CPU inside a partition batch (same
  * `mapPartitions` shape as every [[Multimodal]] seam), no shuffle;
  * payload size is O(100) samples / O(10²) pixels per row.
  */
object MediaSynth {

  /** Append a synthetic WAV `payload` column derived from `idCol`. */
  def withWavPayload(df: DataFrame, idCol: String,
      outCol: String = "payload")(implicit spark: SparkSession): DataFrame =
    withSynth(df, idCol, outCol, wavFixture)

  /** Append a synthetic animated-GIF `payload` column derived from
    * `idCol`. */
  def withGifPayload(df: DataFrame, idCol: String,
      outCol: String = "payload")(implicit spark: SparkSession): DataFrame =
    withSynth(df, idCol, outCol, gifFixture)

  /** Append a synthetic grayscale-PGM `payload` column derived from
    * `idCol` — the IMAGE NEAR-DUP fixture (see [[pgmFixture]]). */
  def withPgmPayload(df: DataFrame, idCol: String,
      outCol: String = "payload")(implicit spark: SparkSession): DataFrame =
    withSynth(df, idCol, outCol, pgmFixture)

  private def withSynth(df: DataFrame, idCol: String, outCol: String,
      synth: Long => Array[Byte])(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map(row => Row.fromSeq(row.toSeq :+ synth(row.getLong(idIdx))))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** The grayscale-PGM fixture for one id — real P5 bytes with GROUP
    * structure, so the image near-dup path has true positives to find:
    * ids sharing `g = id div 3` render the SAME cell pattern at
    * group-dependent resolutions (w = 9·(1 + g mod 3),
    * h = 8·(1 + g mod 2) — multiples of the 9×8 dHash target, so
    * nearest-neighbor resize picks cell corners exactly), plus a sparse
    * per-ID bump that perturbs a few pixels:
    *
    *   cell(x, y) = ((g·31 + cx² + cx·(7 + g mod 11) + cy·(13 + g mod 13))
    *                 mod 14)·16 + 8
    *     with cx = x·9 div w, cy = y·8 div h    (values 8..216)
    *   bump(x, y) = 7  iff (id·131 + x·17 + y·23) mod 19 = 0   else 0
    *
    * The (g mod 11) / (g mod 13) coefficients matter: a pattern built
    * from g mod 14 alone aliases every 14th group into the SAME motif
    * (measured: 85 distinct fingerprints over 500 docs — 7 % of ALL
    * pairs came out "near-dup"), so the full pattern period is
    * lcm(14, 11, 13) = 2002 groups — beyond any fixture SF, no aliased
    * motifs anywhere. The horizontal cell shift is
    * (2·cx + 8 + g mod 11) mod 14 — zero on at most one column (equal
    * adjacent cells: the bump decides those gradient bits; groups whose
    * shift never vanishes simply yield exact-duplicate fingerprints)
    * and otherwise ≥ 1 (cells ≥ 16 apart: a 7-bump can never flip
    * them) — so same-group ids land within a few bits of each other
    * (near-dups) while different groups decorrelate far beyond any sane
    * Hamming radius. Every number is exact integer arithmetic the
    * DuckDB oracle replays from the id alone. */
  private[graft] def pgmFixture(id: Long): Array[Byte] = {
    val g = id / 3
    val w = (9 * (1 + g % 3)).toInt
    val h = (8 * (1 + g % 2)).toInt
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cx = x * 9 / w
        val cy = y * 8 / h
        val cell = ((g * 31 + cx * cx + cx * (7 + g % 11) +
          cy * (13 + g % 13)) % 14).toInt * 16 + 8
        val bump = if ((id * 131 + x * 17 + y * 23) % 19 == 0) 7 else 0
        out(i) = (cell + bump).toByte
        i += 1
        x += 1
      }
      y += 1
    }
    out
  }

  /** `((mix(g, p)² mod M)² mod M)` — the DOUBLE-squared [[graft.learn.DetRandom]]
    * mix, the exact-integer avalanche step behind the fine-grained media
    * fixtures ([[pgmFineFixture]], [[wavMotifFixture]]). The mix alone is
    * AFFINE in (g, p): two groups' whole patterns differ by one constant
    * mod-M shift, so pairs whose shift is small (e.g. g-delta 137 maps to
    * −23 mod M) come out near-identical mod small quantisers — measured
    * as cross-group fingerprint collisions at Hamming ≤ 1. One squaring
    * amplifies a small shift δ to a value-dependent 2vδ; the second
    * squaring scrambles that across the modulus (collision buckets drop
    * to chance shape, measured 9-doc max at 5 k docs). All intermediates
    * < 1.2·10¹⁸ < 2⁶³, and the DuckDB oracle replays it verbatim via
    * [[graft.learn.DetRandom.mixSql]] + two `(x*x) % M` hops. */
  private[graft] def mixSq2(g: Long, p: Long): Long = {
    val m = graft.learn.DetRandom.M
    val v = graft.learn.DetRandom.mixLong(g, p, 42L)
    val v2 = v * v % m
    v2 * v2 % m
  }

  /** The double-squaring stage of [[mixSq2]] as ANSI SQL text over an
    * already-computed mix column `u` (oracle parity — the
    * [[graft.learn.DetRandom.mixSql]] convention; every fixture oracle
    * computes `u = mixSql(...)` in a CTE and then applies this, so the
    * modulus and the squaring shape live in ONE place). */
  private[graft] def sq2Sql(u: String): String = {
    val m = graft.learn.DetRandom.M
    s"(((($u*$u) % $m) * (($u*$u) % $m)) % $m)"
  }

  /** Append the FINE-grained PGM payload (see [[pgmFineFixture]]) — the
    * wide-perceptual-hash near-dup fixture. */
  def withPgmFinePayload(df: DataFrame, idCol: String,
      outCol: String = "payload")(implicit spark: SparkSession): DataFrame =
    withSynth(df, idCol, outCol, pgmFineFixture)

  /** Append the group-structured WAV payload (see [[wavMotifFixture]]) —
    * the AUDIO near-dup fixture. */
  def withWavMotifPayload(df: DataFrame, idCol: String,
      outCol: String = "payload")(implicit spark: SparkSession): DataFrame =
    withSynth(df, idCol, outCol, wavMotifFixture)

  /** The FINE-grained grayscale-PGM fixture for one id — the wide-hash
    * twin of [[pgmFixture]]. [[pgmFixture]]'s 9×8-cell motifs are too
    * coarse for a 256-bit hash: any 16-pixel row drawn from ≤ 9 cells has
    * only a few hundred realisable above/below-median profiles, so
    * 16-bit block keys collide STRUCTURALLY (measured 2.2 M candidate
    * pairs at 5 k docs — quadratic-shaped buckets of 126 docs). Here the
    * cell grid is 16×16 — one cell per sampled pixel of a 16×16 resize —
    * and each cell level is full-entropy via [[mixSq2]]:
    *
    *   w = 16·(1 + g mod 3),  h = 16·(1 + g mod 2),  g = id div 3
    *   cell(x, y) = (mixSq2(g, cy·16 + cx) mod 17)·12 + 8
    *     with cx = x·16 div w, cy = y·16 div h      (values 8..200)
    *   bump(x, y) = 7  iff (id·131 + x·17 + y·23) mod 19 = 0   else 0
    *
    * The quantiser is 17 (PRIME > 16): a composite or ≤ 16 modulus lets
    * (cy+1)-style row terms vanish on the row that hits a multiple —
    * measured as one 154-variant row per image and ~80-doc key buckets.
    * Same-group ids share every cell (near-dups, Hamming ≤ 8 from bumps
    * alone — level spacing 12 > bump 7, so a bump only flips a bit at an
    * exact median tie); different groups decorrelate to Hamming ~128.
    * Dims are exact multiples of 16, so the 16×16 nearest-neighbor
    * resize lands on cell corners and the DuckDB oracle replays every
    * pixel from the id alone. */
  private[graft] def pgmFineFixture(id: Long): Array[Byte] = {
    val g = id / 3
    val w = (16 * (1 + g % 3)).toInt
    val h = (16 * (1 + g % 2)).toInt
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < h) {
      val cy = y * 16 / h
      var x = 0
      while (x < w) {
        val cx = x * 16 / w
        val cell = (mixSq2(g, cy * 16L + cx) % 17).toInt * 12 + 8
        val bump = if ((id * 131 + x * 17 + y * 23) % 19 == 0) 7 else 0
        out(i) = (cell + bump).toByte
        i += 1
        x += 1
      }
      y += 1
    }
    out
  }

  /** The GROUP-STRUCTURED WAV fixture for one id — the audio near-dup
    * twin of [[pgmFineFixture]]: ids sharing `g = id div 3` render the
    * SAME per-frame amplitude envelope, plus a sparse per-id bump, so an
    * energy-delta fingerprint ([[AudioDedup.energyDeltaFp64]]) finds
    * same-group clips within a few bits and different groups ~32 bits
    * apart. 65 frames of 125 samples each (8 125 samples, 16-bit PCM
    * mono 8 000 Hz ≈ 1 s); frame `f`'s samples alternate +A, −A with
    *
    *   A(f) = (mixSq2(g, f) mod 14)·1024 + 512 + bump(id, f)
    *   bump(id, f) = 7  iff (id·131 + f·17) mod 19 = 0   else 0
    *
    * so the windowed mean |sample| over one 125-frame window is EXACTLY
    * A(f) (odd window length, |±A| = A; 125·A div 125 = A) — the decoded
    * energy curve is closed-form integer arithmetic the DuckDB oracle
    * replays from the id alone. Amplitude spacing 1024 ≫ bump 7: a bump
    * flips a delta bit only at an exact envelope tie, bounding same-group
    * Hamming (measured ≤ 4 at 5 k docs) the way [[pgmFineFixture]]'s
    * level spacing does. */
  private[graft] def wavMotifFixture(id: Long): Array[Byte] = {
    val g = id / 3
    val frames = 65
    val spf = 125
    val pcm = new Array[Byte](frames * spf * 2)
    var f = 0
    var i = 0
    while (f < frames) {
      val amp = (mixSq2(g, f.toLong) % 14).toInt * 1024 + 512 +
        (if ((id * 131 + f * 17) % 19 == 0) 7 else 0)
      var j = 0
      while (j < spf) {
        val s = (if (j % 2 == 0) amp else -amp).toShort
        pcm(2 * i) = s.toByte
        pcm(2 * i + 1) = (s >> 8).toByte
        i += 1
        j += 1
      }
      f += 1
    }
    // plain-byte writer: AudioSystem.write serializes under JVM-global
    // provider state (see the WavAudioDecoder scaladoc)
    RiffWav.write(pcm, channels = 1, sampleRate = 8000)
  }

  /** Append the group-structured animated-GIF payload (see
    * [[gifMotifFixture]]) — the VIDEO near-dup fixture. */
  def withGifMotifPayload(df: DataFrame, idCol: String,
      outCol: String = "payload")(implicit spark: SparkSession): DataFrame =
    withSynth(df, idCol, outCol, gifMotifFixture)

  /** The GROUP-STRUCTURED animated-GIF fixture for one id — the video
    * near-dup twin of [[pgmFineFixture]]/[[wavMotifFixture]]: ids
    * sharing `g = id div 3` render the SAME patterned frame sequence
    * plus a sparse per-id bump. Frames are 9×8 GRAYSCALE rasters (the
    * dHash-native size — no resize leg, the frame-sampling leg is what
    * this fixture certifies) stored through an 8-bit identity-ramp
    * palette, so the GIF holds every pixel value EXACTLY (an indexed
    * image with an explicit local color table — no quantisation):
    *
    *   frames nfr = 4 + 2·(g mod 2)            (4 or 6)
    *   px(f, x, y) = (mixSq2(g, f·72 + y·9 + x) mod 17)·12 + 8 + bump
    *   bump(id, f, x, y) = 7  iff (id·131 + f·37 + x·17 + y·23) mod 19 = 0
    *
    * Same-group clips differ only in bumps (frame-dHash totals ≤ 8 over
    * the sampled frames, measured at 5 k docs); different groups
    * decorrelate to ~32 bits per frame. Every pixel is exact integer
    * arithmetic the DuckDB oracle replays from the id alone. */
  private[graft] def gifMotifFixture(id: Long): Array[Byte] = {
    val g = id / 3
    val w = 9
    val h = 8
    val nfr = (4 + 2 * (g % 2)).toInt
    // identity grayscale ramp: palette index i IS the gray value
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nfr).foreach { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val cell = (mixSq2(g, f * 72L + y * 9 + x) % 17).toInt * 12 + 8
          val bump =
            if ((id * 131 + f * 37 + x * 17 + y * 23) % 19 == 0) 7 else 0
          raster.setSample(x, y, 0, cell + bump)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** The WAV fixture for one id — real RIFF/WAVE bytes via
    * `javax.sound.sampled`, decodable by [[WavAudioDecoder]]. */
  private[graft] def wavFixture(id: Long): Array[Byte] = {
    val nf = (50 + id % 50).toInt
    val pcm = new Array[Byte](nf * 2)
    var i = 0
    while (i < nf) {
      val s = (((id * 31 + i * 7) % 65536) - 32768).toShort
      pcm(2 * i) = s.toByte
      pcm(2 * i + 1) = (s >> 8).toByte
      i += 1
    }
    RiffWav.write(pcm, channels = 1, sampleRate = 8000)
  }

  /** The (r, g, b) of GIF frame `f` for one id — mod-3-adjusted so the
    * band mean is an exact integer. */
  private[graft] def gifColor(id: Long, f: Int): (Int, Int, Int) = {
    val r = ((id * 7 + f * 13) % 256).toInt
    val g = ((id * 11 + f * 17) % 256).toInt
    val b0 = ((id * 13 + f * 19) % 256).toInt
    val badj = b0 - ((r + g + b0) % 3)
    val b = if (badj < 0) badj + 3 else badj
    (r, g, b)
  }

  /** The animated-GIF fixture for one id: `nfr` solid frames, each a
    * 1-bit indexed image whose 2-entry palette leads with the exact frame
    * color (GIF stores explicit palettes verbatim — no quantisation). */
  private[graft] def gifFixture(id: Long): Array[Byte] = {
    val w = (3 + id % 5).toInt
    val h = (2 + id % 3).toInt
    val nfr = (2 + id % 5).toInt
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nfr).foreach { f =>
      val (r, g, b) = gifColor(id, f)
      val icm = new java.awt.image.IndexColorModel(1, 2,
        Array(r.toByte, 0.toByte), Array(g.toByte, 0.toByte),
        Array(b.toByte, 0.toByte))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
      // a fresh raster is zero-filled: every pixel is palette index 0,
      // i.e. the frame color — no per-pixel writes needed
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    bos.toByteArray
  }
}
