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
    val f = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), f, nf.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
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
