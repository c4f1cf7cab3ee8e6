package graft.multimodal

import java.io.ByteArrayInputStream

/** Pure-JVM nearest-neighbor image resize behind the [[BatchTransformer]]
  * seam — the "resize" leg of the decode / feature-extract / resize /
  * frame-sample quartet, with the same no-new-dependency posture as
  * [[ImageIoDecoder]]: PPM (P6) / PGM (P5) payloads are parsed directly,
  * anything else goes through `javax.imageio` (PNG/BMP/GIF/JPEG readers
  * ship in the JDK). Output is always re-emitted as binary PPM/PGM
  * (3-band inputs → P6, everything else → the first band as P5): a
  * self-describing, codec-free container downstream stages (e.g.
  * [[ImageIoDecoder.meanSample]]) can read back without guessing the
  * source format.
  *
  * Sampling is integer nearest-neighbor — `srcX = x * w / outW` (floor)
  * — deterministic across JVMs (no float rounding, no AWT rescale-op
  * kernels whose coefficients vary by platform), so specs can assert
  * exact output bytes against hand-computed values. Samples are emitted
  * verbatim on the 0–255 scale (a sub-255-maxval PGM keeps its raw
  * values under the canonical 255 header; deeper rasters saturate at
  * 255 rather than alias).
  *
  * Scale shape: per-row CPU inside a partition batch via
  * [[Multimodal.transformPartitions]] — no shuffle, memory bounded by
  * batchSize × (payload + raster). An undecodable payload maps to None
  * (a null output cell), mirroring the decoder's quarantine posture.
  */
final case class ImageResizer(outW: Int, outH: Int) extends BatchTransformer {
  require(outW > 0 && outH > 0, s"resize target must be positive: $outW x $outH")

  def transform(batch: Seq[Array[Byte]]): Seq[Option[Array[Byte]]] =
    batch.map(resizeOne)

  private def resizeOne(bytes: Array[Byte]): Option[Array[Byte]] =
    ImageResizer.readRaster(bytes).map { case (w, h, bands, sample) =>
      val outBands = if (bands >= 3) 3 else 1
      val header = (if (outBands == 3) "P6" else "P5") +
        s"\n$outW $outH\n255\n"
      val hb = header.getBytes("US-ASCII")
      val out = new Array[Byte](hb.length + outW * outH * outBands)
      System.arraycopy(hb, 0, out, 0, hb.length)
      var i = hb.length
      var y = 0
      while (y < outH) {
        val sy = y * h / outH
        var x = 0
        while (x < outW) {
          val sx = x * w / outW
          var b = 0
          while (b < outBands) {
            // 8-bit samples pass through exactly; a deeper raster (e.g. a
            // 16-bit PNG) saturates at 255 instead of aliasing mod 256
            val s = sample(sx, sy, b)
            out(i) = (if (s > 255) 255 else if (s < 0) 0 else s).toByte
            i += 1
            b += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }
}

object ImageResizer {
  /** Uniform raster access over both decode paths: returns
    * (width, height, bands, sample(x, y, band) → 0..255) or None for
    * undecodable bytes. PPM/PGM reads samples straight out of the
    * payload array; other formats materialise a BufferedImage raster. */
  private[multimodal] def readRaster(
      bytes: Array[Byte]): Option[(Int, Int, Int, (Int, Int, Int) => Int)] = {
    if (bytes == null || bytes.length < 2) return None
    if (bytes(0) == 'P' && (bytes(1) == '6' || bytes(1) == '5'))
      return ImageIoDecoder.ppmHeader(bytes).collect {
        case (w, h, bands, off) if off + w.toLong * h * bands <= bytes.length =>
          (w, h, bands,
            (x: Int, y: Int, b: Int) => bytes(off + (y * w + x) * bands + b) & 0xff)
      }
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else img.getColorModel match {
        // Indexed-color rasters (GIF always; palette PNG/BMP) store PALETTE
        // INDICES as their one band — Raster.getSample would silently emit
        // indices as intensities. Resolve through the color model to true
        // sRGB channels instead (3 bands, R/G/B by shift).
        case _: java.awt.image.IndexColorModel =>
          Some((img.getWidth, img.getHeight, 3,
            (x: Int, y: Int, b: Int) => (img.getRGB(x, y) >>> ((2 - b) * 8)) & 0xff))
        case _ =>
          val r = img.getRaster
          Some((r.getWidth, r.getHeight, r.getNumBands,
            (x: Int, y: Int, b: Int) => r.getSample(x, y, b)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
