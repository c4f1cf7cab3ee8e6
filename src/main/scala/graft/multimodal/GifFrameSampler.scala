package graft.multimodal

import java.io.ByteArrayInputStream

/** Frame sampling for multi-frame media — the fourth leg of the decode /
  * feature-extract / resize / frame-sample quartet, made REAL with the
  * same no-new-dependency posture as [[ImageIoDecoder]]: animated GIF is
  * the one multi-frame container the JDK reads natively
  * (`javax.imageio`'s GIF reader exposes the frame sequence through
  * `getNumImages` / `read(i)`), so a "video" clip travels as one GIF
  * payload and every `stride`-th frame comes back as a standalone P6 PPM
  * payload — the codec-free container the rest of the pipeline
  * ([[ImageIoDecoder]], [[ImageResizer]]) already reads. Emitted pairs
  * carry the ORIGINAL frame index, so downstream timing math
  * (`frame_idx / fps`) survives the sampling.
  *
  * Frames are emitted as stored: GIF animations may encode delta frames
  * (sub-rectangles + a disposal method) which a player composites over
  * the previous canvas; compositing is presentation logic, not sampling,
  * so a delta frame surfaces as its stored rectangle. Full-frame
  * animations (the training-corpus normal form for extracted clips)
  * round-trip exactly. Palette indices resolve through `getRGB` — the
  * same IndexColorModel rule as [[ImageResizer]] (a GIF raster's one
  * band holds palette indices, not intensities).
  *
  * An undecodable or non-GIF payload maps to None (a quarantine row in
  * [[Multimodal.sampleFramesPartitions]]), never an exception.
  */
final case class GifFrameSampler(stride: Int) extends FrameSampler {
  require(stride > 0, s"stride must be positive: $stride")

  def sample(payload: Array[Byte]): Option[Seq[(Int, Array[Byte])]] = {
    if (payload == null || payload.length < 6) return None
    if (!(payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F')) return None
    try {
      val iis = javax.imageio.ImageIO
        .createImageInputStream(new ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        if (n <= 0) None
        else Some((0 until n by stride).map { i =>
          i -> GifFrameSampler.toPpm(reader.read(i))
        })
      } finally { reader.dispose(); iis.close() }
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}

object GifFrameSampler {
  /** Re-encode a decoded frame as binary P6 PPM, resolving any color
    * model (indexed palettes included) through `getRGB` to true sRGB
    * channels. */
  private[multimodal] def toPpm(img: java.awt.image.BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val hb = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hb.length + w * h * 3)
    System.arraycopy(hb, 0, out, 0, hb.length)
    var i = hb.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(i) = ((rgb >>> 16) & 0xff).toByte
        out(i + 1) = ((rgb >>> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    out
  }
}
