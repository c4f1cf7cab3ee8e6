package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** The AUDIO modality behind the same seams as the image quartet, with
  * the same no-new-dependency posture: `javax.sound.sampled` ships
  * readers/writers for WAV (plus AIFF/AU) in the JDK, so audio clips
  * travel as opaque binary payloads and decode / feature-extract /
  * window-sample are real kernels, not stubs.
  *
  *  - decode: [[WavAudioDecoder]] → `(sample_rate, n_channels, n_frames,
  *    ok)` via [[Multimodal.decodeAudioPartitions]] — header-accurate
  *    metadata, quarantine-don't-throw like [[ImageIoDecoder]].
  *  - feature-extract: [[WavAudioDecoder.meanAbsAmplitude]] — the mean
  *    |sample| of 16-bit PCM as an EXACT integer (long sum, floor
  *    division; no float anywhere), the audio twin of
  *    [[ImageIoDecoder.meanSample]]'s pixel mean and the house's
  *    hash-friendly arithmetic.
  *  - window-sample: [[WavWindowSampler]] implements the SAME
  *    [[FrameSampler]] seam the video leg uses — a clip explodes into
  *    every `stride`-th window of `windowFrames` frames, each re-emitted
  *    as a STANDALONE WAV payload (self-describing, feeds back into this
  *    decoder), through [[Multimodal.sampleFramesPartitions]] unchanged.
  *    The emitted index is the ORIGINAL window ordinal, so
  *    `idx · windowFrames / sample_rate` recovers the clip timestamp.
  *
  * Scale shape: identical to the image kernels — per-row CPU inside a
  * partition batch, no shuffle, memory bounded by batch × payload.
  */
object WavAudioDecoder {

  /** Decoded-audio record appended by [[Multimodal.decodeAudioPartitions]]. */
  final case class DecodedAudio(
      sampleRate: Int, nChannels: Int, nFrames: Long, ok: Boolean)

  private val failed = DecodedAudio(0, 0, 0L, ok = false)

  def decode(batch: Seq[Array[Byte]]): Seq[DecodedAudio] = batch.map(decodeOne)

  private[multimodal] def decodeOne(bytes: Array[Byte]): DecodedAudio = {
    if (bytes == null || bytes.length < 12) return failed
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        DecodedAudio(f.getSampleRate.toInt, f.getChannels,
          ais.getFrameLength, ok = true)
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => failed }
  }

  /** Mean |sample| over ALL channels of a 16-bit signed PCM payload, as
    * an exact integer (floor of the long sum over the sample count) —
    * deterministic across JVMs, so specs assert exact values. None for
    * undecodable payloads or encodings other than 16-bit signed PCM
    * (compressed or float encodings need a real codec's arithmetic). */
  def meanAbsAmplitude(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16) return None
        val data = ais.readAllBytes()
        val n = data.length / 2
        if (n == 0) return None
        var sum = 0L
        var i = 0
        while (i + 1 < data.length) {
          val s =
            if (f.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
            else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
          sum += math.abs(s.toLong)
          i += 2
        }
        Some(sum / n)
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}

/** Audio resampling through the [[BatchTransformer]] seam — the audio
  * twin of [[ImageResizer]]: integer DECIMATION (keep every `factor`-th
  * frame, all channels, declared sample rate divided by `factor`),
  * deterministic in exact arithmetic like the image path's floor
  * mapping — no interpolation kernel whose coefficients could vary by
  * platform, so specs assert exact output samples. Output is re-emitted
  * as a standalone WAV ([[WavAudioDecoder]] reads it back). A payload
  * that is not 16-bit signed PCM maps to None (the NULL-quarantine
  * cell in [[Multimodal.transformPartitions]]).
  *
  * Decimation without a low-pass is aliasing-prone on full-band signals
  * — acceptable for the fingerprint/feature pipelines this feeds, and
  * the documented trade for bit-exact determinism; an anti-aliased
  * variant plugs in behind the same seam with a real DSP dependency. */
final case class WavResampler(factor: Int) extends BatchTransformer {
  require(factor > 0, s"factor must be positive: $factor")

  def transform(batch: Seq[Array[Byte]]): Seq[Option[Array[Byte]]] =
    batch.map(resampleOne)

  private def resampleOne(payload: Array[Byte]): Option[Array[Byte]] = {
    if (payload == null || payload.length < 12) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16) return None
        val data = ais.readAllBytes()
        val frameBytes = f.getFrameSize
        val nFrames = data.length / frameBytes
        if (nFrames <= 0) return None
        val kept = (0 until nFrames by factor).toArray
        val out = new Array[Byte](kept.length * frameBytes)
        var i = 0
        while (i < kept.length) {
          System.arraycopy(data, kept(i) * frameBytes, out, i * frameBytes, frameBytes)
          i += 1
        }
        val nf = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate / factor, 16, f.getChannels, frameBytes,
          f.getFrameRate / factor, f.isBigEndian)
        val bos = new ByteArrayOutputStream()
        AudioSystem.write(
          new AudioInputStream(
            new ByteArrayInputStream(out), nf, kept.length),
          AudioFileFormat.Type.WAVE, bos)
        Some(bos.toByteArray)
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}

/** Audio window sampling through the [[FrameSampler]] seam: every
  * `stride`-th window of `windowFrames` frames becomes a standalone WAV
  * payload carrying its ORIGINAL window ordinal. A trailing partial
  * window is emitted as-is (its decoder `n_frames` reports the true
  * remainder); a payload that is not 16-bit signed PCM — or not audio at
  * all — maps to None (the NULL-quarantine row). */
final case class WavWindowSampler(windowFrames: Int, stride: Int)
    extends FrameSampler {
  require(windowFrames > 0, s"windowFrames must be positive: $windowFrames")
  require(stride > 0, s"stride must be positive: $stride")

  def sample(payload: Array[Byte]): Option[Seq[(Int, Array[Byte])]] = {
    if (payload == null || payload.length < 12) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16) return None
        val data = ais.readAllBytes()
        val frameBytes = f.getFrameSize
        val nFrames = data.length / frameBytes
        if (nFrames <= 0) return None
        val nWindows = (nFrames + windowFrames - 1) / windowFrames
        Some((0 until nWindows by stride).map { w =>
          val from = w * windowFrames * frameBytes
          val until = math.min(from + windowFrames * frameBytes, data.length)
          val slice = java.util.Arrays.copyOfRange(data, from, until)
          val out = new ByteArrayOutputStream()
          val sliceAis = new AudioInputStream(
            new ByteArrayInputStream(slice), f, slice.length / frameBytes)
          AudioSystem.write(sliceAis, AudioFileFormat.Type.WAVE, out)
          w -> out.toByteArray
        })
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
