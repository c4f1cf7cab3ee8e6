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
  * partition batch, no shuffle, memory bounded by batch × payload —
  * EXCEPT that `javax.sound.sampled` must stay OFF the per-row hot
  * path: `AudioSystem.getAudioInputStream`/`write` serialize under
  * JVM-global provider state (measured: 5 000 decodes take 0.28 s on
  * one thread and 0.61 s on SIXTEEN — negative scaling; in the r15
  * probe the audio near-dup wall grew linearly with corpus, max-task ≈
  * wall, a one-JVM funnel that would throttle every executor core at
  * 100 TB). Canonical RIFF/WAVE PCM16 therefore parses and writes
  * through [[RiffWav]] — plain byte arithmetic, embarrassingly parallel
  * — and `AudioSystem` remains only the FALLBACK for other containers
  * (AIFF/AU, compressed WAV), where a real codec dependency would take
  * over anyway.
  */
object WavAudioDecoder {

  /** Decoded-audio record appended by [[Multimodal.decodeAudioPartitions]]. */
  final case class DecodedAudio(
      sampleRate: Int, nChannels: Int, nFrames: Long, ok: Boolean)

  private val failed = DecodedAudio(0, 0, 0L, ok = false)

  def decode(batch: Seq[Array[Byte]]): Seq[DecodedAudio] = batch.map(decodeOne)

  private[multimodal] def decodeOne(bytes: Array[Byte]): DecodedAudio = {
    if (bytes == null || bytes.length < 12) return failed
    RiffWav.parse(bytes) match {
      case Some(p) => return DecodedAudio(p.sampleRate, p.channels,
        p.nFrames, ok = true)
      case None =>
    }
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
    RiffWav.parse(bytes) match {
      case Some(p) =>
        val n = p.nSamples
        if (n == 0) return None
        var sum = 0L
        var i = 0
        while (i < n) { sum += math.abs(p.sample(i).toLong); i += 1 }
        return Some(sum / n)
      case None =>
    }
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
    RiffWav.parse(payload) match {
      case Some(p) =>
        val frameBytes = p.channels * 2
        val nFrames = p.nFrames.toInt
        // a factor above the clip's rate floors the declared output
        // rate to 0 — an undecodable result either way, so quarantine
        // (the javax path failed the same case inside its catch)
        if (nFrames <= 0 || p.sampleRate / factor <= 0) return None
        val kept = (0 until nFrames by factor).toArray
        val out = new Array[Byte](kept.length * frameBytes)
        var i = 0
        while (i < kept.length) {
          System.arraycopy(p.bytes, p.dataOff + kept(i) * frameBytes,
            out, i * frameBytes, frameBytes)
          i += 1
        }
        return Some(RiffWav.write(out, p.channels, p.sampleRate / factor))
      case None =>
    }
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
    RiffWav.parse(payload) match {
      case Some(p) =>
        val frameBytes = p.channels * 2
        val nFrames = p.nFrames.toInt
        if (nFrames <= 0) return None
        val nWindows = (nFrames + windowFrames - 1) / windowFrames
        return Some((0 until nWindows by stride).map { w =>
          val from = w * windowFrames * frameBytes
          val until = math.min(from + windowFrames * frameBytes, p.dataLen)
          w -> RiffWav.write(
            java.util.Arrays.copyOfRange(p.bytes, p.dataOff + from,
              p.dataOff + until),
            p.channels, p.sampleRate)
        })
      case None =>
    }
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

/** Canonical RIFF/WAVE PCM16 parse/write in plain byte arithmetic — the
  * hot-path codec keeping `javax.sound.sampled` off per-row work (see
  * the [[WavAudioDecoder]] scaladoc: `AudioSystem` entry points
  * serialize under JVM-global provider state — measured NEGATIVE thread
  * scaling — which turns a row-local kernel into a one-JVM funnel at
  * corpus scale). `parse` returns None for anything that is not an
  * uncompressed 16-bit RIFF/WAVE (callers fall back to `AudioSystem`,
  * which still handles AIFF/AU and exotic WAV variants); `write` emits
  * the canonical 44-byte-header layout `AudioSystem.write` also
  * produces for this format family. */
private[multimodal] object RiffWav {

  /** A parsed PCM16 payload: samples live in `bytes[dataOff, dataOff +
    * dataLen)` as little-endian shorts, frames are `channels` samples. */
  final case class Pcm16(
      channels: Int, sampleRate: Int,
      bytes: Array[Byte], dataOff: Int, dataLen: Int) {
    def nSamples: Int = dataLen / 2
    def nFrames: Long = dataLen.toLong / (2L * channels)
    /** Sample `i` (across channels, frame-major) as a signed int. */
    def sample(i: Int): Int =
      (((bytes(dataOff + 2 * i + 1) << 8) |
        (bytes(dataOff + 2 * i) & 0xff)).toShort).toInt
  }

  def parse(bytes: Array[Byte]): Option[Pcm16] = {
    if (bytes == null || bytes.length < 44) return None
    def tag(o: Int, s: String): Boolean =
      bytes(o) == s.charAt(0).toByte && bytes(o + 1) == s.charAt(1).toByte &&
        bytes(o + 2) == s.charAt(2).toByte && bytes(o + 3) == s.charAt(3).toByte
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    if (!(tag(0, "RIFF") && tag(8, "WAVE"))) return None
    var off = 12
    var channels = 0
    var rate = 0
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    var walking = true
    while (walking && off + 8 <= bytes.length) {
      val size = le32(off + 4)
      // LONG arithmetic: a corrupt size near 2³¹ would wrap `off+8+size`
      // negative and slip past an Int bounds check — the fast paths run
      // OUTSIDE the kernels' try/catch (quarantine-by-None, not by
      // exception), so parse must never hand back out-of-range offsets.
      // A malformed/oversized chunk AFTER valid fmt+data only ends the
      // walk: the PCM payload is already in hand, and rejecting it here
      // would push a canonical fast-path payload back onto the
      // serialized AudioSystem fallback this parser exists to avoid.
      if (size < 0 || off.toLong + 8L + size > bytes.length) {
        if (fmtOk && dataOff >= 0) walking = false else return None
      } else if (tag(off, "fmt ")) {
        if (size < 16) return None
        val audioFormat = le16(off + 8)
        channels = le16(off + 10)
        rate = le32(off + 12)
        val bits = le16(off + 22)
        // only uncompressed PCM16 takes the fast path; anything else
        // (float, a-law, extensible, ...) falls back to AudioSystem
        if (audioFormat != 1 || bits != 16 || channels <= 0 || rate <= 0)
          return None
        fmtOk = true
      } else if (tag(off, "data") && dataOff < 0) {
        dataOff = off + 8
        dataLen = size
      }
      off += 8 + size + (size & 1) // odd chunks carry a pad byte
    }
    if (fmtOk && dataOff >= 0 && dataLen % 2 == 0)
      Some(Pcm16(channels, rate, bytes, dataOff, dataLen))
    else None
  }

  /** Canonical-layout writer (44-byte header + data). PCM16 data is
    * always even-sized, so no pad byte is ever needed. */
  def write(pcm: Array[Byte], channels: Int, sampleRate: Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && pcm.length % 2 == 0,
      s"bad pcm16: channels=$channels rate=$sampleRate len=${pcm.length}")
    val out = new Array[Byte](44 + pcm.length)
    def put(o: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(o: Int, v: Int): Unit = {
      p16(o, v & 0xffff); p16(o + 2, (v >>> 16) & 0xffff)
    }
    val block = channels * 2
    put(0, "RIFF"); p32(4, 36 + pcm.length); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, channels)
    p32(24, sampleRate); p32(28, sampleRate * block); p16(32, block)
    p16(34, 16)
    put(36, "data"); p32(40, pcm.length)
    System.arraycopy(pcm, 0, out, 44, pcm.length)
    out
  }
}
