package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AUDIO near-duplicate detection — the audio twin of the image dHash
  * path ([[ImageDedup.nearDupDHash]], q154), closing the multimodal
  * dedup triangle (text q34/q36, image q154/q156, audio here): a 64-bit
  * ENERGY-DELTA fingerprint in the Haitsma–Kalker (2002) robust-audio-
  * fingerprint family — per-window energy, one sign-of-change bit per
  * adjacent window pair — then the same Hamming-banded candidate
  * machinery ([[ImageDedup.bandedPairs]]: 4× 16-bit block keys,
  * pigeonhole-complete for Hamming ≤ 3, exact XOR+popcount verify).
  *
  * The published fingerprint thresholds energy DIFFERENCES across both
  * time and frequency bands after an FFT; the frequency axis needs a
  * real DSP dependency, so this kernel keeps the time axis only —
  * windowed mean-|sample| deltas — which is exact integer arithmetic
  * end-to-end (the house rule: every bit replayable by the DuckDB
  * oracle). A banded variant plugs in behind the same seam with an FFT
  * library.
  *
  * Scale shape: decode + window energies + fingerprint are row-local
  * partition-batched kernels (no shuffle; the payload never crosses the
  * wire — only the 8-byte fingerprint and 4 block keys do). At 100 TB of
  * audio the exchanged state is |corpus| × (id + fp + keys), not PCM.
  */
object AudioDedup {

  /** 64-bit energy-delta fingerprint of a 16-bit PCM payload: split the
    * FRAMES into windows of `windowFrames` (a frame is one sample per
    * channel, so a window spans `windowFrames × channels` interleaved
    * samples), take each window's mean |sample| as an exact integer
    * (long sum, floor division — the
    * [[WavAudioDecoder.meanAbsAmplitude]] arithmetic per window), and
    * set bit `f` iff E(f+1) > E(f) over the first 65 windows. None when
    * the payload is undecodable, not 16-bit signed PCM, or shorter than
    * 65 full windows (a fingerprint over a truncated tail would compare
    * clips of different support — quarantine instead). For mono
    * payloads (every committed fixture) the arithmetic is unchanged
    * from the pre-r16 samples-as-frames version, so fingerprints stay
    * hash-stable; multi-channel payloads now window by TIME as the
    * doc always claimed, instead of windows silently spanning
    * `windowFrames / channels` frames. */
  def energyDeltaFp64(bytes: Array[Byte], windowFrames: Int = 125): Option[Long] = {
    require(windowFrames > 0, s"windowFrames must be positive: $windowFrames")
    if (bytes == null || bytes.length < 12) return None
    // hot path: plain-byte RIFF parse — AudioSystem serializes under
    // JVM-global provider state (see the WavAudioDecoder scaladoc)
    RiffWav.parse(bytes) match {
      case Some(p) =>
        val windows = 65
        val windowSamples = windowFrames * p.channels
        if (p.nSamples < windows.toLong * windowSamples) return None
        val energy = new Array[Long](windows)
        var w = 0
        while (w < windows) {
          var sum = 0L
          var i = w * windowSamples
          val end = i + windowSamples
          while (i < end) { sum += math.abs(p.sample(i).toLong); i += 1 }
          energy(w) = sum / windowSamples
          w += 1
        }
        var fp = 0L
        var b = 0
        while (b < 64) {
          if (energy(b + 1) > energy(b)) fp |= 1L << b
          b += 1
        }
        return Some(fp)
      case None =>
    }
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16) return None
        val data = ais.readAllBytes()
        val nSamples = data.length / 2
        val windows = 65
        // same frame-windowing as the fast path: a window spans
        // windowFrames frames = windowFrames × channels samples
        val windowSamples = windowFrames * f.getChannels
        if (nSamples < windows.toLong * windowSamples) return None
        val energy = new Array[Long](windows)
        var w = 0
        while (w < windows) {
          var sum = 0L
          var i = w * windowSamples
          val end = i + windowSamples
          while (i < end) {
            val s =
              if (f.isBigEndian) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort
              else ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
            sum += math.abs(s.toLong)
            i += 1
          }
          energy(w) = sum / windowSamples
          w += 1
        }
        var fp = 0L
        var b = 0
        while (b < 64) {
          if (energy(b + 1) > energy(b)) fp |= 1L << b
          b += 1
        }
        Some(fp)
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Near-dup pairs `(doc_a, doc_b, hamming)` with exact Hamming
    * distance ≤ `maxHamming` between energy-delta fingerprints —
    * candidates from 16-bit block collisions, complete for
    * Hamming ≤ blocks − 1 by pigeonhole, exactly the
    * [[ImageDedup.nearDupDHash]] treatment with the audio kernel in
    * front. */
  def nearDupAudio(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      windowFrames: Int = 125,
      maxHamming: Int = 3,
      blocks: Int = 4)(implicit spark: SparkSession): DataFrame = {
    val hashed = Multimodal.audioFpPartitions(
      docs.select(col(idCol).cast("long").as("doc_id"), col(payloadCol)),
      payloadCol, "fp", windowFrames)
      .filter(col("fp").isNotNull)
      .select(col("doc_id"), col("fp"))
    // the candidate + verify tail is exactly the 64-bit image one —
    // one shared implementation, never a diverging copy
    ImageDedup.nearDupFromHashes(hashed, maxHamming, blocks)
  }
}
