package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level RiffWav contracts that need package-private access
  * (the Spark-facing behavior is covered in MultimodalSpec):
  * trailing-chunk tolerance (r16 ADVICE — a malformed chunk AFTER valid
  * fmt+data must not push a canonical payload onto the serialized
  * AudioSystem fallback) and frame-windowing of the audio fingerprint
  * for multi-channel payloads (r16 ADVICE — windows count FRAMES, not
  * interleaved samples). */
class RiffWavSpec extends AnyFunSuite {

  test("parse tolerates a malformed trailing chunk after valid fmt+data " +
      "— the fast path keeps the payload instead of falling back") {
    val wav = MediaSynth.wavMotifFixture(7L)
    val clean = RiffWav.parse(wav)
    assert(clean.nonEmpty, "motif fixture must take the fast path")
    // append a trailing chunk header whose size field (0x7fffffff) walks
    // past the payload end — pre-r16 this rejected the whole payload
    val junk = Array[Byte]('L', 'I', 'S', 'T',
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte, 1, 2, 3)
    val appended = wav ++ junk
    val parsed = RiffWav.parse(appended)
    assert(parsed.nonEmpty, "trailing junk must not reject fmt+data")
    val (p, c) = (parsed.get, clean.get)
    assert(p.channels == c.channels && p.sampleRate == c.sampleRate &&
      p.dataOff == c.dataOff && p.dataLen == c.dataLen)
    assert(AudioDedup.energyDeltaFp64(appended) ===
      AudioDedup.energyDeltaFp64(wav))
    // a malformed chunk BEFORE data still rejects: offsets past it are
    // unknowable, so the payload goes to the fallback as before
    val corrupt = wav.clone()
    corrupt(40) = 0xff.toByte; corrupt(41) = 0xff.toByte
    corrupt(42) = 0xff.toByte; corrupt(43) = 0x7f.toByte
    assert(RiffWav.parse(corrupt).isEmpty)
  }

  test("energyDeltaFp64 windows by FRAMES: a stereo clip with both " +
      "channels carrying the mono samples fingerprints like the mono clip") {
    for (id <- Seq(0L, 7L, 123L)) {
      val mono = MediaSynth.wavMotifFixture(id)
      val p = RiffWav.parse(mono).get
      assert(p.channels == 1)
      // duplicate every 16-bit sample into two channels (frame-major)
      val stereoPcm = new Array[Byte](p.dataLen * 2)
      var i = 0
      while (i < p.nSamples) {
        val lo = p.bytes(p.dataOff + 2 * i)
        val hi = p.bytes(p.dataOff + 2 * i + 1)
        stereoPcm(4 * i) = lo; stereoPcm(4 * i + 1) = hi
        stereoPcm(4 * i + 2) = lo; stereoPcm(4 * i + 3) = hi
        i += 1
      }
      val stereo = RiffWav.write(stereoPcm, 2, p.sampleRate)
      // per-window mean |sample| is identical when every frame repeats
      // the mono sample across channels — so the fingerprint matches
      // iff windows span windowFrames FRAMES (they spanned half as many
      // frames pre-r16, interleaving adjacent windows' energies)
      assert(AudioDedup.energyDeltaFp64(stereo) ===
        AudioDedup.energyDeltaFp64(mono))
      assert(AudioDedup.energyDeltaFp64(mono).nonEmpty)
    }
  }
}
