package graft.multimodal

/** Deterministic TEST DOUBLE for a media codec (demoted from main in r8,
  * when [[ImageIoDecoder]] became the real image kernel): dimensions
  * derived from byte length, matching [[Multimodal.fakeDims]], `ok=false`
  * for empty payloads the way a real decoder fails on truncated files.
  * MultimodalSpec uses it to exercise the batching/ordering contract of
  * [[Multimodal.decodePartitions]] independently of any codec. */
object StubDecoder extends BatchDecoder {
  def decode(batch: Seq[Array[Byte]]): Seq[DecodedMedia] =
    batch.map { bytes =>
      val n = if (bytes == null) 0L else bytes.length.toLong
      DecodedMedia(
        width = (64 + n % 64).toInt,
        height = (64 + (n * 7) % 64).toInt,
        nChannels = (1 + n % 8).toInt,
        ok = n > 0)
    }
}
