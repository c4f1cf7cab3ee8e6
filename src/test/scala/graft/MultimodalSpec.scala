package graft

import graft.multimodal.{BatchDecoder, DecodedMedia, Multimodal, StubDecoder}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: payload schema, batched decode shape,
  * frame sampling. The decode kernel is the documented stub; what's under
  * test is everything Spark-side. */
class MultimodalSpec extends SparkSpec {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"), (2L, ""), (3L, "a" * 200)
  ).toDF("doc_id", "text")

  test("withPayload: binary column + typed metadata, byte-accurate") {
    val p = Multimodal.withPayload(docs, "text")
    assert(p.schema("payload").dataType.typeName == "binary")
    val m = p.select($"doc_id", $"meta.n_bytes")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 11L, 2L -> 0L, 3L -> 200L))
  }

  test("decodePartitions: batched, order-preserving, schema appended") {
    val p = Multimodal.withPayload(docs, "text")
    // decoder that records batch sizes to verify batching actually happens
    // (via accumulator: the closure is serialized to executors, so a plain
    // driver-side collection would stay empty)
    val batchSizes = spark.sparkContext.collectionAccumulator[Int]("batches")
    val recordingDecoder = new BatchDecoder {
      def decode(batch: Seq[Array[Byte]]): Seq[DecodedMedia] = {
        batchSizes.add(batch.length)
        StubDecoder.decode(batch)
      }
    }
    val out = Multimodal.decodePartitions(
      p.repartition(1), "payload", recordingDecoder, batchSize = 2)
    val rows = out.select($"doc_id", $"width", $"height", $"n_channels", $"ok")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(rows(0) == ((1L, 64 + 11, 64 + 77 % 64, 1 + 11 % 8, true)))
    assert(rows(1) == ((2L, 64, 64, 1, false)))    // empty payload fails decode
    assert(rows(2) == ((3L, 64 + 200 % 64, 64 + 1400 % 64, 1 + 200 % 8, true)))
    // 3 rows, batchSize 2, single partition -> batches of 2 and 1
    import scala.jdk.CollectionConverters._
    assert(batchSizes.value.asScala.toSeq.sorted == Seq(1, 2))
  }

  test("decodePartitions rejects a decoder that drops records") {
    val bad = new BatchDecoder {
      def decode(batch: Seq[Array[Byte]]): Seq[DecodedMedia] =
        StubDecoder.decode(batch).drop(1)
    }
    val p = Multimodal.withPayload(docs, "text")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodePartitions(p, "payload", bad, batchSize = 8).collect()
    }
    assert(e.getMessage.contains("decoder returned") ||
      e.getCause.getMessage.contains("decoder returned"))
  }

  test("frameOffsets: stride sampling, empty for non-positive counts") {
    val out = spark.range(1).select(
      Multimodal.frameOffsets(lit(8), 3).as("a"),
      Multimodal.frameOffsets(lit(1), 2).as("b"),
      Multimodal.frameOffsets(lit(0), 2).as("c")).head()
    assert(out.getSeq[Int](0) == Seq(0, 3, 6))
    assert(out.getSeq[Int](1) == Seq(0))
    assert(out.getSeq[Int](2).isEmpty)
  }

  test("stub decode matches the metadata-only column arithmetic") {
    val p = Multimodal.withPayload(docs, "text")
    val (w, h, c) = Multimodal.fakeDims($"meta.n_bytes")
    val colSide = p.select($"doc_id", w.as("w"), h.as("h"), c.as("c"))
    val decSide = Multimodal.decodePartitions(p, "payload", StubDecoder)
      .select($"doc_id", $"width".as("w"), $"height".as("h"), $"n_channels".as("c"))
    assert(colSide.except(decSide).count() == 0 &&
      decSide.except(colSide).count() == 0)
  }

  // ---- the REAL image kernel (ImageIoDecoder, r8) -------------------

  /** P6 PPM, 2×2, maxval 255, 12 raw samples with a known sum. */
  private val ppmBytes: Array[Byte] = {
    val header = "P6\n# test\n2 2\n255\n".getBytes("US-ASCII")
    val px = Array[Int](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 255)
    header ++ px.map(_.toByte)
  }

  test("ImageIoDecoder: PPM/PGM headers parse, pixel mean is exact") {
    import graft.multimodal.ImageIoDecoder
    val d = ImageIoDecoder.decode(Seq(ppmBytes)).head
    assert(d == DecodedMedia(2, 2, 3, ok = true))
    // hand-computed: (10+20+30+40+50+60+70+80+90+100+110+255)/12
    assert(ImageIoDecoder.meanSample(ppmBytes).contains(915.0 / 12))
    val pgm = "P5 3 1 255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 100.toByte, 200.toByte)
    assert(ImageIoDecoder.decode(Seq(pgm)).head ==
      DecodedMedia(3, 1, 1, ok = true))
    assert(ImageIoDecoder.meanSample(pgm).contains(100.0))
    // truncated raster / garbage / null fail CLOSED, never throw
    val truncated = ppmBytes.dropRight(3)
    val garbage = Array.fill[Byte](32)(7)
    assert(ImageIoDecoder.decode(Seq(truncated, garbage, null))
      .forall(!_.ok))
  }

  test("ImageIoDecoder: javax.imageio PNG roundtrip with known pixels") {
    import graft.multimodal.ImageIoDecoder
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 3; y <- 0 until 2)
      img.setRGB(x, y, (x * 40 << 16) | (y * 100 << 8) | 200)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    val d = ImageIoDecoder.decode(Seq(png)).head
    assert(d == DecodedMedia(3, 2, 3, ok = true))
    // PNG is lossless: mean over bands = mean of the set R/G/B values
    val expected = (Seq(0, 40, 80).map(_ * 2).sum + // R appears twice (y=0,1)
      Seq(0, 100).map(_ * 3).sum +                  // G appears thrice (x=0..2)
      200 * 6).toDouble / 18
    assert(ImageIoDecoder.meanSample(png).contains(expected))
  }

  test("ImageIoDecoder through decodePartitions: mixed formats, one pass") {
    import graft.multimodal.ImageIoDecoder
    val rows = Seq(
      (1L, ppmBytes),
      (2L, Array.fill[Byte](16)(3)),           // undecodable
      (3L, "P6 1 1 255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)))
    val df = spark.createDataFrame(rows).toDF("id", "payload")
    val out = Multimodal.decodePartitions(df, "payload", ImageIoDecoder)
      .select($"id", $"width", $"height", $"n_channels", $"ok")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(out(0) == ((1L, 2, 2, 3, true)))
    assert(out(1) == ((2L, 0, 0, 0, false)))
    assert(out(2) == ((3L, 1, 1, 3, true)))
  }

  // ---- the resize kernel (ImageResizer, r8) -------------------------

  test("ImageResizer: 4x4 PGM -> 2x2 picks exactly the (0,0)(2,0)(0,2)(2,2) samples") {
    import graft.multimodal.ImageResizer
    // P5 4x4: sample value = 10*y + x, so every pick is hand-checkable
    val px = (for (y <- 0 until 4; x <- 0 until 4) yield (10 * y + x).toByte).toArray
    val pgm = "P5\n4 4\n255\n".getBytes("US-ASCII") ++ px
    val out = ImageResizer(2, 2).transform(Seq(pgm)).head.get
    // floor mapping: srcX = x*4/2 -> {0, 2}; srcY likewise
    assert(new String(out.take(10), "US-ASCII") == "P5\n2 2\n255")
    assert(out.takeRight(4).toSeq == Seq[Byte](0, 2, 20, 22))
    // upscale 1x1 -> 2x2 replicates the single sample
    val one = "P5 1 1 255\n".getBytes("US-ASCII") ++ Array[Byte](9)
    assert(ImageResizer(2, 2).transform(Seq(one)).head.get
      .takeRight(4).toSeq == Seq[Byte](9, 9, 9, 9))
  }

  test("ImageResizer: PPM color resize roundtrips through ImageIoDecoder") {
    import graft.multimodal.{ImageIoDecoder, ImageResizer}
    val resized = ImageResizer(1, 1).transform(Seq(ppmBytes)).head.get
    // 2x2 -> 1x1 nearest picks pixel (0,0) = RGB(10, 20, 30)
    assert(ImageIoDecoder.decode(Seq(resized)).head ==
      DecodedMedia(1, 1, 3, ok = true))
    assert(ImageIoDecoder.meanSample(resized).contains(60.0 / 3))
    // a PNG input comes out as PPM with the imageio raster's samples
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, 0x010203); img.setRGB(1, 0, 0x040506)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val fromPng = ImageResizer(2, 1).transform(Seq(bos.toByteArray)).head.get
    assert(fromPng.takeRight(6).toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    // garbage and truncated rasters map to None, never throw
    assert(ImageResizer(2, 2).transform(
      Seq(Array.fill[Byte](8)(5), ppmBytes.dropRight(3), null)).forall(_.isEmpty))
  }

  test("ImageResizer: indexed-color (GIF palette) emits true RGB, not palette indices") {
    import graft.multimodal.ImageResizer
    // A GIF raster's one band holds PALETTE INDICES; the resizer must
    // resolve them through the color model (r8 advice: getSample on an
    // IndexColorModel silently emitted indices as intensities).
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val out = ImageResizer(2, 1).transform(Seq(bos.toByteArray)).head.get
    // 3-band P6 of the actual colors, wherever the writer put them in the
    // palette: red then blue
    assert(new String(out.take(10), "US-ASCII") == "P6\n2 1\n255")
    assert(out.takeRight(6).toSeq ==
      Seq[Byte](255.toByte, 0, 0, 0, 0, 255.toByte))
  }

  test("ImageIoDecoder: indexed-color (GIF palette) decode + meanSample resolve true RGB") {
    import graft.multimodal.ImageIoDecoder
    // The r9 advice twin of the resizer fix: meanSample on a GIF read
    // raster samples (palette indices) and decode reported 1 band. Both
    // must resolve through the color model like ImageResizer.readRaster.
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val gif = bos.toByteArray
    // decode reports the RESOLVED channel count, not the index band
    assert(ImageIoDecoder.decode(Seq(gif)).head == DecodedMedia(2, 1, 3, ok = true))
    // mean over true sRGB samples: (255+0+0 + 0+0+255) / 6 = 85.0 exactly —
    // a palette-index mean would be (i0+i1)/2 for writer-assigned indices,
    // never 85 unless the palette happened to land there with 3 bands
    assert(ImageIoDecoder.meanSample(gif).contains(85.0))
  }

  test("ImageResizer: same-size resize is the identity; resize is idempotent") {
    import graft.multimodal.ImageResizer
    // floor mapping at outW == w is x*w/w = x, so a same-size resize of a
    // canonical-header PPM must reproduce the raster byte-for-byte
    val px = (0 until 24).map(_.toByte).toArray // 4x2 P6
    val ppm = "P6\n4 2\n255\n".getBytes("US-ASCII") ++ px
    val same = ImageResizer(4, 2).transform(Seq(ppm)).head.get
    assert(same.toSeq == ppm.toSeq)
    // idempotence: a second resize to the same target changes nothing
    val once = ImageResizer(3, 2).transform(Seq(ppm)).head.get
    val twice = ImageResizer(3, 2).transform(Seq(once)).head.get
    assert(twice.toSeq == once.toSeq)
  }

  // ---- the frame-sample kernel (GifFrameSampler, r9) ----------------

  /** An animated GIF of solid full-size frames in the given colors. */
  private def animatedGif(colors: Seq[Int], w: Int = 4, h: Int = 2): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("GifFrameSampler: stride sampling keeps original indices, frames are true-color PPM") {
    import graft.multimodal.{GifFrameSampler, ImageIoDecoder}
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
    val gif = animatedGif(colors)
    val frames = GifFrameSampler(stride = 2).sample(gif).get
    assert(frames.map(_._1) == Seq(0, 2, 4))
    frames.foreach { case (i, bytes) =>
      // each sampled frame is a standalone P6 the decode kernel reads
      assert(ImageIoDecoder.decode(Seq(bytes)).head ==
        DecodedMedia(4, 2, 3, ok = true))
      val c = colors(i)
      val expected = Seq(((c >> 16) & 0xff).toByte,
        ((c >> 8) & 0xff).toByte, (c & 0xff).toByte)
      // solid pure colors survive the GIF palette exactly
      assert(bytes.takeRight(4 * 2 * 3).grouped(3).toSeq
        .forall(_.toSeq == expected), s"frame $i is not solid $c")
    }
    // stride 1 returns every frame; garbage and non-GIF payloads -> None
    assert(GifFrameSampler(1).sample(gif).get.map(_._1) == (0 until 5))
    assert(GifFrameSampler(1).sample(Array.fill[Byte](16)(7)).isEmpty)
    assert(GifFrameSampler(1).sample(ppmBytes).isEmpty)
    assert(GifFrameSampler(1).sample(null).isEmpty)
  }

  test("sampleFramesPartitions: per-frame rows, NULL quarantine, input columns preserved") {
    import graft.multimodal.{GifFrameSampler, Multimodal}
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val gif = animatedGif(Seq(0xff0000, 0x00ff00, 0x0000ff))
    val rows = Seq((1L, gif), (2L, Array.fill[Byte](16)(3)))
    val df = spark.createDataFrame(rows).toDF("id", "payload")
    val out = Multimodal
      .sampleFramesPartitions(df, "payload", GifFrameSampler(stride = 2))
      .select($"id", $"frame_idx", $"frame")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1), r.isNullAt(2)))
      .sortBy(t => (t._1, t._2))
    // clip 1 explodes to frames 0 and 2; clip 2 quarantines as one NULL row
    assert(out.toSeq == Seq((1L, 0, false), (1L, 2, false), (2L, -1, true)))
  }

  // ---- the audio leg (WavAudioDecoder / WavWindowSampler, r9) -------

  /** A 16-bit signed PCM mono WAV at 8000 Hz with the given samples. */
  private def wav(samples: Seq[Short], bigEndian: Boolean = false): Array[Byte] = {
    import javax.sound.sampled._
    val f = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, bigEndian)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      if (bigEndian) { pcm(2 * i) = (s >> 8).toByte; pcm(2 * i + 1) = s.toByte }
      else { pcm(2 * i) = s.toByte; pcm(2 * i + 1) = (s >> 8).toByte }
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), f, samples.length),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavAudioDecoder: header metadata, exact integer amplitude, quarantine") {
    import graft.multimodal.WavAudioDecoder
    val samples = Seq[Short](100, -200, 300, -400, 500)
    val bytes = wav(samples)
    assert(WavAudioDecoder.decode(Seq(bytes)).head ==
      WavAudioDecoder.DecodedAudio(8000, 1, 5L, ok = true))
    // mean |sample| = (100+200+300+400+500)/5 = 300, exact
    assert(WavAudioDecoder.meanAbsAmplitude(bytes).contains(300L))
    // floor division: (1+2+4)/3 = 2
    assert(WavAudioDecoder
      .meanAbsAmplitude(wav(Seq[Short](1, -2, 4))).contains(2L))
    // garbage, null, image payloads -> quarantine / None, never throw
    assert(WavAudioDecoder.decode(Seq(Array.fill[Byte](32)(9))).head ==
      WavAudioDecoder.DecodedAudio(0, 0, 0L, ok = false))
    assert(WavAudioDecoder.decode(Seq(null)).head.ok == false)
    assert(WavAudioDecoder.meanAbsAmplitude(ppmBytes).isEmpty)
  }

  test("WavWindowSampler: stride windows keep ordinals, round-trip through the decoder") {
    import graft.multimodal.{WavAudioDecoder, WavWindowSampler}
    // 10 frames -> windows of 4: [0..3] [4..7] [8..9]; stride 2 -> 0 and 2
    val samples = (1 to 10).map(i => (i * 1000).toShort)
    val out = WavWindowSampler(windowFrames = 4, stride = 2)
      .sample(wav(samples)).get
    assert(out.map(_._1) == Seq(0, 2))
    val w0 = out(0)._2
    assert(WavAudioDecoder.decode(Seq(w0)).head ==
      WavAudioDecoder.DecodedAudio(8000, 1, 4L, ok = true))
    // window 0 = samples 1000..4000 -> mean 2500, exact
    assert(WavAudioDecoder.meanAbsAmplitude(w0).contains(2500L))
    // trailing partial window: frames 8..9 -> n_frames 2, mean 9500
    val w2 = out(1)._2
    assert(WavAudioDecoder.decode(Seq(w2)).head ==
      WavAudioDecoder.DecodedAudio(8000, 1, 2L, ok = true))
    assert(WavAudioDecoder.meanAbsAmplitude(w2).contains(9500L))
    // stride 1 covers every window; non-audio -> None
    assert(WavWindowSampler(4, 1).sample(wav(samples)).get.map(_._1) ==
      Seq(0, 1, 2))
    assert(WavWindowSampler(4, 1).sample(ppmBytes).isEmpty)
  }

  test("WavResampler: exact decimation, declared rate divides, quarantine") {
    import graft.multimodal.{WavAudioDecoder, WavResampler}
    val samples = Seq[Short](10, 20, 30, 40, 50, 60, 70, 80)
    val half = WavResampler(2).transform(Seq(wav(samples))).head.get
    // frames 0,2,4,6 survive; declared rate 8000 -> 4000
    assert(WavAudioDecoder.decode(Seq(half)).head ==
      WavAudioDecoder.DecodedAudio(4000, 1, 4L, ok = true))
    // mean |sample| of (10,30,50,70) = 40, exact
    assert(WavAudioDecoder.meanAbsAmplitude(half).contains(40L))
    // factor 1 is the identity on samples and metadata
    val same = WavResampler(1).transform(Seq(wav(samples))).head.get
    assert(WavAudioDecoder.decode(Seq(same)).head ==
      WavAudioDecoder.DecodedAudio(8000, 1, 8L, ok = true))
    assert(WavAudioDecoder.meanAbsAmplitude(same) ==
      WavAudioDecoder.meanAbsAmplitude(wav(samples)))
    // non-audio payloads quarantine as None, never throw
    assert(WavResampler(2).transform(
      Seq(ppmBytes, Array.fill[Byte](8)(1), null)).forall(_.isEmpty))
  }

  test("decodeAudioPartitions + sampleFramesPartitions compose over an audio column") {
    import graft.multimodal.{Multimodal, WavWindowSampler}
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val clip = wav((1 to 6).map(i => (i * 100).toShort))
    val rows = Seq((1L, clip), (2L, Array.fill[Byte](16)(7)))
    val df = spark.createDataFrame(rows).toDF("id", "payload")
    val meta = Multimodal.decodeAudioPartitions(df, "payload")
      .select($"id", $"sample_rate", $"n_frames", $"ok").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(meta.toSeq == Seq((1L, 8000, 6L, true), (2L, 0, 0L, false)))
    // the SAME FrameSampler seam the video leg uses explodes audio windows
    val win = Multimodal
      .sampleFramesPartitions(df, "payload", WavWindowSampler(3, 1))
      .select($"id", $"frame_idx", $"frame").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1), r.isNullAt(2)))
      .sortBy(t => (t._1, t._2))
    assert(win.toSeq == Seq((1L, 0, false), (1L, 1, false), (2L, -1, true)))
  }

  test("transformPartitions: appended binary column, NULL quarantine, batch contract") {
    import graft.multimodal.{BatchTransformer, ImageResizer}
    val rows = Seq(
      (1L, ppmBytes),
      (2L, Array.fill[Byte](16)(3)))           // undecodable -> NULL
    val df = spark.createDataFrame(rows).toDF("id", "payload")
    val out = Multimodal.transformPartitions(
      df, "payload", ImageResizer(1, 1), outCol = "thumb")
    assert(out.schema("thumb").dataType.typeName == "binary" &&
      out.schema("thumb").nullable)
    val got = out.select($"id", $"thumb").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).sortBy(_._1)
    assert(got(0)._2.isDefined && got(1)._2.isEmpty)
    assert(out.filter($"thumb".isNull).select("id").head().getLong(0) == 2L)
    // a transformer that drops records is rejected, same as the decoder
    val bad = new BatchTransformer {
      def transform(batch: Seq[Array[Byte]]): Seq[Option[Array[Byte]]] =
        batch.drop(1).map(_ => None)
    }
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.transformPartitions(df, "payload", bad).collect()
    }
    assert(e.getMessage.contains("transformer returned") ||
      e.getCause.getMessage.contains("transformer returned"))
  }

  // ---- deterministic media fixtures (MediaSynth, r10) ---------------

  test("MediaSynth: WAV fixture round-trips to the formula's exact features") {
    import graft.multimodal.{MediaSynth, WavAudioDecoder}
    for (id <- Seq(0L, 123L, 499L)) {
      val bytes = MediaSynth.wavFixture(id)
      val nf = (50 + id % 50).toInt
      assert(WavAudioDecoder.decode(Seq(bytes)).head ==
        WavAudioDecoder.DecodedAudio(8000, 1, nf.toLong, ok = true))
      val expect = (0 until nf)
        .map(i => math.abs(((id * 31 + i * 7) % 65536) - 32768)).sum / nf
      assert(WavAudioDecoder.meanAbsAmplitude(bytes).contains(expect))
    }
  }

  test("MediaSynth: GIF fixture frames carry the exact formula colors") {
    import graft.multimodal.{GifFrameSampler, ImageIoDecoder, MediaSynth}
    for (id <- Seq(0L, 7L, 123L, 499L)) {
      val gif = MediaSynth.gifFixture(id)
      val (w, h) = ((3 + id % 5).toInt, (2 + id % 3).toInt)
      val nfr = (2 + id % 5).toInt
      val frames = GifFrameSampler(1).sample(gif).get
      assert(frames.map(_._1) == (0 until nfr))
      frames.foreach { case (f, ppm) =>
        val (r, g, b) = MediaSynth.gifColor(id, f)
        assert((r + g + b) % 3 == 0 && b >= 0 && b <= 255)
        assert(ImageIoDecoder.decode(Seq(ppm)).head ==
          DecodedMedia(w, h, 3, ok = true))
        // solid frame → the band mean is the exact integer (r+g+b)/3
        assert(ImageIoDecoder.meanSample(ppm).contains(((r + g + b) / 3).toDouble))
        assert(ppm.takeRight(w * h * 3).grouped(3).toSeq.forall(
          _.toSeq == Seq(r.toByte, g.toByte, b.toByte)), s"id=$id frame $f not solid")
      }
      // the palette-resolving decoder also reads the GIF container itself
      assert(ImageIoDecoder.decode(Seq(gif)).head == DecodedMedia(w, h, 3, ok = true))
    }
  }

  test("MediaSynth + feature seams: payload, mean_abs, mean_sample columns") {
    import graft.multimodal.MediaSynth
    val df = spark.range(0, 6).toDF("doc_id")
    val wav = Multimodal.meanAbsPartitions(
      MediaSynth.withWavPayload(df, "doc_id"), "payload", "mean_abs")
    val wavGot = wav.select($"doc_id", $"mean_abs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wavGot.keySet == (0L until 6L).toSet)
    for ((id, got) <- wavGot) {
      val nf = (50 + id % 50).toInt
      val expect = (0 until nf)
        .map(i => math.abs(((id * 31 + i * 7) % 65536) - 32768)).sum / nf
      assert(got == expect, s"doc $id")
    }
    val gif = Multimodal.meanSamplePartitions(
      MediaSynth.withGifPayload(df, "doc_id"), "payload", "mean_px")
    val gifGot = gif.select($"doc_id", $"mean_px").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, got) <- gifGot) {
      // the container-level mean averages over ALL frames of the clip
      val nfr = (2 + id % 5).toInt
      // ImageIO.read reads frame 0 only — the clip-level mean is frame 0's
      val (r, g, b) = MediaSynth.gifColor(id, 0)
      assert(got == ((r + g + b) / 3).toDouble, s"doc $id got $got")
      assert(nfr >= 2)
    }
    // quarantine: a non-media payload NULLs, never throws
    val junk = spark.createDataFrame(
      Seq((1L, Array.fill[Byte](16)(7)))).toDF("id", "payload")
    assert(Multimodal.meanAbsPartitions(junk, "payload", "m")
      .filter($"m".isNull).count() == 1)
  }

  /** The fixture's closed-form 9×8-resized pixel value — what the
    * nearest-neighbor resize of [[MediaSynth.pgmFixture]] must pick. */
  private def pgmResizedVal(id: Long, x: Int, y: Int): Int = {
    val g = id / 3
    val cw = (1 + g % 3).toInt; val ch = (1 + g % 2).toInt
    val cell = (((g * 31 + x * x + x * (7 + g % 11) +
      y * (13 + g % 13)) % 14) * 16 + 8).toInt
    val bump = if ((id * 131 + (x * cw) * 17 + (y * ch) * 23) % 19 == 0) 7 else 0
    cell + bump
  }

  /** Driver-side dHash replay of the closed form. */
  private def pgmDhash(id: Long): Long = {
    var fp = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (pgmResizedVal(id, x + 1, y) > pgmResizedVal(id, x, y))
        fp |= 1L << (y * 8 + x)
    fp
  }

  test("MediaSynth PGM fixture: resize + dhash64 replay the closed form") {
    import graft.multimodal.{ImageDedup, ImageIoDecoder, ImageResizer, MediaSynth}
    for (id <- Seq(0L, 1L, 2L, 7L, 123L, 499L)) {
      val pgm = MediaSynth.pgmFixture(id)
      val g = id / 3
      val (w, h) = ((9 * (1 + g % 3)).toInt, (8 * (1 + g % 2)).toInt)
      assert(ImageIoDecoder.decode(Seq(pgm)).head ==
        DecodedMedia(w, h, 1, ok = true))
      val rs = ImageResizer(9, 8).transform(Seq(pgm)).head.get
      // every resized pixel matches the closed form the oracle replays
      val header = s"P5\n9 8\n255\n".getBytes("US-ASCII").length
      for (y <- 0 until 8; x <- 0 until 9)
        assert((rs(header + y * 9 + x) & 0xff) == pgmResizedVal(id, x, y),
          s"id=$id pixel ($x,$y)")
      assert(ImageDedup.dhash64(rs).contains(pgmDhash(id)), s"id=$id dhash")
    }
    // quarantine: junk bytes and an over-wide raster both map to None
    assert(ImageDedup.dhash64(Array.fill[Byte](16)(7)).isEmpty)
    assert(ImageDedup.dhash64(MediaSynth.pgmFixture(3L)).isEmpty,
      "un-resized fixture exceeds 64 gradient bits and must be refused")
  }

  test("nearDupDHash: same-group ids pair up, cross-group do not, " +
      "hamming is the exact bit distance") {
    import graft.multimodal.{ImageDedup, MediaSynth}
    val df = spark.range(0, 30).toDF("doc_id")
    val got = ImageDedup.nearDupDHash(
        MediaSynth.withPgmPayload(df, "doc_id"), "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // naive: all pairs with hamming <= 3 over the driver-side closed form
    val fps = (0L until 30L).map(id => id -> pgmDhash(id)).toMap
    val expect = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L
      hm = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if hm <= 3
    } yield (a, b) -> hm.toLong).toMap
    assert(got === expect)
    assert(expect.nonEmpty, "fixture must produce near-dup pairs")
    // discriminating: pairs are (mostly) the same-group ids, and at
    // least one pair differs in >0 bits (the bump is live)
    assert(expect.keys.forall { case (a, b) => a / 3 == b / 3 })
    assert(expect.values.exists(_ > 0L))
  }

  /** Driver-side replay of the FINE fixture's 16×16-resized pixel:
    * dims are exact multiples of 16, so cell coords are (x, y) and the
    * source coords are (x·w/16, y·h/16). */
  private def fineResizedVal(id: Long, x: Int, y: Int): Int = {
    import graft.multimodal.MediaSynth
    val g = id / 3
    val w = (16 * (1 + g % 3)).toInt
    val h = (16 * (1 + g % 2)).toInt
    val sx = x * w / 16
    val sy = y * h / 16
    val cell = (MediaSynth.mixSq2(g, y * 16L + x) % 17).toInt * 12 + 8
    val bump = if ((id * 131 + sx * 17 + sy * 23) % 19 == 0) 7 else 0
    cell + bump
  }

  /** Driver-side blockhash256 replay (lower-median threshold). */
  private def fineBlockhash(id: Long): Seq[Long] = {
    val vals = for (y <- 0 until 16; x <- 0 until 16)
      yield fineResizedVal(id, x, y)
    val m = vals.sorted.apply(127)
    val fp = new Array[Long](4)
    for (p <- 0 until 256) if (vals(p) > m) fp(p >> 6) |= 1L << (p & 63)
    fp.toSeq
  }

  private def hamming256(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum

  test("MediaSynth fine PGM fixture: resize + blockhash256 replay the " +
      "closed form; quarantine refuses junk and non-16x16 rasters") {
    import graft.multimodal.{ImageDedup, ImageIoDecoder, ImageResizer, MediaSynth}
    for (id <- Seq(0L, 1L, 2L, 7L, 123L, 499L)) {
      val pgm = MediaSynth.pgmFineFixture(id)
      val g = id / 3
      val (w, h) = ((16 * (1 + g % 3)).toInt, (16 * (1 + g % 2)).toInt)
      assert(ImageIoDecoder.decode(Seq(pgm)).head ==
        DecodedMedia(w, h, 1, ok = true))
      val rs = ImageResizer(16, 16).transform(Seq(pgm)).head.get
      val header = s"P5\n16 16\n255\n".getBytes("US-ASCII").length
      for (y <- 0 until 16; x <- 0 until 16)
        assert((rs(header + y * 16 + x) & 0xff) == fineResizedVal(id, x, y),
          s"id=$id pixel ($x,$y)")
      assert(ImageDedup.blockhash256(rs).map(_.toSeq)
        .contains(fineBlockhash(id)), s"id=$id blockhash")
    }
    assert(ImageDedup.blockhash256(Array.fill[Byte](16)(7)).isEmpty)
    assert(ImageDedup.blockhash256(MediaSynth.pgmFineFixture(3L)).isEmpty,
      "un-resized fixture is not 16x16 and must be refused")
  }

  test("nearDupBlockhash: exact 256-bit hamming, complete at radius <= 6 " +
      "(naive all-pairs agreement), same-group only on the fine fixture") {
    import graft.multimodal.{ImageDedup, MediaSynth}
    val df = spark.range(0, 60).toDF("doc_id")
    val got = ImageDedup.nearDupBlockhash(
        MediaSynth.withPgmFinePayload(df, "doc_id"), "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val fps = (0L until 60L).map(id => id -> fineBlockhash(id)).toMap
    val expect = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
      hm = hamming256(fps(a), fps(b))
      if hm <= 6L
    } yield (a, b) -> hm).toMap
    assert(got === expect)
    assert(expect.nonEmpty, "fixture must produce near-dup pairs")
    assert(expect.keys.forall { case (a, b) => a / 3 == b / 3 })
    assert(expect.values.exists(_ > 0L), "the bump must flip some bit")
  }

  test("coBucketFromHashes: agrees with the naive radius-2 set and " +
      "excludes the hamming-3 pair the single-block scheme admits") {
    import graft.multimodal.{ImageDedup, MediaSynth}
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val df = spark.range(0, 120).toDF("doc_id")
    val hashed = ImageDedup.dhashFrame(
      MediaSynth.withPgmPayload(df, "doc_id"), "doc_id", "payload")
    val got = ImageDedup.coBucketFromHashes(hashed)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val fps = (0L until 120L).map(id => id -> pgmDhash(id)).toMap
    def hm(a: Long, b: Long) = java.lang.Long.bitCount(fps(a) ^ fps(b))
    val expect = (for {
      a <- 0L until 120L; b <- (a + 1) until 120L
      if hm(a, b) <= 2
    } yield (a, b) -> hm(a, b).toLong).toMap
    assert(got === expect)
    // the range is chosen to CONTAIN a hamming-3 pair (117, 118): the
    // radius-2 scheme must drop exactly the pairs q154's radius admits
    assert(hm(117L, 118L) == 3, "fixture drifted: (117,118) no longer h=3")
    assert(!got.contains((117L, 118L)))
    // guard-rail: the pair keys only certify radius <= 2
    assertThrows[IllegalArgumentException] {
      ImageDedup.coBucketFromHashes(hashed, maxHamming = 3)
    }
  }

  test("image dedup retention: dHash pairs -> components -> keep the " +
      "highest-quality doc per group (naive union-find agreement)") {
    import graft.multimodal.{ImageDedup, MediaSynth}
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val n = 60L
    val ids = spark.range(0, n).toDF("doc_id")
    def quality(id: Long): Long = (id * 7) % 13
    val qualityDf = (0L until n).map(id => (id, quality(id)))
      .toDF("doc_id", "q")
    val pairs = ImageDedup.nearDupFromHashes(
      ImageDedup.dhashFrame(
        MediaSynth.withPgmPayload(ids, "doc_id"), "doc_id", "payload"))
    val got = graft.ext.Dedup.canonicalDocs(
        graft.ext.Dedup.dedupGroups(ids, pairs), qualityDf, "q")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // naive: union-find over the driver-side pair closure
    val parent = Array.tabulate(n.toInt)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    val fps = (0L until n).map(id => id -> pgmDhash(id)).toMap
    for (a <- 0L until n; b <- (a + 1) until n
         if java.lang.Long.bitCount(fps(a) ^ fps(b)) <= 3) {
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val groups = (0L until n).groupBy(id => find(id.toInt).toLong)
    val expect = groups.map { case (canon, members) =>
      val kept = members.maxBy(id => (quality(id), -id))
      canon -> ((kept, quality(kept), members.size.toLong,
        members.map(quality).sum))
    }
    assert(got === expect)
    assert(groups.values.exists(_.size > 1), "fixture must merge groups")
  }

  /** Driver-side replay of the WAV motif envelope. */
  private def motifAmp(id: Long, f: Int): Long =
    (graft.multimodal.MediaSynth.mixSq2(id / 3, f.toLong) % 14) * 1024 + 512 +
      (if ((id * 131 + f * 17) % 19 == 0) 7L else 0L)

  private def motifFp(id: Long): Long = {
    var fp = 0L
    for (f <- 0 until 64)
      if (motifAmp(id, f + 1) > motifAmp(id, f)) fp |= 1L << f
    fp
  }

  test("MediaSynth WAV motif fixture: decoded energy-delta fingerprint " +
      "replays the closed form; quarantine refuses junk and short clips") {
    import graft.multimodal.{AudioDedup, MediaSynth, WavAudioDecoder}
    for (id <- Seq(0L, 1L, 2L, 7L, 123L, 499L)) {
      val wav = MediaSynth.wavMotifFixture(id)
      val d = WavAudioDecoder.decode(Seq(wav)).head
      assert(d.ok && d.sampleRate == 8000 && d.nChannels == 1 &&
        d.nFrames == 65L * 125L, s"id=$id header")
      assert(AudioDedup.energyDeltaFp64(wav).contains(motifFp(id)),
        s"id=$id fingerprint")
    }
    assert(AudioDedup.energyDeltaFp64(Array.fill[Byte](16)(7)).isEmpty)
    // the q104 fixture has 50-99 samples — far short of 65 windows
    assert(AudioDedup.energyDeltaFp64(MediaSynth.wavFixture(3L)).isEmpty,
      "a clip shorter than 65 windows must be refused, not zero-padded")
  }

  /** Driver-side replay of one GIF motif frame pixel / frame dHash. */
  private def motifFramePx(id: Long, f: Int, x: Int, y: Int): Int =
    (graft.multimodal.MediaSynth.mixSq2(id / 3, f * 72L + y * 9 + x) % 17)
      .toInt * 12 + 8 +
      (if ((id * 131 + f * 37 + x * 17 + y * 23) % 19 == 0) 7 else 0)

  private def motifFrameFp(id: Long, f: Int): Long = {
    var fp = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (motifFramePx(id, f, x + 1, y) > motifFramePx(id, f, x, y))
        fp |= 1L << (y * 8 + x)
    fp
  }

  private def motifSampledFrames(id: Long): Seq[Int] =
    0 until (4 + 2 * ((id / 3) % 2)).toInt by 2

  test("MediaSynth GIF motif fixture: frame sampling + per-frame dhash " +
      "replay the closed form through the exact grayscale palette") {
    import graft.multimodal.{GifFrameSampler, ImageDedup, MediaSynth}
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 123L)) {
      val gif = MediaSynth.gifMotifFixture(id)
      val frames = GifFrameSampler(2).sample(gif).get
      assert(frames.map(_._1) == motifSampledFrames(id), s"id=$id frames")
      frames.foreach { case (f, ppm) =>
        // P6 header, 3 identical bands per pixel (gray through getRGB)
        val header = s"P6\n9 8\n255\n".getBytes("US-ASCII").length
        for (y <- 0 until 8; x <- 0 until 9) {
          val want = motifFramePx(id, f, x, y)
          val base = header + (y * 9 + x) * 3
          assert((ppm(base) & 0xff) == want &&
            (ppm(base + 1) & 0xff) == want && (ppm(base + 2) & 0xff) == want,
            s"id=$id frame=$f pixel ($x,$y)")
        }
        assert(ImageDedup.dhash64(ppm).contains(motifFrameFp(id, f)),
          s"id=$id frame=$f dhash")
      }
    }
  }

  test("nearDupVideo: aligned-frame totals, frame-count match, naive " +
      "all-pairs agreement on the closed form") {
    import graft.multimodal.{MediaSynth, VideoDedup}
    val df = spark.range(0, 60).toDF("doc_id")
    val got = VideoDedup.nearDupVideo(
        MediaSynth.withGifMotifPayload(df, "doc_id"), "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val clips = (0L until 60L).map(id =>
      id -> motifSampledFrames(id).map(f => f -> motifFrameFp(id, f)).toMap)
      .toMap
    val expect = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
      if clips(a).keySet == clips(b).keySet
      hm = clips(a).map { case (f, fp) =>
        java.lang.Long.bitCount(fp ^ clips(b)(f)).toLong }.sum
      if hm <= 3L
    } yield (a, b) -> hm).toMap
    assert(got === expect)
    assert(expect.nonEmpty, "fixture must produce near-dup pairs")
    assert(expect.keys.forall { case (a, b) => a / 3 == b / 3 })
    assert(expect.values.exists(_ > 0L), "the bump must flip some bit")
    // guard-rail: clip-level completeness rides the per-frame pigeonhole
    assertThrows[IllegalArgumentException] {
      VideoDedup.nearDupVideo(
        MediaSynth.withGifMotifPayload(df, "doc_id"), "doc_id", "payload",
        maxTotalHamming = 4)
    }
  }

  test("RiffWav corrupt chunk size: every kernel quarantines (None / " +
      "not-ok), never throws — the fast path runs outside the try") {
    import graft.multimodal.{AudioDedup, MediaSynth, WavAudioDecoder,
      WavResampler, WavWindowSampler}
    val wav = MediaSynth.wavMotifFixture(7L)
    // canonical layout: the data-chunk size field lives at offset 40;
    // 0x7fffffff wraps an Int bounds check (off + 8 + size < 0)
    val corrupt = wav.clone()
    corrupt(40) = 0xff.toByte; corrupt(41) = 0xff.toByte
    corrupt(42) = 0xff.toByte; corrupt(43) = 0x7f.toByte
    // the fast path must REFUSE the lying header (long-arith bounds
    // guard) and hand off to AudioSystem, which decodes the intact
    // samples under the truncated stream — so the values come back
    // EQUAL to the clean payload's, and nothing throws
    assert(AudioDedup.energyDeltaFp64(corrupt) ===
      AudioDedup.energyDeltaFp64(wav))
    assert(WavAudioDecoder.meanAbsAmplitude(corrupt) ===
      WavAudioDecoder.meanAbsAmplitude(wav))
    WavAudioDecoder.decode(Seq(corrupt))
    WavResampler(2).transform(Seq(corrupt))
    WavWindowSampler(125, 2).sample(corrupt)
    // a decimation factor above the clip's sample rate floors the
    // output rate to 0 — quarantine (None), never a thrown require
    assert(WavResampler(16000).transform(Seq(wav)).head.isEmpty)
  }

  test("nearDupAudio: same-group clips pair up within hamming 3, " +
      "naive all-pairs agreement on the closed form") {
    import graft.multimodal.{AudioDedup, MediaSynth}
    val df = spark.range(0, 60).toDF("doc_id")
    val got = AudioDedup.nearDupAudio(
        MediaSynth.withWavMotifPayload(df, "doc_id"), "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val fps = (0L until 60L).map(id => id -> motifFp(id)).toMap
    val expect = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
      hm = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if hm <= 3
    } yield (a, b) -> hm.toLong).toMap
    assert(got === expect)
    assert(expect.nonEmpty, "fixture must produce near-dup pairs")
    assert(expect.keys.forall { case (a, b) => a / 3 == b / 3 })
    assert(expect.values.exists(_ > 0L), "the bump must flip some bit")
  }
}
