package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: image/audio/
  * video travel as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs batched per partition.
  *
  * The decode KERNEL ships real for images ([[ImageIoDecoder]] — the
  * JDK's `javax.imageio` PNG/BMP/GIF/JPEG readers plus a plain PPM/PGM
  * parse; no new dependency), and everything Spark-side is tested: the
  * schema, the binary payload handling, the partition-batched invocation
  * shape (the Scala analogue of `mapInPandas`: batch in, batch out,
  * arbitrary batch size), and the frame-sampling arithmetic; resize
  * ships real too ([[ImageResizer]] — deterministic nearest-neighbor,
  * re-emitted as PPM/PGM — behind the payload→payload
  * [[BatchTransformer]] seam of [[transformPartitions]]). Audio/video
  * codecs stay behind the same [[BatchDecoder]] seam (none exist in the
  * JDK); MultimodalSpec's deterministic test double shows the plug shape.
  *
  * Scale shape: decode is embarrassingly parallel per partition with no
  * shuffle; batch size bounds peak memory per task (bytes stay off-heap in
  * the column vectors until the batch materialises); metadata-only
  * operations (dimensions, frame offsets) are pure column arithmetic that
  * never touches the payload bytes — at 100 TB the payload column is
  * lazily pruned away unless a stage actually decodes.
  */
object Multimodal {

  /** Decoded-media schema appended by [[decodePartitions]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("ok", BooleanType, nullable = false)))

  /** Attach a binary payload + typed metadata to a text column — the
    * fixture has no binary table, so documents stand in for media blobs;
    * with a real corpus this is the ingest mapping (path/bytes → payload).
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8").cast("binary"))
      .withColumn("meta", struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("payload")).cast("long").as("n_bytes")))

  /** Metadata-only fake decode: deterministic dimensions derived from the
    * payload size alone — never reads the bytes, stays in codegen, and is
    * expressible in any SQL engine (the oracle twin). A real pipeline
    * derives these from container headers the same metadata-only way. */
  def fakeDims(nBytes: Column): (Column, Column, Column) = (
    (lit(64) + pmod(nBytes, lit(64))).cast("int"),
    (lit(64) + pmod(nBytes * 7, lit(64))).cast("int"),
    (lit(1) + pmod(nBytes, lit(8))).cast("int"))

  /** Sampled frame offsets for a clip of `nFrames` frames: every
    * `stride`-th frame index. Pure column arithmetic (W5-style sequence).
    */
  def frameOffsets(nFrames: Column, stride: Int): Column =
    when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nFrames - 1, lit(stride)).cast("array<int>"))

  /** Partition-batched decode — the real-codec plug point. Batches of
    * `batchSize` payloads go to `decoder.decode` together (codecs amortise
    * setup per batch); output rows keep input order and gain
    * [[decodedSchema]] columns. */
  def decodePartitions(
      df: DataFrame,
      payloadCol: String,
      decoder: BatchDecoder,
      batchSize: Int = 64)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(df.schema.fields ++ decodedSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val decoded = decoder.decode(batch.map(_.getAs[Array[Byte]](payloadIdx)))
        require(decoded.length == batch.length,
          s"decoder returned ${decoded.length} results for ${batch.length} inputs")
        batch.zip(decoded).map { case (row, d) =>
          Row.fromSeq(row.toSeq ++ Seq(d.width, d.height, d.nChannels, d.ok))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Decoded-audio schema appended by [[decodeAudioPartitions]]. */
  val audioSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("ok", BooleanType, nullable = false)))

  /** Partition-batched AUDIO decode — [[decodePartitions]]'s twin for the
    * audio modality ([[WavAudioDecoder]]): appends [[audioSchema]]
    * columns, same batching/order/quarantine contract, same row-local
    * no-shuffle scale shape. */
  def decodeAudioPartitions(
      df: DataFrame,
      payloadCol: String,
      batchSize: Int = 64)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(df.schema.fields ++ audioSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val decoded = WavAudioDecoder.decode(
          batch.map(_.getAs[Array[Byte]](payloadIdx)))
        batch.zip(decoded).map { case (row, d) =>
          Row.fromSeq(row.toSeq ++
            Seq(d.sampleRate, d.nChannels, d.nFrames, d.ok))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Partition-batched frame sampling (the video → frames explosion a
    * training pipeline runs before per-frame decode/resize): each payload
    * row becomes one row PER SAMPLED FRAME, carrying the original frame
    * index in `idxCol` and the frame payload in `frameCol`; an
    * undecodable payload becomes ONE quarantine row (both columns NULL),
    * so the input row stays visible and filterable (`frameCol IS NULL`)
    * instead of silently vanishing. Row-local explode, no shuffle; the
    * output fan-out is |sampled frames| per clip, so downstream stages
    * should expect the row count to grow by the sampling rate — at 100 TB
    * the repartition point (if any) belongs AFTER the per-frame filter,
    * where a frame key the next stage needs anyway can carry it. */
  def sampleFramesPartitions(
      df: DataFrame,
      payloadCol: String,
      sampler: FrameSampler,
      frameCol: String = "frame",
      idxCol: String = "frame_idx",
      batchSize: Int = 64)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(idxCol, IntegerType, nullable = true),
      StructField(frameCol, BinaryType, nullable = true)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          sampler.sample(row.getAs[Array[Byte]](payloadIdx)) match {
            case Some(frames) => frames.map { case (i, bytes) =>
              Row.fromSeq(row.toSeq ++ Seq(i, bytes)) }
            case None => Seq(Row.fromSeq(row.toSeq ++ Seq(null, null)))
          }
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Partition-batched scalar feature extraction over an AUDIO payload
    * column: appends one nullable long column `outCol` carrying
    * [[WavAudioDecoder.meanAbsAmplitude]] (None — undecodable or
    * non-16-bit-PCM payload — lands as SQL NULL, the same quarantine rule
    * as every other seam). Row-local, no shuffle. */
  def meanAbsPartitions(
      df: DataFrame,
      payloadCol: String,
      outCol: String = "mean_abs_amplitude",
      batchSize: Int = 64)(implicit spark: SparkSession): DataFrame =
    featurePartitions(df, payloadCol, outCol, LongType, batchSize)(
      b => WavAudioDecoder.meanAbsAmplitude(b))

  /** Partition-batched scalar feature extraction over an IMAGE payload
    * column: appends one nullable double column `outCol` carrying
    * [[ImageIoDecoder.meanSample]] (palette formats resolve to true sRGB
    * samples; an undecodable payload lands as SQL NULL). Row-local, no
    * shuffle. */
  def meanSamplePartitions(
      df: DataFrame,
      payloadCol: String,
      outCol: String = "mean_sample",
      batchSize: Int = 64)(implicit spark: SparkSession): DataFrame =
    featurePartitions(df, payloadCol, outCol, DoubleType, batchSize)(
      b => ImageIoDecoder.meanSample(b))

  /** Partition-batched perceptual dHash over an IMAGE payload column:
    * appends one nullable long column `outCol` carrying
    * [[ImageDedup.dhash64]] (an undecodable or over-wide payload lands
    * as SQL NULL — the standard quarantine rule). Run it on the OUTPUT
    * of [[transformPartitions]] with [[ImageResizer]](9, 8) — the
    * canonical dHash pipeline. Row-local, no shuffle. */
  def dhashPartitions(
      df: DataFrame,
      payloadCol: String,
      outCol: String = "dhash",
      batchSize: Int = 64)(implicit spark: SparkSession): DataFrame =
    featurePartitions(df, payloadCol, outCol, LongType, batchSize)(
      b => ImageDedup.dhash64(b))

  /** Partition-batched 256-bit block-mean hash over an IMAGE payload
    * column: appends one nullable `array<long>` column `outCol` carrying
    * [[ImageDedup.blockhash256]]'s 4 packed words (an undecodable or
    * non-16×16 payload lands as SQL NULL). Run it on the OUTPUT of
    * [[transformPartitions]] with [[ImageResizer]](16, 16) — the
    * canonical wide-hash pipeline. Row-local, no shuffle. */
  def blockhashPartitions(
      df: DataFrame,
      payloadCol: String,
      outCol: String = "blockhash",
      batchSize: Int = 64)(implicit spark: SparkSession): DataFrame =
    featurePartitions(df, payloadCol, outCol,
      ArrayType(LongType, containsNull = false), batchSize)(
      b => ImageDedup.blockhash256(b))

  /** Partition-batched 64-bit energy-delta audio fingerprint over a WAV
    * payload column ([[AudioDedup.energyDeltaFp64]]): appends one
    * nullable long column `outCol` (non-PCM16 / too-short payloads land
    * as SQL NULL). Row-local, no shuffle. */
  def audioFpPartitions(
      df: DataFrame,
      payloadCol: String,
      outCol: String = "audio_fp",
      windowFrames: Int = 125,
      batchSize: Int = 64)(implicit spark: SparkSession): DataFrame =
    featurePartitions(df, payloadCol, outCol, LongType, batchSize)(
      b => AudioDedup.energyDeltaFp64(b, windowFrames))

  private def featurePartitions(
      df: DataFrame, payloadCol: String, outCol: String,
      dt: DataType, batchSize: Int)(
      f: Array[Byte] => Option[Any])(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, dt, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          Row.fromSeq(row.toSeq :+
            f(row.getAs[Array[Byte]](payloadIdx)).orNull)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Partition-batched payload → payload transform (resize, re-encode,
    * thumbnail …) — same batching/order contract as [[decodePartitions]],
    * same scale shape (row-local, no shuffle, batch-bounded memory).
    * Appends ONE nullable binary column `outCol`: a None from the
    * transformer (undecodable input) lands as SQL NULL, so downstream
    * stages filter quarantined rows with `outCol IS NULL` instead of
    * handling exceptions. */
  def transformPartitions(
      df: DataFrame,
      payloadCol: String,
      transformer: BatchTransformer,
      outCol: String = "payload_out",
      batchSize: Int = 64)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val out = transformer.transform(
          batch.map(_.getAs[Array[Byte]](payloadIdx)))
        require(out.length == batch.length,
          s"transformer returned ${out.length} results for ${batch.length} inputs")
        batch.zip(out).map { case (row, o) =>
          Row.fromSeq(row.toSeq :+ o.orNull)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}

/** Decoded media record produced per payload. */
final case class DecodedMedia(width: Int, height: Int, nChannels: Int, ok: Boolean)

/** Batch payload-to-payload transform contract (the resize twin of
  * [[BatchDecoder]]): exactly one output per input, in order; None marks
  * an undecodable input (becomes SQL NULL in
  * [[Multimodal.transformPartitions]]). */
trait BatchTransformer extends Serializable {
  def transform(batch: Seq[Array[Byte]]): Seq[Option[Array[Byte]]]
}

/** Batch decode contract — implement with a real codec (JNI/FFI image or
  * audio library) in production. Must return exactly one record per input,
  * in order. */
trait BatchDecoder extends Serializable {
  def decode(batch: Seq[Array[Byte]]): Seq[DecodedMedia]
}

/** Frame-sampling contract (the multi-frame sibling of
  * [[BatchTransformer]]): a clip payload maps to its sampled
  * `(original frame index, frame payload)` pairs, or None when the
  * container is undecodable — which [[Multimodal.sampleFramesPartitions]]
  * surfaces as a NULL quarantine row. [[GifFrameSampler]] is the
  * JDK-native implementation; video codecs plug in behind the same
  * seam. */
trait FrameSampler extends Serializable {
  def sample(payload: Array[Byte]): Option[Seq[(Int, Array[Byte])]]
}

