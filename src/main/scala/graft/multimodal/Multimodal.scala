package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as opaque
  * `binary` columns with typed metadata structs.
  *
  * The Spark-side plumbing — schema, batching shape, partition sizing — is
  * real. IMAGE decode is real too: [[ImageIoCodec]] (the JDK's javax.imageio,
  * no third-party jar) handles PNG/JPEG/BMP/GIF, and [[imageRowMeans]] is
  * oracle-verified end-to-end (q82) on losslessly round-tripped synthetic
  * PNGs. Payloads that don't decode as images fall back to the deterministic
  * [[StubCodec]] (audio/video codecs genuinely aren't in this environment —
  * that residual stub is documented, not hidden).
  *
  * Scale notes: content bytes never reach the driver; [[mapBatched]] processes
  * fixed-size row batches inside `mapPartitions` (the JVM analog of
  * `mapInPandas` batch semantics — bound memory by batch size × item size,
  * not partition size). Repartition by size (`targetPartitionBytes`) before
  * heavy decode so a straggler partition can't hold gigabytes.
  */
object Multimodal {

  /** Typed metadata for an opaque media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType)))

  /** Canonical media-table schema: stable id, opaque content, typed meta. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", mediaMetaType)))

  // ------------------------------------------------------------------- codec

  /** STUB CODEC — deterministic fake for payloads [[ImageIoCodec]] cannot
    * decode (audio/video — those codec libraries genuinely aren't in this
    * container — and non-media bytes in text-backed fixtures). Every function
    * is pure and deterministic in the input bytes so tests and benchmarks are
    * stable. */
  object StubCodec {
    /** "Decode" bytes to float pixels in [0,1): pixel i = byte (i*2654435761
      * mod len) scaled. Real impl: JPEG/PNG decode. */
    def decode(content: Array[Byte], pixels: Int): Array[Float] = {
      if (content.isEmpty) return new Array[Float](pixels)
      val out = new Array[Float](pixels)
      var i = 0
      while (i < pixels) {
        val idx = (((i.toLong * 2654435761L) % content.length).toInt + content.length) % content.length
        out(i) = (content(idx) & 0xFF) / 256.0f
        i += 1
      }
      out
    }

    /** "Resize": re-encode to a byte payload of the target dimensions.
      * Real impl: scale pixels. */
    def resize(content: Array[Byte], w: Int, h: Int, channels: Int): Array[Byte] = {
      val n = w * h * channels
      val out = new Array[Byte](n)
      if (content.nonEmpty) {
        var i = 0
        while (i < n) { out(i) = content(i % content.length); i += 1 }
      }
      out
    }
  }

  // ---------------------------------------------------------------- plumbing

  /** Repartition a media table so each partition carries ≈`targetPartitionBytes`
    * of content — decode work then parallelizes by payload size, not row
    * count, and no single task holds gigabytes of blobs. */
  def repartitionBySize(media: DataFrame, targetPartitionBytes: Long,
                        contentCol: String = "content"): DataFrame = {
    val totalBytes = media.agg(sum(length(col(contentCol)))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetPartitionBytes).toInt)
    media.repartition(parts)
  }

  /** Batched per-partition map — the JVM analog of `mapInPandas`: rows stream
    * through in fixed-size batches; `f` sees a whole batch (for vectorized /
    * model-call workloads) and returns output rows. Output schema explicit,
    * like a pandas-UDF signature. */
  def mapBatched(df: DataFrame, batchSize: Int, outSchema: StructType)
                (f: Seq[Row] => Iterator[Row]): DataFrame = {
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows => rows.grouped(batchSize).flatMap(batch => f(batch)) }(enc)
  }

  /** Wrap any frame as a media table: id + utf8 bytes of a source column as
    * opaque content + synthesized meta (for pipelines whose real input is a
    * binary store). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   format: String = "fake"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(payloadCol).cast(StringType).cast(BinaryType).as("content"),
      struct(
        lit(format).as("format"),
        (pmod(col(idCol), lit(64)) + 1).cast(IntegerType).as("width"),
        (pmod(col(idCol), lit(48)) + 1).cast(IntegerType).as("height"),
        lit(3).cast(IntegerType).as("channels"),
        length(col(payloadCol)).cast(LongType).as("duration_ms")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  /** Decode + feature-extract in batches: each blob → fixed-dim embedding
    * (decode + mean-pool). Real JDK decode when the bytes ARE an image
    * (resized to 4×dim luminance) or a PCM WAV (first 4×dim samples,
    * zero-padded, shifted to [0,1)); stub for everything else. The shape
    * users swap a real model into. */
  def featurize(media: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame =
    mapBatched(media.select("media_id", "content"), batchSize, featureSchema) { batch =>
      // whole-batch hook: a real impl would run one vectorized model call here
      batch.iterator.map { r =>
        val id = r.getLong(0)
        val content = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val px = ImageIoCodec.decodeGray(content, 4, dim)
          .orElse(AudioWavCodec.decodePcm16Mono(content).map { case (_, samples) =>
            Array.tabulate(dim * 4)(i =>
              if (i < samples.length) ((samples(i) + 1.0) / 2.0).toFloat else 0.0f)
          })
          .getOrElse(StubCodec.decode(content, dim * 4))
        val emb = Array.tabulate(dim) { d =>
          var acc = 0.0f; var i = d * 4
          while (i < (d + 1) * 4) { acc += px(i); i += 1 }
          acc / 4.0f
        }
        Row(id, content.length, emb.toSeq)
      }
    }

  val rowMeanSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("y", LongType),
    StructField("row_mean", DoubleType)))

  val windowMeanSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", LongType),
    StructField("window_no", LongType),
    StructField("window_mean", DoubleType)))

  /** REAL audio decode, oracle-able: per fixed-size sample window, the mean
    * of the PCM16 samples as v/32768.0 doubles (exact in binary — an
    * external oracle that knows the samples reproduces these bit-for-bit).
    * One output row per full window; undecodable/compressed blobs emit
    * nothing (their codecs aren't in the JDK — see
    * [[AudioWavCodec.decodePcm16Mono]]). */
  def audioWindowMeans(media: DataFrame, windowSize: Int = 64,
                       batchSize: Int = 64): DataFrame =
    mapBatched(media.select("media_id", "content"), batchSize, windowMeanSchema) { batch =>
      batch.iterator.flatMap { r =>
        val id = r.getLong(0)
        val content = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        AudioWavCodec.decodePcm16Mono(content).iterator.flatMap { case (rate, samples) =>
          (0 until samples.length / windowSize).iterator.map { w =>
            var acc = 0.0; var i = w * windowSize
            while (i < (w + 1) * windowSize) { acc += samples(i); i += 1 }
            Row(id, rate.toLong, w.toLong, acc / windowSize)
          }
        }
      }
    }

  val dHashSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("fp", LongType)))

  /** Difference-hash (dHash) perceptual fingerprint over REAL image decode:
    * every image is deterministically resized to hashW×hashH (nearest-
    * neighbor luminance — [[ImageIoCodec.decodeGray]]; a same-size image is
    * a pixel copy, and luminance of a gray image is a strictly monotone
    * rescale, so comparisons match raw values), then one bit per
    * horizontally-adjacent comparison: bit (y·(hashW−1)+x) set iff
    * px(x,y) < px(x+1,y), row-major. The default 8×8 yields 56 bits —
    * deliberately ≤ 63 so band keys and XOR stay in non-negative signed-64
    * territory on BOTH the Spark and oracle sides. Resizing first is what
    * makes this a PERCEPTUAL hash (and keeps arbitrary-size corpora from
    * silently emitting nothing); undecodable blobs emit nothing. */
  def imageDHash(media: DataFrame, batchSize: Int = 64,
                 hashW: Int = 8, hashH: Int = 8): DataFrame = {
    require(hashH * (hashW - 1) <= 63 && hashW >= 2,
      s"dHash needs 2 <= hashW and hashH*(hashW-1) <= 63 bits, got ${hashW}x$hashH")
    mapBatched(media.select("media_id", "content"), batchSize, dHashSchema) { batch =>
      batch.iterator.flatMap { r =>
        val id = r.getLong(0)
        val content = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        ImageIoCodec.decodeGray(content, hashW, hashH).iterator.map { px =>
          var fp = 0L
          var y = 0
          while (y < hashH) {
            var x = 0
            while (x < hashW - 1) {
              if (px(y * hashW + x) < px(y * hashW + x + 1))
                fp |= 1L << (y * (hashW - 1) + x)
              x += 1
            }
            y += 1
          }
          Row(id, fp)
        }
      }
    }
  }

  /** Image near-dup pairs: dHash fingerprints → banded hamming join
    * ([[graft.operators.Dedup.fingerprintPairs]], 4×14-bit bands over the
    * 56-bit hash — exact for hamming ≤ 3 by pigeonhole). The 100 TB shape:
    * decode is embarrassingly parallel over size-bounded partitions, and
    * only (id, fp) ever enters an exchange — image bytes never shuffle. */
  def imageDupePairs(media: DataFrame, maxHamming: Int = 3,
                     maxBucketSize: Int = 1000, batchSize: Int = 64): DataFrame =
    graft.operators.Dedup.fingerprintPairs(imageDHash(media, batchSize),
      bandBits = 14, nBands = 4, maxHamming, maxBucketSize, bits = 56)

  /** REAL decode, oracle-able: per image row y, the mean of the red channel
    * as v/256.0 doubles (exact in binary — sums are order-independent, so an
    * external oracle that knows the pixel values reproduces these bit-for-
    * bit). One output row per (image, y); undecodable blobs emit nothing. */
  def imageRowMeans(media: DataFrame, batchSize: Int = 64): DataFrame =
    mapBatched(media.select("media_id", "content"), batchSize, rowMeanSchema) { batch =>
      batch.iterator.flatMap { r =>
        val id = r.getLong(0)
        val content = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        ImageIoCodec.decodeNative(content).iterator.flatMap { case (w, h, px) =>
          (0 until h).iterator.map { y =>
            var acc = 0.0; var x = 0
            while (x < w) { acc += px(y * w + x); x += 1 }
            Row(id, w.toLong, h.toLong, y.toLong, acc / w)
          }
        }
      }
    }

  /** Resize images to target dims, updating meta — runs through the same
    * batched plumbing. Real images are rescaled with Graphics2D and
    * re-encoded as PNG (meta.format follows); other payloads keep the stub
    * byte-resize. */
  def resize(media: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val outSchema = mediaSchema
    mapBatched(media.select("media_id", "content", "meta"), batchSize, outSchema) { batch =>
      batch.iterator.map { r =>
        val content = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val meta = if (r.isNullAt(2)) null else r.getStruct(2)
        val channels = if (meta == null || meta.isNullAt(3)) 3 else meta.getInt(3)
        val fmt = if (meta == null) null else meta.get(0)
        val dur = if (meta == null) null else meta.get(4)
        ImageIoCodec.decodeImage(content) match {
          case Some(img) =>
            Row(r.getLong(0), ImageIoCodec.encodePng(ImageIoCodec.scaleTo(img, w, h)),
              Row("png", w, h, 3, dur))
          case None =>
            Row(r.getLong(0), StubCodec.resize(content, w, h, channels),
              Row(fmt, w, h, channels, dur))
        }
      }
    }
  }

  /** Frame-sample a "video" blob: one row per sampled frame — pure Column
    * logic (codegen'd): frame i = bytes [i*frameBytes, (i+1)*frameBytes),
    * stride `everyN`. */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    val nFrames = floor(length(col("content")) / frameBytes).cast(IntegerType)
    media
      // blobs shorter than one frame (or with null content) emit ZERO rows —
      // partial frames are dropped consistently, not only at the tail
      .withColumn("__idx",
        when(nFrames >= 1, sequence(lit(0), nFrames - 1, lit(everyN))))
      .select(col("media_id"), col("meta"), col("content"),
        posexplode(col("__idx")).as(Seq("frame_no", "__i")))
      .withColumn("frame", expr(s"substring(content, __i * $frameBytes + 1, $frameBytes)"))
      .drop("__i", "content")
  }
}
