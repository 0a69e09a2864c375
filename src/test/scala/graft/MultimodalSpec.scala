package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.asMediaTable(sf("documents").limit(50), "doc_id", "text")

  test("asMediaTable produces the canonical media schema") {
    assert(media.schema("content").dataType == BinaryType)
    val metaType = media.schema("meta").dataType.asInstanceOf[StructType]
    assert(metaType.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaMetaType.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(media.count() == 50)
  }

  test("featurize: batched decode → fixed-dim embedding, deterministic") {
    val f1 = Multimodal.featurize(media, dim = 8, batchSize = 16)
    assert(f1.schema("embedding").dataType == ArrayType(FloatType, containsNull = false))
    val row = f1.orderBy("media_id").head()
    assert(row.getAs[scala.collection.Seq[Float]]("embedding").length == 8)
    // deterministic across runs and batch sizes (batching must not change values)
    val f2 = Multimodal.featurize(media, dim = 8, batchSize = 7)
    assert(f1.orderBy("media_id").collect().toSeq == f2.orderBy("media_id").collect().toSeq)
  }

  test("resize re-encodes content to w*h*channels bytes and updates meta") {
    val out = Multimodal.resize(media, w = 4, h = 3)
    val r = out.orderBy("media_id").head()
    assert(r.getAs[Array[Byte]]("content").length == 4 * 3 * 3)
    val meta = r.getStruct(2)
    assert(meta.getInt(1) == 4 && meta.getInt(2) == 3)
  }

  test("sampleFrames: strided FULL frames only; short blobs emit zero rows") {
    val one = media.filter(col("media_id") === 1)
    val contentLen = one.select(length(col("content"))).as[Int].head()
    val frames = Multimodal.sampleFrames(one, frameBytes = 32, everyN = 2)
    val full = contentLen / 32
    val expected = (full + 1) / 2 // indices 0,2,4,... below `full`
    assert(frames.count() == expected)
    val f0 = frames.orderBy("frame_no").head()
    assert(f0.getAs[Array[Byte]]("frame").length == 32)
    // a blob shorter than one frame yields no rows at all
    val tiny = Multimodal.sampleFrames(one, frameBytes = contentLen + 1, everyN = 1)
    assert(tiny.count() == 0)
  }

  test("repartitionBySize bounds per-partition payload bytes") {
    val sized = Multimodal.repartitionBySize(media, targetPartitionBytes = 4096)
    val totalBytes = media.agg(sum(length(col("content")))).head().getLong(0)
    val expected = math.max(1, math.ceil(totalBytes / 4096.0).toInt)
    assert(sized.rdd.getNumPartitions == expected)
  }
}

class ImageIoCodecSpec extends SparkSpec {
  import spark.implicits._
  import graft.multimodal.{ImageIoCodec, Multimodal}

  test("PNG test pattern round-trips losslessly; row means match closed form") {
    val png = ImageIoCodec.testPattern(seed = 7, w = 8, h = 8)
    val Some((w, h, px)) = ImageIoCodec.decodeNative(png)
    assert(w == 8 && h == 8)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(px(y * 8 + x) == ((7 * 31 + y * 8 + x) % 256) / 256.0)
  }

  test("imageRowMeans decodes real PNGs through the batched plumbing; non-images emit nothing") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("content", BinaryType)))
    val rows = Seq(
      Row(1L, ImageIoCodec.testPattern(1, 8, 8)),
      Row(2L, "not an image at all".getBytes("UTF-8")))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = Multimodal.imageRowMeans(media)
      .orderBy("media_id", "y")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length == 8 && out.forall(_._1 == 1L)) // doc 2 dropped
    val expected0 = (0 until 8).map(x => ((1 * 31 + x) % 256) / 256.0).sum / 8
    assert(out(0)._5 == expected0)
  }

  test("resize takes the real path for images (decodable PNG out, target dims)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, ImageIoCodec.testPattern(3, 8, 8),
          Row("png", 8, 8, 3, 0L)))),
      Multimodal.mediaSchema)
    val r = Multimodal.resize(media, w = 4, h = 2).head()
    val Some((w, h, _)) = ImageIoCodec.decodeNative(r.getAs[Array[Byte]]("content"))
    assert(w == 4 && h == 2)
    assert(r.getStruct(2).getInt(1) == 4 && r.getStruct(2).getInt(2) == 2)
  }

  test("featurize uses real luminance for images, stub for other bytes (both deterministic)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("content", BinaryType)))
    def run() = Multimodal.featurize(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row(1L, ImageIoCodec.testPattern(5, 8, 8)),
          Row(2L, "plain text payload".getBytes("UTF-8")))), schema), dim = 4)
      .orderBy("media_id")
      .as[(Long, Int, Seq[Float])].collect().toSeq
    val a = run(); val b = run()
    assert(a == b) // deterministic across runs
    // the image row took the real path: its embedding equals the decoded
    // 4x4 luminance mean-pool, not the stub's byte hash
    val Some(gray) = ImageIoCodec.decodeGray(ImageIoCodec.testPattern(5, 8, 8), 4, 4)
    val expected = Array.tabulate(4)(d => (gray(d * 4) + gray(d * 4 + 1) + gray(d * 4 + 2) + gray(d * 4 + 3)) / 4.0f)
    assert(a.head._3 == expected.toSeq)
  }

  test("imageDHash matches a reference popcount hash; near-dup groups land within hamming 2") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.multimodal.{ImageIoCodec, Multimodal}
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("content", BinaryType)))
    val rows = (0L until 20L).map(id =>
      Row(id, ImageIoCodec.nearDupPattern(id, 8, 8, 5))) :+
      Row(99L, "junk bytes".getBytes("UTF-8"))
    val media = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val fps = Multimodal.imageDHash(media).as[(Long, Long)].collect().toMap
    assert(fps.size == 20 && !fps.contains(99L)) // junk emits nothing
    // reference hash computed directly from the closed-form pixel values
    def refFp(id: Long): Long = {
      def v(x: Int, y: Int): Long =
        (((id / 5) * 31 + y * 8 + x) * ((id / 5) * 17 + 7) % 251 +
          (if (id % 5 > 0 && x == 2 && y == 3) (id % 5) * 53 else 0L)) % 256
      (for (y <- 0 until 8; x <- 0 until 7 if v(x, y) < v(x + 1, y))
        yield 1L << (y * 7 + x)).foldLeft(0L)(_ | _)
    }
    for (id <- 0L until 20L) assert(fps(id) == refFp(id), s"id $id")
    // arbitrary-size images are resized to the hash grid, not silently
    // dropped (the perceptual-hash contract): a 32x24 image still hashes,
    // and two sizes of the SAME pattern land near each other
    val big = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(500L, ImageIoCodec.testPattern(5, 32, 24)),
      Row(501L, ImageIoCodec.testPattern(5, 8, 8)))), schema)
    val bigFps = Multimodal.imageDHash(big).as[(Long, Long)].collect().toMap
    assert(bigFps.size == 2 && bigFps.contains(500L))
    // group members differ only around pixel (2,3): hamming <= 2 intra-group
    for (g <- 0 until 4; a <- 0 until 5; b <- (a + 1) until 5)
      assert(java.lang.Long.bitCount(fps(g * 5L + a) ^ fps(g * 5L + b)) <= 2)
  }

  test("imageDupePairs finds every intra-group pair (exact recall at hamming <= 3)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.multimodal.{ImageIoCodec, Multimodal}
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("content", BinaryType)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize((0L until 30L).map(id =>
        Row(id, ImageIoCodec.nearDupPattern(id, 8, 8, 5)))), schema)
    val pairs = Multimodal.imageDupePairs(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val found = pairs.map(p => (p._1, p._2)).toSet
    for (g <- 0 until 6; a <- 0 until 5; b <- (a + 1) until 5)
      assert(found.contains((g * 5L + a, g * 5L + b)), s"missing intra-group pair $g/$a/$b")
    // ordered, no self-pairs, verified hamming bound holds
    assert(pairs.forall(p => p._1 < p._2 && p._3 <= 3))
  }
}

class AudioWavCodecSpec extends SparkSpec {
  import spark.implicits._
  import graft.multimodal.{AudioWavCodec, Multimodal}

  test("WAV test tone round-trips losslessly through javax.sound") {
    val wav = AudioWavCodec.testTone(seed = 3, nSamples = 128)
    val Some((rate, samples)) = AudioWavCodec.decodePcm16Mono(wav)
    assert(rate == 8000 && samples.length == 128)
    for (i <- 0 until 128)
      assert(samples(i) == ((3 * 31 + i) % 65536 - 32768) / 32768.0)
  }

  test("audioWindowMeans decodes real WAVs through the batched plumbing; non-audio emits nothing") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("content", BinaryType)))
    val rows = Seq(
      Row(1L, AudioWavCodec.testTone(1, 128)),
      Row(2L, "definitely not audio".getBytes("UTF-8")))
    val media = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = Multimodal.audioWindowMeans(media, windowSize = 64)
      .orderBy("media_id", "window_no")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 2 && out.forall(_._1 == 1L))
    val expected0 = (0 until 64).map(i => ((1 * 31 + i) % 65536 - 32768) / 32768.0).sum / 64
    assert(out(0)._4 == expected0)
  }
}

class FeaturizeFallbackChainSpec extends SparkSpec {
  import spark.implicits._
  import graft.multimodal.{AudioWavCodec, ImageIoCodec, Multimodal}
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  test("featurize routes image -> imageio, wav -> pcm, other -> stub, all deterministic") {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("content", BinaryType)))
    val rows = Seq(
      Row(1L, ImageIoCodec.testPattern(5, 8, 8)),
      Row(2L, AudioWavCodec.testTone(5, 128)),
      Row(3L, "neither image nor audio".getBytes("UTF-8")))
    def run() = Multimodal.featurize(spark.createDataFrame(
        spark.sparkContext.parallelize(rows), schema), dim = 4)
      .orderBy("media_id").as[(Long, Int, Seq[Float])].collect().toSeq
    val a = run()
    assert(a == run())
    // audio path: embedding d pools samples 4d..4d+3, shifted to [0,1)
    val Some((_, samples)) = AudioWavCodec.decodePcm16Mono(AudioWavCodec.testTone(5, 128))
    val expectedAudio = Array.tabulate(4) { d =>
      (0 until 4).map(j => ((samples(d * 4 + j) + 1.0) / 2.0).toFloat).sum / 4.0f
    }
    assert(a(1)._3 == expectedAudio.toSeq)
    // the three payloads take three DIFFERENT paths -> distinct embeddings
    assert(Set(a(0)._3, a(1)._3, a(2)._3).size == 3)
  }
}
