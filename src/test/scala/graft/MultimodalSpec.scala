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
