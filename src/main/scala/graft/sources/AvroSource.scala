package graft.sources

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native Avro Object Container File reader (S-family source format).
  *
  * The spark-avro MODULE jar is not in this distribution, but the Avro CORE
  * library (`avro-1.12.1.jar`) is — so instead of declaring Avro jar-blocked
  * (the Iceberg posture), this is a minimal reader in the spirit of
  * [[ExcelSource]]: schema discovery + decode built directly on the public
  * `org.apache.avro` API, parallelized per FILE across executors (the driver
  * only lists paths and reads one file header for the schema — no data
  * decodes driver-side).
  *
  * Scale contract: one task per container file, so throughput scales with
  * file count — the layout Avro-producing pipelines (Kafka sinks, Sqoop,
  * event dumps) emit anyway. Block-level (sync-marker) splitting of a single
  * huge file is deliberately out of scope; the split unit is the file.
  *
  * Type mapping (the decode subset the engine ships): primitives, [null, T]
  * unions as nullable T, records as structs (recursively), arrays, string-
  * keyed maps, enums and fixed as string/binary. Logical types surface as
  * their underlying primitive — schema-pinned readers can cast downstream.
  */
object AvroSource {

  /** `.avro` files under a directory, sorted. `listFiles()` returns null
    * (not empty) on an I/O error / permission denial — surface the path,
    * not an NPE. */
  private[graft] def listAvroFiles(dir: File): Seq[String] = {
    val listed = dir.listFiles()
    require(listed != null, s"cannot list directory ${dir.getPath} (unreadable or I/O error)")
    listed.filter(x => x.isFile && x.getName.endsWith(".avro"))
      .map(_.getAbsolutePath).sorted.toSeq
  }

  /** Read one container file or a directory of `.avro` files. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val f = new File(path)
    val files: Seq[String] =
      if (f.isDirectory) listAvroFiles(f) else Seq(f.getAbsolutePath)
    require(files.nonEmpty, s"no .avro files under $path")

    // schema from the first file's header only — no records decoded here
    val avroSchema = {
      val r = new DataFileReader[GenericRecord](
        new File(files.head), new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    require(avroSchema.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${avroSchema.getType}")
    val sparkSchema = toStructType(avroSchema)
    val schemaJson = avroSchema.toString // Schema is not serializable-stable; ship JSON

    val rdd = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { p =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new DataFileReader[GenericRecord](
          new File(p), new GenericDatumReader[GenericRecord](schema))
        // lazy close-on-exhaustion iterator: rows stream through the task
        // instead of materializing the whole container file in an
        // ArrayBuffer first (one huge file must spill downstream, not OOM
        // here); close fires exactly once, when the last row is consumed —
        // and the task-completion listener covers consumers that stop early
        // (a limit() would otherwise leak the file handle for the JVM's life)
        final class CloseOnExhaustionIter extends Iterator[Row] {
          private var closed = false
          def closeNow(): Unit =
            if (!closed) { closed = true; reader.close() }
          override def hasNext: Boolean =
            !closed && (reader.hasNext || { closeNow(); false })
          override def next(): Row = {
            if (!hasNext) throw new NoSuchElementException(s"exhausted $p")
            val row = try toRow(reader.next(), schema)
            catch { case e: Throwable => closeNow(); throw e }
            if (!reader.hasNext) closeNow()
            row
          }
        }
        val it = new CloseOnExhaustionIter
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => it.closeNow())
        it
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Unwrap [null, T] to (T, nullable=true); reject general unions. */
  private def unwrap(s: Schema): (Schema, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only [null, T] unions are supported, got $s")
      (nonNull.head, nonNull.size < branches.size)
    case _ => (s, false)
  }

  private[sources] def toStructType(record: Schema): StructType =
    StructType(record.getFields.asScala.map { fld =>
      val (inner, nullable) = unwrap(fld.schema())
      StructField(fld.name(), toDataType(inner), nullable)
    }.toSeq)

  private def toDataType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.RECORD => toStructType(s)
    case Schema.Type.ARRAY =>
      val (inner, nullable) = unwrap(s.getElementType)
      ArrayType(toDataType(inner), containsNull = nullable)
    case Schema.Type.MAP =>
      val (inner, nullable) = unwrap(s.getValueType)
      MapType(StringType, toDataType(inner), valueContainsNull = nullable)
    case other =>
      throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  private def toRow(rec: GenericRecord, schema: Schema): Row =
    Row.fromSeq(schema.getFields.asScala.map { fld =>
      convert(rec.get(fld.name()), unwrap(fld.schema())._1)
    }.toSeq)

  private def convert(v: Any, s: Schema): Any =
    if (v == null) null
    else s.getType match {
      case Schema.Type.STRING | Schema.Type.ENUM => v match {
        case u: Utf8 => u.toString
        case other => other.toString
      }
      case Schema.Type.BYTES => v match {
        case bb: java.nio.ByteBuffer =>
          val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
        case a: Array[Byte] => a
      }
      case Schema.Type.FIXED =>
        v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
      case Schema.Type.RECORD => toRow(v.asInstanceOf[GenericRecord], s)
      case Schema.Type.ARRAY =>
        val (inner, _) = unwrap(s.getElementType)
        v.asInstanceOf[java.util.Collection[AnyRef]].asScala
          .map(convert(_, inner)).toSeq
      case Schema.Type.MAP =>
        val (inner, _) = unwrap(s.getValueType)
        v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala.map {
          case (k, mv) => (k.toString, convert(mv, inner))
        }.toMap
      case _ => v // primitives arrive as their JVM boxed types
    }
}
