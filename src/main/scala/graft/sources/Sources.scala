package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import graft.config.Specs.NodeOps
import graft.mapping.MappingRow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source format dispatch (SURVEY.md §2.1 S1–S6): extension + `input_spec`
  * driven, mirroring etl_collect_to_cleanse.py:136-240. Excel (S3) goes
  * through [[ExcelSource]], a minimal JDK-only XLSX reader (no third-party
  * jar available here); every other shipped format is a Spark built-in. */
object Sources {

  /** Fixed-width mapping row: destName + width (SourceName ignored, destname
    * "null" drops the field). */
  case class FixedWidthField(destName: String, width: Int)

  def readFixedWidth(spark: SparkSession, path: String,
                     fields: Seq[FixedWidthField]): DataFrame = {
    val raw = spark.read.text(path)
    val offsets = fields.scanLeft(1)((acc, f) => acc + f.width)
    val cols = fields.zip(offsets).collect {
      case (f, start) if !f.destName.equalsIgnoreCase("null") =>
        trim(col("value").substr(start, f.width)).as(f.destName)
    }
    raw.select(cols: _*)
  }

  /** Trailing compression suffixes Spark's text-based readers decompress
    * transparently (pure-Java codecs in this distribution; zstd TEXT would
    * additionally need native libhadoop and is listed for the error path's
    * sake — parquet/orc zstd goes through zstd-jni and is unaffected). */
  private val CompressionExts = Set("gz", "bz2", "lz4", "deflate", "zst")

  /** Extension- and spec-driven read of a single collected file. */
  def read(spark: SparkSession, path: String, inputSpec: Option[JsonNode],
           fixedWidthFields: Seq[FixedWidthField] = Seq.empty): DataFrame = {
    def lastExt(p: String) = p.substring(p.lastIndexOf('.') + 1).toLowerCase
    // dispatch on the FORMAT extension: "events.jsonl.gz" is compressed
    // JSONL, not a ".gz" file (which would fall through to the CSV family)
    val raw = lastExt(path)
    val ext =
      if (CompressionExts.contains(raw)) lastExt(path.dropRight(raw.length + 1))
      else raw
    def has(key: String) = inputSpec.exists(_.has(key))
    def node(key: String) = inputSpec.flatMap(s => Option(s.get(key)))

    if (has("fixed")) readFixedWidth(spark, path, fixedWidthFields)
    else if (ext == "xls")
      // binary BIFF would fall through to the CSV reader and parse as
      // mojibake — fail loudly instead
      throw new IllegalArgumentException(
        s"legacy .xls (binary BIFF) is not supported — convert to .xlsx: $path")
    else if (ext == "xlsx" || has("excel")) {
      // S3: minimal native XLSX reader (driver-side; config-sized workbooks —
      // the reference's use case, etl_collect_to_cleanse.py:154-185)
      val ex = node("excel")
      // password-protected workbooks: ECMA-376 agile encryption handled by
      // OoxmlCrypto (JDK crypto); legacy RC4/"standard" formats reject with
      // a documented error inside the decryptor
      val password = ex.flatMap(_.str("password"))
      val header = ex.flatMap(_.bool("header")).getOrElse(true)
      val dataAddress = ex.flatMap(_.str("data_address"))
      // sheet_names is a TRY-LIST: first sheet that resolves wins
      // (etl_collect_to_cleanse.py:169-181 loops with except-pass);
      // singular `sheet` remains as the simple spelling
      val candidates = ex.map(_.strList("sheet_names")).filter(_.nonEmpty)
        .getOrElse(ex.flatMap(_.str("sheet")).toSeq)
      if (candidates.isEmpty)
        ExcelSource.read(spark, path, None, header, dataAddress, password)
      else {
        // an encrypted workbook is decrypted ONCE before the candidate loop
        // — per-attempt decryption would redo the whole spin-count KDF +
        // HMAC + AES pass for every sheet name tried
        val (readPath, readPwd, cleanup) =
          if (OoxmlCrypto.isCfbFile(path) && password.isDefined) {
            val tmp = OoxmlCrypto.decryptToTempFile(path, password.get)
            (tmp.toString, None, () => { java.nio.file.Files.deleteIfExists(tmp); () })
          } else (path, password, () => ())
        try {
          // retry ONLY on sheet-not-found (the reference's except-pass loop
          // semantics); any other failure — bad dataAddress, corrupt workbook,
          // wrong password — is a real error and must surface as itself
          val attempts = candidates.iterator.map { s =>
            try Right(ExcelSource.read(spark, readPath, Some(s), header, dataAddress, readPwd))
            catch { case e: SheetNotFoundException => Left(e.getMessage) }
          }
          attempts.collectFirst { case Right(df) => df }.getOrElse(
            throw new IllegalArgumentException(
              s"none of sheet_names ${candidates.mkString("[", ", ", "]")} found in $path"))
        } finally cleanup()
      }
    }
    else if (ext == "json" || ext == "jsonl" || has("json")) {
      spark.read.format("json")
        .option("prefersDecimal", "true")
        .option("allowComments", "true")
        .option("multiLine", node("json").flatMap(_.bool("multiline")).getOrElse(false))
        .option("mode", "PERMISSIVE")
        .load(path)
    }
    else if (ext == "xml" || has("xml")) {
      spark.read.format("xml")
        .option("rowTag", node("xml").flatMap(_.str("row_tag")).getOrElse("row"))
        .option("mode", "PERMISSIVE")
        .load(path)
    }
    else if (ext == "parquet" || has("parquet")) spark.read.parquet(path)
    // ORC is a Spark built-in (orc-core ships with the distribution); Avro
    // has no spark-avro MODULE jar here but the avro CORE library does ship,
    // so [[AvroSource]] decodes container files natively (per-file parallel)
    else if (ext == "orc" || has("orc")) spark.read.orc(path)
    else if (ext == "avro" || has("avro")) AvroSource.read(spark, path)
    else {
      // CSV family: comma default; tsv/pipe switch the delimiter.
      var delimiter = ","
      var fmt: Option[JsonNode] = None
      if (has("csv")) fmt = node("csv")
      if (has("tsv")) { delimiter = "\t"; fmt = node("tsv") }
      if (has("pipe")) { delimiter = "|"; fmt = node("pipe") }
      val reader = spark.read.format("csv")
        .option("header", fmt.flatMap(_.bool("header")).getOrElse(true))
        .option("delimiter", fmt.flatMap(_.str("delimiter")).getOrElse(delimiter))
        .option("quote", fmt.flatMap(_.str("quote_character")).getOrElse("\""))
        .option("escape", fmt.flatMap(_.str("escape_character")).getOrElse("\""))
        // Reference parity: CSV always reads multiLine
        // (etl_collect_to_cleanse.py:237 hard-codes .option('multiLine', True);
        // only the JSON branch reads a multiline spec key, lines 188-190).
        // multiLine CSV is UNSPLITTABLE (one task per file) — the spec key
        // `multiline: false` is an opt-OUT for feeds known to have no quoted
        // embedded newlines, restoring per-file splittability at scale.
        .option("multiLine", fmt.flatMap(_.bool("multiline")).getOrElse(true))
        .option("mode", "PERMISSIVE")
      // input_spec-provided schema DDL skips the inference pre-scan — at
      // scale inferSchema reads every byte TWICE; production specs should
      // always pin the schema (extension; the reference leans on Glue's
      // inference)
      fmt.flatMap(_.str("schema")) match {
        case Some(ddl) => reader.schema(ddl).load(path)
        case None => reader.option("inferSchema", true).load(path)
      }
    }
  }
}
