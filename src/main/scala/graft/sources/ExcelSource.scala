package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element

import java.util.zip.ZipFile
import scala.collection.mutable.ArrayBuffer

/** S3 Excel source — a MINIMAL native XLSX reader built on JDK-only pieces
  * (java.util.zip + javax.xml DOM), closing the gap left by the absence of a
  * spark-excel/POI jar in this environment. Ref: the reference ingests
  * spreadsheets via spark-excel (etl_collect_to_cleanse.py:154-185); its
  * workbooks are small config-like feeds (quickstart samples are ~3k rows).
  *
  * Scope and scale contract: the workbook is parsed ON THE DRIVER (an .xlsx
  * is one ZIP — it is not splittable by any reader), so this is for
  * config-sized workbooks, same as the reference's usage; bulk data belongs
  * in CSV/parquet. Cells come back as STRINGS (header row → column names),
  * exactly like a CSV read without inferSchema — the mapping/typing
  * transforms downstream do the conversion. Supported cell types: shared
  * strings (t="s"), inline strings (t="inlineStr"), formula/plain values
  * (the cached `<v>`), booleans (t="b" → "true"/"false"). Dates appear as
  * their raw serial numbers (style-table date detection is out of scope —
  * the reference's own date transform parses strings anyway). */
/** Requested sheet absent from the workbook — distinguished from other
  * config errors so the `sheet_names` try-list can retry the NEXT candidate
  * on this and ONLY this failure (a bad dataAddress must surface, not be
  * misreported as "no sheet found"). */
class SheetNotFoundException(msg: String) extends IllegalArgumentException(msg)

object ExcelSource {

  /** One parsed `dataAddress` range: 0-based start cell, optional inclusive
    * 0-based end cell, optional sheet override. */
  private[sources] case class CellRange(startCol: Int, startRow: Int,
                                        endCol: Option[Int], endRow: Option[Int],
                                        sheet: Option[String])

  /** spark-excel-style data addresses (etl_collect_to_cleanse.py:165-175):
    * `A1`, `A3:F100`, `'My Sheet'!B2:D50` — an optional (possibly quoted)
    * sheet prefix, a start cell, and an optional inclusive end cell. The
    * header row, when enabled, is the FIRST row of the range. */
  private[sources] def parseDataAddress(addr: String): CellRange = {
    val (sheetOpt, rest) = addr.lastIndexOf('!') match {
      case -1 => (None, addr)
      case i =>
        val raw = addr.substring(0, i)
        val name = if (raw.length >= 2 && raw.startsWith("'") && raw.endsWith("'"))
          raw.substring(1, raw.length - 1).replace("''", "'")
        else raw
        (Some(name), addr.substring(i + 1))
    }
    def cell(ref: String): (Int, Int) = {
      val letters = ref.takeWhile(_.isLetter)
      val digits = ref.drop(letters.length)
      require(letters.nonEmpty && digits.nonEmpty && digits.forall(_.isDigit),
        s"bad cell reference '$ref' in dataAddress '$addr'")
      (columnIndex(ref), digits.toInt - 1)
    }
    rest.split(":", -1) match {
      case Array(a) =>
        val (c, r) = cell(a.trim); CellRange(c, r, None, None, sheetOpt)
      case Array(a, b) =>
        val (c1, r1) = cell(a.trim); val (c2, r2) = cell(b.trim)
        require(c2 >= c1 && r2 >= r1, s"inverted range in dataAddress '$addr'")
        CellRange(c1, r1, Some(c2), Some(r2), sheetOpt)
      case _ => throw new IllegalArgumentException(s"bad dataAddress '$addr'")
    }
  }

  def read(spark: SparkSession, path: String, sheet: Option[String] = None,
           header: Boolean = true, dataAddress: Option[String] = None,
           password: Option[String] = None): DataFrame = {
    // Encrypted workbooks arrive as CFB containers (not ZIPs): decrypt to a
    // temp .xlsx first (driver-side, like all of this reader — a workbook is
    // one opaque blob either way). A CFB with no password, or a password on
    // a plain ZIP, both fail loudly rather than guessing.
    if (OoxmlCrypto.isCfbFile(path)) {
      val pwd = password.getOrElse(throw new IllegalArgumentException(
        s"workbook is encrypted — provide the password (spec field 'password'): $path"))
      val tmp = OoxmlCrypto.decryptToTempFile(path, pwd)
      try return read(spark, tmp.toString, sheet, header, dataAddress, None)
      finally java.nio.file.Files.deleteIfExists(tmp)
    } else if (password.isDefined)
      // a password against a PLAIN workbook is a config error — reading on
      // while silently ignoring the credential would mask a wrong-file bug
      throw new IllegalArgumentException(
        s"password given but workbook is not encrypted (not a CFB container): $path")
    val range = dataAddress.map(parseDataAddress)
    val grid0 = readGrid(path, range.flatMap(_.sheet).orElse(sheet))
    // crop to the range by TRUE sheet coordinates (the r= attributes), so
    // blank leading rows/columns around the table don't shift the window
    val grid = range match {
      case None => grid0.map(_._2).filter(_.exists(_ != null))
      case Some(cr) =>
        grid0.filter { case (rowNum, _) =>
            rowNum >= cr.startRow && cr.endRow.forall(rowNum <= _) }
          .map { case (_, cells) =>
            val upTo = cr.endCol.map(_ + 1).getOrElse(cells.length)
            cells.slice(cr.startCol, upTo)
          }
          .filter(_.exists(_ != null))
    }
    if (grid.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq.empty))
    val width = grid.map(_.length).max
    val padded: Seq[Seq[String]] = grid.map(r => r.padTo(width, null: String).toSeq)
    val (names0, data) =
      if (header) (padded.head.zipWithIndex.map { case (n, i) =>
        if (n == null || n.isEmpty) s"_c$i" else n }, padded.tail)
      else (Seq.tabulate(width)(i => s"_c$i"), padded)
    // Spark CSV parity (CSVDataSource.makeSafeHeader): every occurrence of a
    // duplicated header gets its column POSITION appended
    // ([note, amount, amount] -> note, amount1, amount2). Unlike Spark we
    // also re-check against the full name set, so a generated name can't
    // collide with a real column already called 'amount1'.
    val dup = names0.diff(names0.distinct).toSet
    var names = names0.zipWithIndex.map { case (n, i) =>
      if (dup.contains(n)) s"$n$i" else n }
    while (names.distinct.size != names.size) {
      val d = names.diff(names.distinct).toSet
      names = names.zipWithIndex.map { case (n, i) =>
        if (d.contains(n)) s"${n}_$i" else n }
    }
    val schema = StructType(names.map(n => StructField(n, StringType)).toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(Row.fromSeq)), schema)
  }

  /** Raw cell grid of the chosen sheet: (0-based sheet row number, cells) —
    * rows of strings, nulls for gaps. Row numbers come from the OPTIONAL
    * `r=` attributes (sparse sheets skip empty rows in the XML), so range
    * cropping sees true coordinates. All-null "styled but valueless" rows are
    * filtered by the CALLER after cropping — dropping them here would shift
    * nothing (numbers are explicit) but they'd surface as phantom records. */
  private def readGrid(path: String, sheet: Option[String]): Seq[(Int, ArrayBuffer[String])] = {
    val zip = new ZipFile(path)
    try {
      val sheetPath = resolveSheetPath(zip, sheet)
      val shared = readSharedStrings(zip)
      val doc = parse(zip, sheetPath)
      val rows = elems(doc.getDocumentElement, "row")
      var lastRow = -1 // the row r= attribute is optional too
      rows.map { r =>
        val rAttr = r.getAttribute("r")
        val rowNum = if (rAttr.isEmpty) lastRow + 1 else rAttr.trim.toInt - 1
        lastRow = rowNum
        val out = ArrayBuffer.empty[String]
        var last = -1 // the r= cell ref is OPTIONAL; refless cells place sequentially
        elems(r, "c").foreach { c =>
          val ref = c.getAttribute("r")
          val colIdx = if (ref.isEmpty) last + 1 else columnIndex(ref)
          last = colIdx
          while (out.length <= colIdx) out += null
          out(colIdx) = cellValue(c, shared)
        }
        (rowNum, out)
      }
    } finally zip.close()
  }

  private def parse(zip: ZipFile, entry: String): org.w3c.dom.Document = {
    val e = Option(zip.getEntry(entry)).getOrElse(
      throw new IllegalArgumentException(s"xlsx missing $entry"))
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false) // match on local tag names only
    // ingested workbooks are external input: no DTDs, no external entities
    // (XXE/SSRF hardening)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    val in = zip.getInputStream(e)
    try f.newDocumentBuilder().parse(in) finally in.close()
  }

  private def elems(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** workbook.xml names sheets; its rels map each r:id to a worksheet file.
    * No sheet requested → the first declared sheet. */
  private def resolveSheetPath(zip: ZipFile, sheet: Option[String]): String = {
    val wb = parse(zip, "xl/workbook.xml")
    val sheets = elems(wb.getDocumentElement, "sheet")
    require(sheets.nonEmpty, "xlsx has no sheets")
    val chosen = sheet match {
      case Some(n) => sheets.find(_.getAttribute("name") == n)
        // the reference's default sheet_names is ['0'] — an all-digit name
        // with no exact match is a 0-based sheet INDEX (toIntOption: a
        // digit string beyond Int range falls through to the informative
        // not-found error, not a NumberFormatException)
        .orElse(n.toIntOption.filter(_ >= 0).flatMap(sheets.lift))
        .getOrElse(throw new SheetNotFoundException(
          s"sheet '$n' not found; has: ${sheets.map(_.getAttribute("name")).mkString(", ")}"))
      case None => sheets.head
    }
    val rid = chosen.getAttribute("r:id")
    val rels = parse(zip, "xl/_rels/workbook.xml.rels")
    val target = elems(rels.getDocumentElement, "Relationship")
      .find(_.getAttribute("Id") == rid)
      .map(_.getAttribute("Target"))
      .getOrElse(throw new IllegalArgumentException(s"no relationship for sheet id $rid"))
    if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
  }

  /** Visible text of an <si> or <is>: one <t>, or rich-text runs <r><t>….
    * Phonetic <rPh> runs are EXCLUDED (POI/spark-excel do the same —
    * concatenating them corrupts join keys in phonetic-annotated books). */
  private def visibleText(container: Element): String =
    elems(container, "t").filter { t =>
      val p = t.getParentNode.getNodeName
      p == container.getTagName || p == "r"
    }.map(_.getTextContent).mkString

  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] =
    if (zip.getEntry("xl/sharedStrings.xml") == null) IndexedSeq.empty
    else elems(parse(zip, "xl/sharedStrings.xml").getDocumentElement, "si")
      .map(visibleText)
      .toIndexedSeq

  private def cellValue(c: Element, shared: IndexedSeq[String]): String = {
    def v: Option[String] = elems(c, "v").headOption.map(_.getTextContent)
    c.getAttribute("t") match {
      case "s" => v.map(i => shared(i.trim.toInt)).orNull
      case "inlineStr" => elems(c, "is").headOption.map(visibleText).orNull
      case "b" => v.map(x => if (x.trim == "1") "true" else "false").orNull
      case _ => v.orNull // number, cached formula result, or empty
    }
  }

  /** "BC23" → 0-based column 54. */
  private def columnIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    if (letters.isEmpty) 0
    else letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  // ------------------------------------------------------------------ writer

  /** Minimal XLSX writer (fixtures + round-trip tests): purely-numeric values
    * become number cells, everything else goes through sharedStrings — so a
    * round-trip exercises both reader paths. */
  def write(path: String, rows: Seq[Seq[String]], sheetName: String = "Sheet1"): Unit = {
    val shared = ArrayBuffer.empty[String]
    val sharedIdx = new java.util.HashMap[String, Integer]()
    def sIdx(s: String): Int = {
      val i = sharedIdx.get(s)
      if (i != null) i.intValue
      else { val n = shared.length; shared += s; sharedIdx.put(s, n); n }
    }
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;") // also used in attributes
    val numeric = "-?\\d+(\\.\\d+)?".r
    val sheetXml = new StringBuilder
    sheetXml.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheetXml.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    rows.zipWithIndex.foreach { case (r, ri) =>
      sheetXml.append(s"""<row r="${ri + 1}">""")
      r.zipWithIndex.foreach { case (v, ci) =>
        if (v != null) {
          val ref = s"${colRef(ci)}${ri + 1}"
          if (numeric.pattern.matcher(v).matches())
            sheetXml.append(s"""<c r="$ref"><v>$v</v></c>""")
          else
            sheetXml.append(s"""<c r="$ref" t="s"><v>${sIdx(v)}</v></c>""")
        }
      }
      sheetXml.append("</row>")
    }
    sheetXml.append("</sheetData></worksheet>")
    val sharedXml = new StringBuilder
    sharedXml.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sharedXml.append(s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${shared.length}" uniqueCount="${shared.length}">""")
    shared.foreach(s => sharedXml.append(s"<si><t>${esc(s)}</t></si>"))
    sharedXml.append("</sst>")
    val entries = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          s"""<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>"""),
      "xl/worksheets/sheet1.xml" -> sheetXml.toString,
      "xl/sharedStrings.xml" -> sharedXml.toString)
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try entries.foreach { case (name, content) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}
