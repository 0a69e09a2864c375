package graft.mapping

import graft.functions.SimilarityFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** One row of a schema-mapping file: rename `sourceName` → `destName`.
  * `destName == "null"` (the literal string, as in the reference) drops the
  * column; `threshold`+`scorer` mark a fuzzy row that matches leftover source
  * columns by name similarity. Ref: custom_mapping.py:48-115. */
case class MappingRow(sourceName: String, destName: String,
                      threshold: Option[Double] = None, scorer: Option[String] = None)

/** P1 `custommapping` + P2 `flatten_schema` + P3 `clean_column_names`
  * (SURVEY.md §2.3). All name logic is driver-side — the data-side result is a
  * single `select(alias...)`, which Catalyst collapses into the scan's
  * ReadSchema (column pruning is free at any scale). */
object CustomMapping {

  /** Every addressable nesting level of a schema as an unescaped dotted path —
    * struct NODES included (so a whole sub-struct can be mapped to one column)
    * and array-of-struct elements descended, exactly like the reference's
    * flatten_schema (custom_mapping.py:13-33). */
  def flattenPaths(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val name = s"$prefix${f.name}"
      val children = f.dataType match {
        case st: StructType => flattenPaths(st, s"$name.")
        case org.apache.spark.sql.types.ArrayType(st: StructType, _) =>
          flattenPaths(st, s"$name.")
        case _ => Seq.empty
      }
      name +: children
    }

  private def unescape(n: String): String = n.replace("`", "")

  /** Dotted-path splitting applies ONLY when the matched path is genuinely
    * nested (not a literal top-level field name); a literal name is wrapped
    * in ONE backtick pair so a raw CSV header containing a dot (`"a.b"`)
    * addresses the top-level column, not field b of struct a. */
  private def escapePath(p: String, nested: Boolean): String =
    if (nested) p.split("\\.").map(s => s"`$s`").mkString(".")
    else s"`${p.replace("`", "``")}`"

  /** Apply a mapping: select+alias each mapped field; `destName=="null"` drops;
    * unmapped source fields are discarded. Nested fields are addressed by the
    * reference's backtick path dialect (`` `Insured`.`InsuredAddress` `` — any
    * nesting level, including whole sub-structs), matched against
    * [[flattenPaths]]. Fuzzy rows (threshold set) match against still-unmapped
    * paths using the named scorer. With `strict=true`, a non-fuzzy mapping row
    * whose source field is absent raises (the reference's
    * strict_schema_mapping, custom_mapping.py:88). */
  def applyMapping(df: DataFrame, rows: Seq[MappingRow], strict: Boolean = false): DataFrame = {
    val available = scala.collection.mutable.LinkedHashSet(flattenPaths(df.schema): _*)
    val topLevel = df.schema.fieldNames.toSet
    val exact = rows.filter(_.threshold.isEmpty).flatMap { r =>
      val src = unescape(r.sourceName)
      if (!available.contains(src)) {
        if (strict && !r.destName.equalsIgnoreCase("null")) throw new IllegalArgumentException(
          s"strict schema mapping: source column ${r.sourceName} missing from incoming data")
        None
      }
      // nested-vs-literal is decided by the SCHEMA, not by quoting style: a
      // literal top-level column wins (so a raw CSV header "a.b" — however
      // the config quotes it — stays one column), and any other matched
      // dotted path is nested addressing
      else { available -= src; Some((r.copy(sourceName = src), !topLevel.contains(src))) }
    }
    val fuzzy = rows.filter(_.threshold.isDefined).flatMap { r =>
      val scorer = FuzzyScorers(r.scorer.getOrElse("token_sort_ratio"))
      val best = available.toSeq
        .map(c => c -> scorer(unescape(r.sourceName).toLowerCase, c.toLowerCase))
        .filter(_._2 >= r.threshold.get)
        .sortBy(-_._2)
        .headOption
      // fuzzy candidates come from flattenPaths: nested iff not a literal
      // top-level field name
      best.map { case (c, _) => available -= c; (MappingRow(c, r.destName), !topLevel.contains(c)) }
    }
    // the reference compares the drop sentinel case-insensitively
    // (custom_mapping.py:88 lower()s it; shipped files spell it "Null")
    val selected = (exact ++ fuzzy).filterNot(_._1.destName.equalsIgnoreCase("null"))
    df.select(selected.map { case (r, nested) =>
      col(escapePath(r.sourceName, nested)).as(r.destName) }: _*)
  }

  /** P3 `clean_column_names` — Parquet/Athena-safe names: trim, ≤255 chars,
    * lowercase, strip `,;{}()\n\r\t=`, and `[ .:]` → `_`.
    * Ref: glue_catalog_helpers.py:330-368. */
  def cleanName(name: String): String =
    name.trim.take(255).toLowerCase
      .replaceAll("[,;{}()\n\r\t=]", "")
      .replaceAll("[ .:]", "_")

  def cleanColumnNames(df: DataFrame): (DataFrame, Seq[(String, String)]) = {
    val renames = df.columns.map(c => c -> cleanName(c)).toSeq
    (df.select(renames.map { case (s, t) => col(s"`$s`").as(t) }: _*), renames)
  }

  /** Generate a recommended transform spec from an inferred schema: float/
    * double → decimal(16,2) changetype; *date* names → date parse; *time*
    * names → timestamp parse (glue_catalog_helpers.py:371-403). Returned as
    * JSON text a user edits into the dataset's spec file. */
  def generateSpec(df: DataFrame): String = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val changetype = df.schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType =>
        s"""      "${f.name}": "decimal(16,2)""""
    }
    val dates = df.schema.fields.collect {
      case f if f.name.toLowerCase.contains("date") =>
        s"""      { "field": "${f.name}", "format": "MM/dd/yy" }"""
    }
    val times = df.schema.fields.collect {
      case f if f.name.toLowerCase.contains("time") =>
        s"""      { "field": "${f.name}", "format": "yyyy-MM-dd HH:mm:ss" }"""
    }
    s"""{
  "transform_spec": {
    "date": [
${dates.mkString(",\n")}
    ],
    "timestamp": [
${times.mkString(",\n")}
    ],
    "changetype": {
${changetype.mkString(",\n")}
    }
  }
}"""
  }
}

/** RapidFuzz-style name scorers (pure Scala, driver-side — they compare column
  * NAMES, never data). Scores in [0,100] like rapidfuzz.
  * Ref use: custom_mapping.py:88-112. */
object FuzzyScorers {

  /** Indel (longest-common-subsequence based) normalized similarity ×100 — the
    * core of rapidfuzz's `ratio`. */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 100.0
    val lcs = lcsLength(a, b)
    200.0 * lcs / (a.length + b.length)
  }

  private def lcsLength(a: String, b: String): Int = {
    val dp = Array.ofDim[Int](b.length + 1)
    var i = 0
    while (i < a.length) {
      var prev = 0
      var j = 0
      while (j < b.length) {
        val tmp = dp(j + 1)
        dp(j + 1) = if (a(i) == b(j)) prev + 1 else math.max(dp(j + 1), dp(j))
        prev = tmp
        j += 1
      }
      i += 1
    }
    dp(b.length)
  }

  /** token_sort_ratio: sort whitespace tokens, then ratio. */
  def tokenSortRatio(a: String, b: String): Double =
    ratio(a.split("\\s+").sorted.mkString(" "), b.split("\\s+").sorted.mkString(" "))

  /** partial_ratio: best ratio of the shorter string against any same-length
    * window of the longer. */
  def partialRatio(a: String, b: String): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 100.0 else 0.0
    (0 to (l.length - s.length)).map(i => ratio(s, l.substring(i, i + s.length))).max
  }

  /** jaro_winkler scaled to [0,100]. */
  def jaroWinklerRatio(a: String, b: String): Double =
    SimilarityFunctions.jaroWinkler(a, b) * 100.0

  /** rapidfuzz default_process: lowercase, non-alphanumeric → space, trim —
    * applied before every scorer, as the reference's fuzzy matching does. */
  def preprocess(s: String): String =
    s.toLowerCase.replaceAll("[^\\p{L}\\p{N}]+", " ").trim

  def apply(name: String): (String, String) => Double = {
    val raw: (String, String) => Double = name match {
      case "ratio"             => ratio
      case "token_sort_ratio"  => tokenSortRatio
      case "partial_ratio"     => partialRatio
      case "jaro_winkler"      => jaroWinklerRatio
      case other => throw new IllegalArgumentException(s"unknown scorer: $other")
    }
    (a, b) => raw(preprocess(a), preprocess(b))
  }
}
