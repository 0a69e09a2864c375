package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar column-transform catalog (SURVEY.md §2.8, C1–C19).
  *
  * Each reference transform (a config-driven PySpark `withColumn` in
  * `/root/reference/lib/glue_scripts/lib/datatransform_*.py`) is re-expressed as a
  * pure `Column => Column` (or `DataFrame => DataFrame`) function over Spark
  * built-ins so everything stays inside whole-stage codegen — no Python/Scala UDFs
  * in the hot path.
  */
object ColumnTransforms {

  /** C1 `date` — parse string with a given pattern into DateType. Malformed
    * values yield NULL (the reference runs non-ANSI Spark where to_date nulls
    * on parse failure; Spark 4's default ANSI mode would throw and kill the
    * job instead of letting DQ quarantine the row).
    * Ref: datatransform_typeconversion.py:26-45. */
  def parseDate(c: Column, fmt: String): Column =
    try_to_timestamp(c, lit(fmt)).cast(DateType)

  /** C2 `timestamp` — parse string with pattern into TimestampType; malformed
    * → NULL (see parseDate). Ref: datatransform_typeconversion.py:48-68. */
  def parseTimestamp(c: Column, fmt: String): Column = try_to_timestamp(c, lit(fmt))

  /** C3 `changetype` — cast to any DDL type string; `json` means serialize.
    * Malformed values null out rather than throwing under ANSI.
    * Ref: datatransform_typeconversion.py:71-88. */
  def changeType(c: Column, ddl: String): Column =
    if (ddl.equalsIgnoreCase("json")) to_json(c) else c.try_cast(ddl)

  /** C4 `implieddecimal` — a numeric string whose last `digits` characters are an
    * implied fraction: "12345" w/ digits=2 → 123.45. Negatives keep their sign.
    * Ref: datatransform_typeconversion.py:91-123 (regex `([+-]?\d+)(\d{N})$`). */
  def impliedDecimal(c: Column, digits: Int, precision: Int = 16, scale: Int = 2): Column = {
    val pat = s"([+-]?\\d+)(\\d{$digits})$$"
    val whole = regexp_extract(c, pat, 1)
    val frac  = regexp_extract(c, pat, 2)
    // no-match (regexp_extract yields "") → null, like the reference's
    // non-ANSI cast; an ANSI cast of "." would throw.
    when(c.isNull.or(whole === ""), lit(null).cast(DecimalType(precision, scale)))
      .otherwise(concat_ws(".", whole, frac).cast(DecimalType(precision, scale)))
  }

  /** C5 `currency` — strip currency formatting and cast to decimal.
    * US "1,234.56" / euro "1.234,56" handled per flag.
    * Ref: datatransform_typeconversion.py:126-160. */
  def currency(c: Column, euro: Boolean = false, precision: Int = 16, scale: Int = 2): Column = {
    // native byte-scan keep-chars (regex-equivalent for an ASCII allow-set,
    // see Kernels.keepChars); euro's ','→'.' swap is a cheap translate
    import graft.functions.expressions.{HashExpressions => H}
    val cleaned =
      if (euro) translate(H.keep_chars(c, "0123456789,+-"), ",", ".")
      else H.keep_chars(c, "0123456789.+-")
    cleaned.try_cast(DecimalType(precision, scale).sql) // garbage → NULL, not ANSI abort
  }

  /** C6 `titlecase`. Ref: datatransform_typeconversion.py:163-177. */
  def titleCase(c: Column): Column = initcap(c)

  /** C8 `columnfromcolumn` — regex group-1 extraction.
    * Ref: datatransform_stringmanipulation.py:49-69. */
  def columnFromColumn(c: Column, pattern: String): Column =
    regexp_extract(c, pattern, 1)

  /** C9 `columnreplace`. Ref: datatransform_stringmanipulation.py:72-93. */
  def columnReplace(c: Column, pattern: String, replacement: String): Column =
    regexp_replace(c, pattern, replacement)

  /** C11 `combinecolumns` — printf-style merge where null inputs become "" and the
    * result is trimmed (reference does this via a Python UDF,
    * datatransform_stringmanipulation.py:112-140). Built-ins replicate it exactly:
    * coalesce-to-empty, format_string, trim. */
  def combineColumns(format: String, cols: Seq[Column]): Column =
    trim(format_string(format, cols.map(c => coalesce(c.cast(StringType), lit(""))): _*))

  /** C12 `merge` — first non-null of sources with a default; optional ""→null
    * pre-map. Ref: datatransform_misc.py:7-35. */
  def mergeColumns(cols: Seq[Column], default: Option[Column] = None,
                   emptyStringIsNull: Boolean = false): Column = {
    val srcs = if (emptyStringIsNull) cols.map(c => when(c === "", lit(null)).otherwise(c)) else cols
    coalesce((srcs ++ default.toSeq): _*)
  }

  /** C13 `addcolumns` — null-safe sum: null contributes 0.
    * Ref: datatransform_premium.py:241-256. */
  def addColumns(cols: Seq[Column]): Column =
    cols.map(c => coalesce(c, lit(0))).reduce(_ + _)

  /** C14 `multiplycolumns` — null-safe product; null/empty contributes
    * `emptyValue` (default 1). Ref: datatransform_premium.py:278-300. */
  def multiplyColumns(cols: Seq[Column], emptyValue: Double = 1.0): Column =
    cols.map(c => coalesce(c, lit(emptyValue))).reduce(_ * _)

  /** C15 `flipsign`. Ref: datatransform_premium.py:259-275. */
  def flipSign(c: Column): Column = negate(c)

  /** C16 `enddate` — start date plus a per-row month count.
    * Ref: datatransform_premium.py:48-69. */
  def endDate(start: Column, months: Column): Column = add_months(start, months)

  /** C17 `policymonths` — months between two dates. `normalized=false` is plain
    * months_between (31-day fraction) as decimal(16,2); `normalized=true` is
    * the reference's floor-style month count (months_between_normalized,
    * datatransform_premium.py:30-45): subtract one month from the end date
    * (unless that lands before the start — one-month policies) and count month
    * starts inclusive. A 12-month annual policy Jan 1→Jan 1 counts 12, not 13. */
  def policyMonths(start: Column, end: Column, normalized: Boolean = false): Column =
    if (!normalized) months_between(end, start).cast(DecimalType(16, 2))
    else {
      val prior0 = add_months(end, -1)
      val prior = when(prior0 < start, end).otherwise(prior0)
      months_between(trunc(prior, "MM"), trunc(start, "MM")).cast(IntegerType) + 1
    }

  /** C18 `hash` — SHA-256 hex of the stringified column. The reference hashes
    * Python `str(value)` so SQL NULL hashes as the literal "None"
    * (datatransform_dataprotection.py:11-43); replicated deliberately. */
  def sha256Hash(c: Column): Column =
    sha2(coalesce(c.cast(StringType), lit("None")), 256)

  /** C19 `redact` — overwrite with a literal mask.
    * Ref: datatransform_dataprotection.py:46-77. */
  def redact(mask: String): Column = lit(mask)

  /** earnedpremium (straight-line): premium / normalized policy-month count,
    * NULL outside the policy term — faithful to the reference UDF incl. its
    * quirk that the period end must be on or before the FIRST day of the
    * policy's last month (month_list[-1] is a month start).
    * Ref: datatransform_premium.py:162-178. */
  def earnedPremiumStraightLine(premium: Column, eff: Column, exp: Column,
                                periodStart: Column, periodEnd: Column): Column = {
    val nullDec = lit(null).cast(DecimalType(16, 2))
    val lastMonthStart = trunc(exp, "MM")
    when(premium.isNull || eff.isNull || exp.isNull ||
        periodStart.isNull || periodEnd.isNull, nullDec)
      .when(trunc(eff, "MM") > exp, nullDec) // empty month list (bad data)
      .when(periodEnd < eff || periodEnd > lastMonthStart, nullDec)
      .otherwise((premium / policyMonths(eff, exp, normalized = true))
        .cast(DecimalType(16, 2)))
  }

  /** earnedpremium (by-day): premium prorated by overlap-day count over total
    * policy days. Ref: datatransform_premium.py:181-201. */
  def earnedPremiumByDay(premium: Column, periodStart: Column, periodEnd: Column,
                         eff: Column, exp: Column): Column = {
    val clampStart = greatest(periodStart, eff)
    val clampEnd   = least(periodEnd, exp)
    val overlap    = datediff(clampEnd, clampStart) + 1
    val total      = datediff(exp, eff) + 1
    when(total <= 0 || overlap <= 0, lit(0).cast(DecimalType(16, 2)))
      .otherwise((premium * overlap / total).cast(DecimalType(16, 2)))
  }

  /** P6 `clean_nulltypes` — NullType columns break parquet writes; cast to string.
    * Ref: glue_catalog_helpers.py:427-437. */
  def cleanNullTypes(df: DataFrame): DataFrame = {
    val fixes = df.schema.fields.collect {
      case f if f.dataType == NullType => f.name -> col(f.name).cast(StringType)
    }
    if (fixes.isEmpty) df else df.withColumns(fixes.toMap)
  }
}
