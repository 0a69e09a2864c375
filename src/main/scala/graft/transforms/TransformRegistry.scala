package graft.transforms

import com.fasterxml.jackson.databind.JsonNode
import graft.config.Specs
import graft.config.Specs.NodeOps
import graft.functions.{ColumnTransforms => C, StructuredTransforms => G}
import graft.lineage.Lineage
import graft.operators.{Lookup, WindowOps}
import graft.stores.{LookupStore, TokenStore}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

/** Context handed to every transform — the Scala analog of the reference's
  * `(df, spec, args, lineage, sc)` contract
  * (datatransform_typeconversion.py:8-24). */
case class TransformContext(
    spark: SparkSession,
    filename: String = "",
    lookupStore: LookupStore = LookupStore.empty,
    tokenStore: Option[TokenStore] = None,
    lineage: Option[Lineage] = None) {
  def recordLineage(df: DataFrame, op: String, detail: String = ""): Unit =
    lineage.foreach(_.update(df, op, detail))
}

/** Config-driven transform dispatch (SURVEY.md §2 operator catalog): the
  * mirror of the reference's `globals()['transform_'+name]` lookup applied
  * sequentially in JSON key order with the `name:suffix` reuse convention
  * (etl_collect_to_cleanse.py:272-291). Each entry is thin glue from a spec
  * node to the pure-Column implementations in `graft.functions`. */
object TransformRegistry {

  type Transform = (DataFrame, JsonNode, TransformContext) => DataFrame

  /** Run a whole transform_spec in declared order.
    *
    * `extra` is the user-transform extension point — the analog of the
    * reference's drop-in transform modules, whose `transform_*` functions
    * join the same `globals()` dispatch the built-ins use
    * (resources/datatransform_premiumdemo.py:186-233,
    * etl_collect_to_cleanse.py:272-291). Consulted BEFORE the built-in map,
    * so a user transform can also shadow a built-in name; lineage records
    * user transforms identically. */
  def applyAll(df: DataFrame, transformSpec: Seq[(String, JsonNode)],
               ctx: TransformContext,
               extra: Map[String, Transform] = Map.empty): DataFrame =
    transformSpec.foldLeft(df) { case (acc, (key, node)) =>
      val name = Specs.dispatchName(key)
      val t = extra.getOrElse(name, registry.getOrElse(name,
        throw new IllegalArgumentException(s"Transform $name called for which there is no registered function")))
      val out = t(acc, node, ctx)
      ctx.recordLineage(out, name, node.toString)
      out
    }

  /** Sort-spec dialect for filldown/rownumber: "field", "field asc",
    * "field desc" (case-insensitive). The reference leaves descending sort as
    * a TODO (datatransform_misc.py:50,89 — ascending only); we accept the
    * suffix form so configs can express it without a pre-transform. */
  private def sortCol(specStr: String): Column = {
    val parts = specStr.trim.split("\\s+")
    if (parts.length >= 2 && parts.last.equalsIgnoreCase("desc"))
      col(parts.dropRight(1).mkString(" ")).desc
    else if (parts.length >= 2 && parts.last.equalsIgnoreCase("asc"))
      col(parts.dropRight(1).mkString(" ")).asc
    else col(specStr.trim)
  }

  private def fieldOrSource(spec: JsonNode): (String, String) = {
    val field = spec.str("field").get
    (field, spec.str("source").getOrElse(field))
  }

  /** Iterate list-shaped specs: withColumns over each entry. */
  private def perEntry(df: DataFrame, spec: JsonNode)(f: JsonNode => (String, Column)): DataFrame =
    df.withColumns(spec.elems.map(f).toMap)

  private def requireColumns(df: DataFrame, cols: Seq[String], transform: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"$transform: field(s) ${missing.mkString(", ")} not found in incoming data")
  }

  val registry: Map[String, Transform] = Map(

    // C7 filename — driver-side regex group-1 against the input file name.
    "filename" -> ((df, spec, ctx) => {
      spec.elems.foldLeft(df) { (acc, s) =>
        val field = s.str("field").get
        val m = s.str("pattern").get.r.findFirstMatchIn(ctx.filename)
        m match {
          case Some(g) => acc.withColumn(field, lit(g.group(1)))
          case None if s.bool("required").getOrElse(false) =>
            throw new IllegalArgumentException(
              s"filename transform: required pattern did not match '${ctx.filename}'")
          case None => acc.withColumn(field, lit(null).cast(StringType))
        }
      }
    }),

    // C8 columnfromcolumn.
    "columnfromcolumn" -> ((df, spec, _) => perEntry(df, spec) { s =>
      val (field, source) = fieldOrSource(s)
      field -> C.columnFromColumn(col(source), s.str("pattern").get)
    }),

    // C9 columnreplace.
    "columnreplace" -> ((df, spec, _) => perEntry(df, spec) { s =>
      val (field, source) = fieldOrSource(s)
      field -> C.columnReplace(col(source), s.str("pattern").get, s.str("replacement").get)
    }),

    // C1 date.
    "date" -> ((df, spec, _) => perEntry(df, spec) { s =>
      val (field, source) = fieldOrSource(s)
      field -> C.parseDate(col(source), s.str("format").get)
    }),

    // C2 timestamp.
    "timestamp" -> ((df, spec, _) => perEntry(df, spec) { s =>
      val (field, source) = fieldOrSource(s)
      field -> C.parseTimestamp(col(source), s.str("format").get)
    }),

    // C3 changetype — map of column → DDL type (or "json").
    "changetype" -> ((df, spec, _) =>
      df.withColumns(spec.objFields.map { case (colName, t) =>
        colName -> C.changeType(col(colName), t.asText)
      }.toMap)),

    // C4 implieddecimal — num_implied digits; "format" is "p,s".
    "implieddecimal" -> ((df, spec, _) => perEntry(df, spec) { s =>
      val (field, source) = fieldOrSource(s)
      val Array(p, sc) = s.str("format").getOrElse("16,2").split(",").map(_.trim.toInt)
      field -> C.impliedDecimal(col(source), s.str("num_implied").getOrElse("2").toInt, p, sc)
    }),

    // C5 currency.
    "currency" -> ((df, spec, _) => perEntry(df, spec) { s =>
      val (field, source) = fieldOrSource(s)
      val Array(p, sc) = s.str("format").getOrElse("16,2").split(",").map(_.trim.toInt)
      field -> C.currency(col(source), s.bool("euro").getOrElse(false), p, sc)
    }),

    // C6 titlecase — plain list of column names.
    "titlecase" -> ((df, spec, _) =>
      df.withColumns(spec.elems.map(_.asText).map(c => c -> C.titleCase(col(c))).toMap)),

    // C19 redact — map column → literal mask; missing column is a hard error
    // (PII safety, datatransform_dataprotection.py:46-77).
    "redact" -> ((df, spec, _) => {
      requireColumns(df, spec.objFields.map(_._1), "redact")
      df.withColumns(spec.objFields.map { case (c, mask) => c -> lit(mask.asText) }.toMap)
    }),

    // C18 hash — list of columns; missing column is a hard error.
    "hash" -> ((df, spec, _) => {
      val cols = spec.elems.map(_.asText)
      requireColumns(df, cols, "hash")
      df.withColumns(cols.map(c => c -> C.sha256Hash(col(c))).toMap)
    }),

    // C20 tokenize — hash + persist distinct (raw, hash) pairs to the token
    // store (datatransform_dataprotection.py:80-178).
    "tokenize" -> ((df, spec, ctx) => {
      val cols = spec.elems.map(_.asText)
      requireColumns(df, cols, "tokenize")
      cols.foldLeft(df) { (acc, c) =>
        val hashed = acc.withColumn(s"${c}_token", C.sha256Hash(col(c)))
        ctx.tokenStore.foreach(_.append(
          hashed.select(col(c).cast(StringType).as("raw_data"),
            col(s"${c}_token").as("hash_key")).na.drop().dropDuplicates("raw_data")))
        hashed.withColumn(c, col(s"${c}_token")).drop(s"${c}_token")
      }
    }),

    // Extension (LLM pack): within-document repeated-line scrub — keep the
    // first occurrence of every line, in order (per-row native kernel,
    // operators.Repetition semantics; no shuffle). Spec rows:
    // {"field": ..., "target": ...?} — in place when no target.
    "droprepeatedlines" -> ((df, spec, _) => {
      val fields = spec.elems.map(s => (s.str("field").get, s.str("target")))
      requireColumns(df, fields.map(_._1), "droprepeatedlines")
      fields.foldLeft(df) { case (acc, (f, target)) =>
        acc.withColumn(target.getOrElse(f),
          graft.functions.expressions.TextStatsExpressions
            .drop_repeated_lines(col(f)))
      }
    }),

    // J1 lookup — via the local lookup store.
    "lookup" -> ((df, spec, ctx) => {
      spec.elems.foldLeft(df) { (acc, s) =>
        val lkpDf = ctx.lookupStore.valueLookup(ctx.spark, s.str("lookup").get)
        Lookup.lookup(acc, lkpDf, s.str("field").get,
          source = s.str("source"), noMatch = s.str("nomatch"))
      }
    }),

    // J2 multilookup.
    "multilookup" -> ((df, spec, ctx) => {
      spec.elems.foldLeft(df) { (acc, s) =>
        val lkpDf = ctx.lookupStore.multiLookup(ctx.spark, s.str("lookup_group").get)
        val attrs = s.strList("return_attributes")
        Lookup.multiLookup(acc, lkpDf, s.strList("match_columns"), "lookup_item", attrs,
          noMatch = s.str("nomatch").map(v => attrs.map(_ -> (v: Any)).toMap).getOrElse(Map.empty))
      }
    }),

    // C12 merge.
    "merge" -> ((df, spec, _) => perEntry(df, spec) { s =>
      s.str("field").get -> C.mergeColumns(
        s.strList("source_list").map(col),
        s.str("default").map(lit),
        s.bool("empty_string_is_null").getOrElse(false))
    }),

    // W1 filldown.
    "filldown" -> ((df, spec, _) => {
      spec.elems.foldLeft(df) { (acc, s) =>
        WindowOps.fillDown(acc, Seq(s.str("field").get),
          sort = { val srt = s.strList("sort"); if (srt.isEmpty) Seq(lit(1)) else srt.map(sortCol) },
          partition = s.strList("partition").map(col))
      }
    }),

    // W2 rownumber.
    "rownumber" -> ((df, spec, _) => {
      spec.elems.foldLeft(df) { (acc, s) =>
        WindowOps.rowNumber(acc, s.str("field").get,
          partition = s.strList("partition").map(col),
          sort = s.strList("sort").map(sortCol))
      }
    }),

    // C10 literal — map of column → constant, preserving the JSON value's
    // native type (an int literal must not become a double partition value).
    "literal" -> ((df, spec, _) =>
      df.withColumns(spec.objFields.map { case (c, v) =>
        c -> (if (v.isIntegralNumber) lit(v.asLong)
              else if (v.isNumber) lit(v.asDouble)
              else if (v.isBoolean) lit(v.asBoolean)
              else lit(v.asText))
      }.toMap)),

    // C13 addcolumns.
    "addcolumns" -> ((df, spec, _) => perEntry(df, spec) { s =>
      s.str("field").get -> C.addColumns(s.strList("source_columns").map(col))
    }),

    // C14 multiplycolumns.
    "multiplycolumns" -> ((df, spec, _) => perEntry(df, spec) { s =>
      s.str("field").get -> C.multiplyColumns(s.strList("source_columns").map(col),
        s.dbl("empty_value").getOrElse(1.0))
    }),

    // C15 flipsign.
    "flipsign" -> ((df, spec, _) => perEntry(df, spec) { s =>
      val (field, source) = fieldOrSource(s)
      field -> C.flipSign(col(source))
    }),

    // C16 enddate.
    "enddate" -> ((df, spec, _) => perEntry(df, spec) { s =>
      s.str("field").get -> C.endDate(col(s.str("start_date").get),
        col(s.str("num_months").get))
    }),

    // C17 policymonths.
    "policymonths" -> ((df, spec, _) => perEntry(df, spec) { s =>
      s.str("field").get -> C.policyMonths(
        col(s.str("policy_effective_date").get),
        col(s.str("policy_expiration_date").get),
        s.bool("normalized").getOrElse(false))
    }),

    // G6 expandpolicymonths — single-object spec.
    "expandpolicymonths" -> ((df, spec, _) => {
      val out = G.expandPolicyMonths(df,
        effCol = spec.str("policy_effective_date").get,
        expCol = spec.str("policy_expiration_date").get,
        monthCol = spec.str("policy_month_start_field").getOrElse("policy_month_start"),
        indexCol = spec.str("policy_month_index").getOrElse("policy_month_index"),
        lastDayCol = spec.str("policy_month_end_field").getOrElse("policy_month_end"),
        uuidCol = spec.str("uniqueid_field").orElse(spec.str("uniqueid")))
      out
    }),

    // earnedpremium — straight-line or by-day.
    "earnedpremium" -> ((df, spec, _) => perEntry(df, spec) { s =>
      val premium = C.addColumns(s.strList("written_premium_list").map(col))
      val eff = col(s.str("policy_effective_date").get)
      val exp = col(s.str("policy_expiration_date").get)
      val field = s.str("field").get
      if (s.bool("byday").getOrElse(false))
        field -> C.earnedPremiumByDay(premium,
          col(s.str("period_start_date").get), col(s.str("period_end_date").get), eff, exp)
      else
        field -> C.earnedPremiumStraightLine(premium, eff, exp,
          col(s.str("period_start_date").get), col(s.str("period_end_date").get))
    }),

    // C11 combinecolumns — Python '{}' placeholders → '%s'.
    "combinecolumns" -> ((df, spec, _) => perEntry(df, spec) { s =>
      s.str("field").get -> C.combineColumns(
        s.str("format").get.replace("{}", "%s"),
        s.strList("source_columns").map(col))
    }),

    // P4 filterrows.
    "filterrows" -> ((df, spec, _) =>
      spec.elems.foldLeft(df)((acc, s) => acc.filter(expr(s.str("condition").get)))),

    // G1 jsonexpandarray.
    "jsonexpandarray" -> ((df, spec, _) => {
      spec.elems.foldLeft(df) { (acc, s) =>
        val (field, source) = fieldOrSource(s)
        val pre = if (source != field) acc.withColumn(field, col(source)) else acc
        G.expandArray(pre, field, s.str("index_field").get, field)
      }
    }),

    // G2 jsonexpandmap.
    "jsonexpandmap" -> ((df, spec, _) => {
      spec.elems.foldLeft(df) { (acc, s) =>
        val (field, source) = fieldOrSource(s)
        val pre = if (source != field) acc.withColumn(field, col(source)) else acc
        G.expandMap(pre, field, s.str("index_field").get, s.str("key_field").get, field)
      }
    }),

    // G3 flatten.
    "flatten" -> ((df, spec, _) =>
      spec.elems.foldLeft(df)((acc, s) =>
        G.flattenOneLevel(acc, s.str("field").get, s.bool("keep_field").getOrElse(false)))),

    // G4 xml string column → struct.
    "xml" -> ((df, spec, _) =>
      spec.elems.foldLeft(df)((acc, s) => G.xmlStringToStruct(acc, s.str("field").get))),

    // G5 json string column → struct.
    "json" -> ((df, spec, _) =>
      spec.elems.foldLeft(df)((acc, s) => G.jsonStringToStruct(acc, s.str("field").get))),
  )
}
