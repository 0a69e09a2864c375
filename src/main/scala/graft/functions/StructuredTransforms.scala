package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Structured-data / generator operators (SURVEY.md §2.9, G1–G6).
  * All are built on Spark generator built-ins (`posexplode_outer`, `sequence`,
  * `last_day`) — no UDTFs needed. */
object StructuredTransforms {

  /** G1 `jsonexpandarray` — explode an array column to one row per element with a
    * 1-based index column. Ref: datatransform_structureddata.py:10-36. */
  def expandArray(df: DataFrame, field: String, indexField: String,
                  valueField: String): DataFrame = {
    val others = df.columns.filter(_ != field).map(col).toSeq
    df.select(others :+ posexplode_outer(col(field)).as(Seq(indexField, valueField)): _*)
      .withColumn(indexField, col(indexField) + 1)
  }

  /** G2 `jsonexpandmap` — a struct column whose fields are homogeneous becomes a
    * map (via from_json(to_json(...))), then explodes to (index, key, value)
    * rows. Value type taken from the first struct field, as in the reference.
    * Ref: datatransform_structureddata.py:38-76. */
  def expandMap(df: DataFrame, field: String, indexField: String,
                keyField: String, valueField: String): DataFrame = {
    val valueDdl = df.schema(field).dataType match {
      case st: StructType if st.fields.nonEmpty => st.fields.head.dataType.sql
      case MapType(_, vt, _)                    => vt.sql
      case other => throw new IllegalArgumentException(
        s"expandmap: $field must be struct or map, got ${other.sql}")
    }
    val asMap = df.schema(field).dataType match {
      case _: StructType => from_json(to_json(col(field)), lit(s"map<string,$valueDdl>"), Map.empty[String, String].asJava)
      case _             => col(field)
    }
    val others = df.columns.filter(_ != field).map(col).toSeq
    df.withColumn(field, asMap)
      .select(others :+ posexplode_outer(col(field)).as(Seq(indexField, keyField, valueField)): _*)
      .withColumn(indexField, col(indexField) + 1)
  }

  /** G3 `flatten` — one-level struct flatten (`sel("f.*")`), prefixing child names
    * with the parent name; optionally keep the parent column.
    * Ref: datatransform_structureddata.py:78-101. */
  def flattenOneLevel(df: DataFrame, field: String, keepParent: Boolean = false): DataFrame = {
    val st = df.schema(field).dataType.asInstanceOf[StructType]
    val children = st.fieldNames.map(f => col(s"`$field`.`$f`").as(s"${field}_$f")).toSeq
    val kept = df.columns.filter(c => keepParent || c != field).map(c => col(s"`$c`")).toSeq
    df.select(kept ++ children: _*)
  }

  /** Recursive DataFrame flatten: every nested struct field becomes a
    * top-level column named `parent_child_...` — a standalone utility beyond
    * the reference. (The reference's flatten_schema NAME enumerator that
    * custommapping matches paths against is `CustomMapping.flattenPaths`,
    * custom_mapping.py:13-33.) */
  def flattenSchema(df: DataFrame, sep: String = "_"): DataFrame = {
    def expand(prefix: String, path: String, st: StructType): Seq[Column] =
      st.fields.toSeq.flatMap { f =>
        val p = s"$path.`${f.name}`"
        val name = if (prefix.isEmpty) f.name else s"$prefix$sep${f.name}"
        f.dataType match {
          case child: StructType => expand(name, p, child)
          case _                 => Seq(expr(p).as(name))
        }
      }
    val cols = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType => expand(f.name, s"`${f.name}`", st)
        case _              => Seq(col(s"`${f.name}`"))
      }
    }
    df.select(cols: _*)
  }

  /** G4 `xml` — parse an XML-string column into a struct, schema inferred from the
    * data. Spark 4 ships schema_of_xml/from_xml natively.
    * Ref: datatransform_structureddata.py:103-132. */
  def xmlStringToStruct(df: DataFrame, field: String): DataFrame = {
    val sample = df.select(col(field)).na.drop().limit(1).collect()
    if (sample.isEmpty) df
    else {
      val schemaDdl = df.sparkSession.range(1)
        .select(schema_of_xml(lit(sample(0).getString(0))).as("s")).head().getString(0)
      df.withColumn(field, from_xml(col(field), lit(schemaDdl), Map.empty[String, String].asJava))
    }
  }

  /** G5 `json` — parse a JSON-string column into a struct; schema inferred by
    * re-reading the column as a JSON dataset (exactly the reference's approach,
    * datatransform_structureddata.py:134-151). */
  def jsonStringToStruct(df: DataFrame, field: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = spark.read.json(df.select(col(field)).na.drop().as[String]).schema
    df.withColumn(field, from_json(col(field), schema))
  }

  /** G6 `expandpolicymonths` — one row per calendar month a policy is in force:
    * sequence(trunc(eff,'MM'), exp, 1 month) + posexplode_outer, plus 1-based
    * `policy_month_index` and `last_day_of_month`. The reference needs two Python
    * UDFs for this (datatransform_premium.py:98-114); built-ins replace both. */
  def expandPolicyMonths(df: DataFrame, effCol: String, expCol: String,
                         monthCol: String = "policy_month_start",
                         indexCol: String = "policy_month_index",
                         lastDayCol: String = "last_day_of_month",
                         uuidCol: Option[String] = None): DataFrame = {
    val withUuid = uuidCol.fold(df)(u => df.withColumn(u, expr("uuid()")))
    val months = sequence(trunc(col(effCol), "MM"), col(expCol), expr("interval 1 month"))
    val others = withUuid.columns.map(col).toSeq
    withUuid.select(others :+ posexplode_outer(months).as(Seq(indexCol, monthCol)): _*)
      .withColumn(indexCol, col(indexCol) + 1)
      .withColumn(lastDayCol, last_day(col(monthCol)))
  }
}
