package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._

/** Config dialects (SURVEY.md §7.2 item 1): the per-dataset JSON spec with
  * `input_spec` + `transform_spec` (ordered keys, `name:suffix` repetition
  * convention, etl_collect_to_cleanse.py:272-291), the mapping CSV, and the DQ
  * rules JSON. Jackson (ships with Spark) preserves JSON object key order,
  * which IS the transform execution order. */
object Specs {

  private val mapper = new ObjectMapper()

  def parseJson(text: String): JsonNode = mapper.readTree(text)

  def readJsonFile(path: String): JsonNode =
    parseJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  /** A dataset spec file: input_spec + transform_spec. */
  case class DatasetSpec(inputSpec: Option[JsonNode], transformSpec: Seq[(String, JsonNode)])

  def datasetSpec(root: JsonNode): DatasetSpec = {
    val input = Option(root.get("input_spec"))
    val transforms = Option(root.get("transform_spec")) match {
      case Some(o: ObjectNode) =>
        o.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
      case _ => Seq.empty
    }
    DatasetSpec(input, transforms)
  }

  /** transform key "date:2" → dispatch name "date" (suffix allows reuse,
    * etl_collect_to_cleanse.py:276-283). */
  def dispatchName(specKey: String): String = specKey.split(":", 2)(0)

  /** DQ rules file: ruleset name → action tier → rule strings.
    * (convert_single_quotes is accepted and ignored — our parser reads both
    * quote styles directly.) */
  def dqRules(root: JsonNode): Map[String, Map[String, Seq[String]]] =
    root.properties().asScala
      .filter(e => e.getValue.isObject)
      .map { e =>
        e.getKey -> e.getValue.properties().asScala
          .filter(_.getValue.isArray)
          .map(a => a.getKey -> a.getValue.elements().asScala.map(_.asText()).toSeq)
          .toMap
      }.toMap

  /** Mapping CSV: `SourceName,DestName[,threshold,scorer]`, header row
    * required; BOM tolerated (the reference's shipped files carry one). */
  def mappingCsv(text: String): Seq[graft.mapping.MappingRow] = {
    val lines = text.replace("﻿", "").linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    lines.drop(1).map { line =>
      val parts = line.split(",").map(_.trim)
      graft.mapping.MappingRow(
        parts(0),
        if (parts.length > 1) normalizeDestNull(parts(1)) else parts(0),
        if (parts.length > 2 && parts(2).nonEmpty) Some(parts(2).toDouble) else None,
        if (parts.length > 3 && parts(3).nonEmpty) Some(parts(3)) else None)
    }
  }

  /** The reference treats DestName "Null" (any case) as drop
    * (custom_mapping.py uses lowercase compare). */
  private def normalizeDestNull(dest: String): String =
    if (dest.equalsIgnoreCase("null")) "null" else dest

  /** Split a SQL file into statements on ';' (the reference's handling of
    * athena-*.sql / redshift-*.sql view files, etl_cleanse_to_consume.py:
    * 212-223), dropping line comments and empty statements. */
  def sqlStatements(text: String): Seq[String] =
    text.linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n")
      .split(";").map(_.trim).filter(_.nonEmpty).toSeq

  /** JSON string escape shared by the JSONL lineage sink and Verify's
    * oracle_sql.json writer (backslash, quote, all control chars). */
  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  // -------------------------------------------------- JsonNode access helpers

  implicit class NodeOps(val n: JsonNode) extends AnyVal {
    def str(field: String): Option[String] = Option(n.get(field)).filterNot(_.isNull).map(_.asText)
    def int(field: String): Option[Int] = Option(n.get(field)).filterNot(_.isNull).map(_.asInt)
    def dbl(field: String): Option[Double] = Option(n.get(field)).filterNot(_.isNull).map(_.asDouble)
    def bool(field: String): Option[Boolean] = Option(n.get(field)).filterNot(_.isNull).map(_.asBoolean)
    def strList(field: String): Seq[String] =
      Option(n.get(field)).filterNot(_.isNull).toSeq.flatMap { v =>
        // lenient: a scalar where the dialect wants a list means the single
        // value (silently returning empty would e.g. drop a filldown sort key
        // and fill in arbitrary row order)
        if (v.isArray) v.elements().asScala.map(_.asText()).toSeq
        else Seq(v.asText())
      }
    def elems: Seq[JsonNode] = n.elements().asScala.toSeq
    def objFields: Seq[(String, JsonNode)] =
      n.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
  }
}
