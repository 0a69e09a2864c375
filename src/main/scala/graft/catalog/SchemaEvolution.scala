package graft.catalog

import org.apache.spark.sql.types._

/** Schema-evolution policy gate (SURVEY.md §1.3).
  * Faithful port of check_schema_change (glue_catalog_helpers.py:91-173) and
  * the decimal-growth comparison (GlueCatalogDecimal, :75-89), operating on
  * Spark `StructType`s (type names compared as lowercase DDL like the Glue
  * catalog's column strings). */
object SchemaEvolution {

  /** Widening lattice for `evolve`: exact reference pairs
    * (glue_catalog_helpers.py:149-170). */
  private val widenings: Map[String, Set[String]] = Map(
    "string"   -> Set("byte", "tinyint", "smallint", "int", "bigint"),
    "byte"     -> Set("tinyint", "smallint", "int", "bigint"),
    "tinyint"  -> Set("smallint", "int", "bigint"),
    "smallint" -> Set("int", "bigint"),
    "int"      -> Set("bigint"),
    "float"    -> Set("double"),
    "date"     -> Set("timestamp"),
  )

  private val decimalRe = """decimal\((\d+),(\d+)\)""".r

  /** new decimal strictly "grows" old: precision and scale both >= with at
    * least one strictly greater. */
  def decimalGrows(oldType: String, newType: String): Boolean =
    (oldType, newType) match {
      case (decimalRe(op, os), decimalRe(np, ns)) =>
        val (op_, os_, np_, ns_) = (op.toInt, os.toInt, np.toInt, ns.toInt)
        (np_ > op_ && ns_ >= os_) || (np_ >= op_ && ns_ > os_)
      case _ => false
    }

  private def typeName(dt: DataType): String = dt.sql.toLowerCase

  /** Returns true when `incoming` may replace `existing` under `policy`
    * (strict | reorder | evolve | permissive). Name comparison is
    * case-sensitive, as in the reference. */
  def allowed(existing: StructType, incoming: StructType, policy: String): Boolean = {
    val ex = existing.fields.map(f => f.name -> typeName(f.dataType))
    val nw = incoming.fields.map(f => f.name -> typeName(f.dataType))
    policy match {
      case "permissive" => true
      case "strict" => ex.toSeq == nw.toSeq
      case "reorder" =>
        ex.map(_._1).toSet == nw.map(_._1).toSet && nw.length == nw.map(_._1).toSet.size
      case "evolve" =>
        val exMap = ex.toMap
        val nwMap = nw.toMap
        val noDups = nw.length == nwMap.size
        val noDeletes = (exMap.keySet -- nwMap.keySet).isEmpty
        val typesOk = exMap.keySet.intersect(nwMap.keySet).forall { name =>
          val (o, n) = (exMap(name), nwMap(name))
          o == n || widenings.get(o).exists(_.contains(n)) || decimalGrows(o, n)
        }
        noDups && noDeletes && typesOk
      case other =>
        throw new IllegalArgumentException(s"Unsupported value for allow_schema_change $other")
    }
  }

  /** Environment default: Dev→permissive, Test→reorder, else strict
    * (etl_collect_to_cleanse.py:91-97). */
  def defaultPolicy(environment: String): String = environment.toLowerCase match {
    case "dev"  => "permissive"
    case "test" => "reorder"
    case _      => "strict"
  }
}
