package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Value-substitution lookup joins (SURVEY.md §2.4 J1–J2).
  *
  * The reference fetches tiny key/value sets from DynamoDB and broadcast
  * left-joins them onto the frame (datatransform_lookup.py:43-117, 162-221).
  * Here the lookup side is any small DataFrame (loaded from a local parquet/JSON
  * "lookup store"); we keep the explicit `broadcast()` hint — lookup tables are
  * small by construction, and at 100 TB the fact side must never shuffle for
  * these joins.
  */
object Lookup {

  /** J1 `lookup` — replace values in `field` via a (origValue,newValue) map-frame.
    * Left-outer broadcast join; unmatched keeps null unless `noMatch` given.
    * `source` semantics: when provided, derive a NEW column instead of replacing. */
  def lookup(df: DataFrame, lookupDf: DataFrame, field: String,
             origCol: String = "orig_value", newCol: String = "new_value",
             source: Option[String] = None, noMatch: Option[String] = None): DataFrame = {
    val src = source.getOrElse(field)
    val lkp = broadcast(lookupDf.select(col(origCol).as("__lkp_key"), col(newCol).as("__lkp_val")))
    val joined = df.join(lkp, df(src) === lkp("__lkp_key"), "left")
    val replaced = noMatch match {
      case Some(d) => joined.withColumn(field, coalesce(col("__lkp_val"), lit(d)))
      case None    => joined.withColumn(field, col("__lkp_val"))
    }
    replaced.drop("__lkp_key", "__lkp_val")
  }

  /** J2 `multilookup` — composite-key lookup returning several attribute columns.
    * Join key is `concat_ws("-", matchColumns)` vs the lookup frame's `keyCol`;
    * `returnAttributes` are appended; `noMatch` fills unmatched per-attribute.
    * Ref: datatransform_lookup.py:162-221. */
  def multiLookup(df: DataFrame, lookupDf: DataFrame, matchColumns: Seq[String],
                  keyCol: String, returnAttributes: Seq[String],
                  noMatch: Map[String, Any] = Map.empty): DataFrame = {
    val lkp = broadcast(lookupDf.select((col(keyCol).as("__lkp_key") +: returnAttributes.map(col)): _*))
    val withKey = df.withColumn("__match_key", concat_ws("-", matchColumns.map(col): _*))
    val joined = withKey.join(lkp, col("__match_key") === col("__lkp_key"), "left")
      .drop("__match_key", "__lkp_key")
    if (noMatch.isEmpty) joined else joined.na.fill(noMatch)
  }
}
