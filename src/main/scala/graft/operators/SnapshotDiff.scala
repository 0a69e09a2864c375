package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff (CDC without a log): classify every key as insert / delete /
  * update / unchanged between two table versions — the feed for incremental
  * downstream refreshes when the source only provides full reloads (the
  * reference's per-file full-partition loads are exactly that shape).
  *
  * One full-outer shuffle join on the key; value comparison is a single
  * sha2-of-json-struct per side, so wide rows compare as one string instead
  * of N column equality checks, and null stays distinct from every real
  * value (the JSON field is omitted). */
object SnapshotDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
           compareCols: Seq[String], includeUnchanged: Boolean = false): DataFrame = {
    def fingerprint = sha2(to_json(struct(compareCols.map(col): _*)), 256)
    val o = oldDf.select(keys.map(col) :+ fingerprint.as("__old_fp"): _*)
    val n = newDf.select(keys.map(col) :+ fingerprint.as("__new_fp"): _*)
    val joined = o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__old_fp").isNull, "insert")
          .when(col("__new_fp").isNull, "delete")
          .when(col("__old_fp") =!= col("__new_fp"), "update")
          .otherwise("unchanged"))
      .drop("__old_fp", "__new_fp")
    if (includeUnchanged) joined else joined.filter(col("change_type") =!= "unchanged")
  }

  /** Slowly-Changing-Dimension TYPE 2 history from a change feed: collapse
    * consecutive same-value rows per key, then interval-ize — each surviving
    * change opens a version valid [its ts, next change's ts), the last one
    * open-ended (`valid_to` NULL, `is_current` true). The entity-history
    * table an insurance consume layer serves (policy status over time),
    * built from the same feed the CDC upsert (q138) folds to latest-only.
    *
    * Shape: ONE window partitioned by the key (lag for the change filter,
    * lead for the interval close) — the sessionize contract: per-key frames,
    * no global sort. Ties on ts break by `ordCol` so the history is total.
    *
    * @return (key, value, valid_from, valid_to, is_current) */
  def scd2(feed: DataFrame, keyCol: String, tsCol: String, valueCol: String,
           ordCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val changes = feed
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(valueCol))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .select(col(keyCol), col(valueCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
