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
}
