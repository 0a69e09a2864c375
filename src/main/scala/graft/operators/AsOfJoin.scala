package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `right.time <= left.time` on the same key (the time-series/event-state
  * operator Spark lacks natively).
  *
  * Spark-first composition, not a cross/range join: tag both sides, union,
  * ONE shuffle on the key, and a `last(_, ignoreNulls)` running window carries
  * the latest right-side payload forward onto each left row. Cost is
  * O(n log n) per key partition (the sort inside the window), memory is
  * bounded by the window frame (running, not unbounded buffering) — this
  * shape survives any corpus size as long as single keys fit a partition;
  * salt hot keys upstream if not. */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its latest state as of left.time attaches)
    * @param keys       equality keys present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightCols  right-side payload columns to attach (null when no
    *                   right row precedes the left row) */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    val rightTagged = right
      .select((keys.map(col) :+ col(rightTime).as("__t")) :+
        struct(rightCols.map(col): _*).as("__payload"): _*)
      .withColumn("__is_left", lit(0))

    val unioned = leftTagged.select(
      (keys.map(col) :+ col("__t") :+ col("__is_left") :+ col("__payload")) ++
        left.columns.filterNot(c => keys.contains(c)).map(c => col(c)): _*)
      .unionByName(rightTagged, allowMissingColumns = true)

    // right rows sort BEFORE left rows at equal time → inclusive (<=)
    // semantics; the payload-hash tiebreak makes the winner among right rows
    // with IDENTICAL timestamps deterministic (any stable total order works —
    // without it, `last` returns whichever duplicate the sort happened to
    // place last). Hash expressions reject MapType (Spark's
    // HASH_MAP_TYPE check), so map-carrying payloads keep the legacy
    // two-key order rather than failing analysis.
    def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case _ => false
    }
    val payloadType = right.select(rightCols.map(col): _*).schema
    val order =
      if (containsMap(payloadType)) Seq(col("__t"), col("__is_left"))
      else Seq(col("__t"), col("__is_left"), xxhash64(col("__payload")))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned.withColumn("__state", last(col("__payload"), ignoreNulls = true).over(w))
    val leftOut = carried.filter(col("__is_left") === 1)
    val outCols = (keys ++ left.columns.filterNot(keys.contains)).map(col) ++
      rightCols.map(c => col(s"__state.$c").as(c))
    leftOut.select(outCols: _*)
  }
}
