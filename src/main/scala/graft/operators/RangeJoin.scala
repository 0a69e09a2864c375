package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range (interval) join — left rows matched to right rows whose
  * [start, end] interval contains the left timestamp, with optional equality
  * keys.
  *
  * Spark plans a raw `BETWEEN` join as a nested loop (O(n×m)); here both
  * sides map into fixed-width time bins — an interval explodes into each bin
  * it covers, a point lands in one — so the match becomes a plain equi-join
  * on (keys, bin) plus an exact residual filter. Shuffle volume is
  * O(points + intervals × avgBinsPerInterval); pick `binWidth` near the
  * typical interval length so that factor stays small. */
object RangeJoin {

  /** @param left      point side
    * @param leftTs    epoch-seconds (or any monotone long) column on `left`
    * @param rightStart/rightEnd inclusive interval bounds on `right` (same units)
    * @param keys      optional equality keys on both sides
    * @param binWidth  bin size in the same units */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      leftTs: String, rightStart: String, rightEnd: String,
                      keys: Seq[String], binWidth: Long,
                      joinType: String = "inner"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin", floor(col(leftTs).cast(LongType) / binWidth))
    val r = right
      .withColumn("__bin", explode(sequence(
        floor(col(rightStart).cast(LongType) / binWidth),
        floor(col(rightEnd).cast(LongType) / binWidth))))
    l.join(r, keys :+ "__bin", joinType)
      .filter(col(leftTs).cast(LongType).between(
        col(rightStart).cast(LongType), col(rightEnd).cast(LongType)))
      .drop("__bin")
  }
}
