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
    val l = left.withColumn("__bin", floor(col(leftTs).cast(LongType) / binWidth)).alias("l")
    val r = right
      .withColumn("__bin", explode(sequence(
        floor(col(rightStart).cast(LongType) / binWidth),
        floor(col(rightEnd).cast(LongType) / binWidth))))
      .alias("r")
    // the range predicate goes INTO the join condition — filtering after the
    // join would silently turn an outer join into an inner one (unmatched
    // rows have null bounds, and filter drops null predicates)
    val cond = (keys.map(k => col(s"l.$k") === col(s"r.$k")) :+
      (col(s"l.__bin") === col(s"r.__bin")) :+
      col(s"l.$leftTs").cast(LongType).between(
        col(s"r.$rightStart").cast(LongType), col(s"r.$rightEnd").cast(LongType)))
      .reduce(_ && _)
    val rightOut = right.columns.filterNot(keys.contains)
      .map(c => col(s"r.$c").as(c)).toSeq
    l.join(r, cond, joinType)
      .select(keys.map(k => col(s"l.$k").as(k)) ++
        left.columns.filterNot(keys.contains).map(c => col(s"l.$c").as(c)) ++
        rightOut: _*)
  }
}
