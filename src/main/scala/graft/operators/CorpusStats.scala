package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-distribution statistics in scale-friendly, oracle-exact
  * formulations. */
object CorpusStats {

  /** Histogram-bucket quantiles: the scalable answer to "p50/p90/p99 of a
    * value per group" over a corpus too large for a global sort. Values land
    * in `nBuckets` fixed-width buckets (one hash-partitioned groupBy with
    * map-side combine — integer counts, no sort of the raw values); the
    * q-quantile is the first bucket whose cumulative count reaches
    * ceil(q·N), computed with exact integer thresholds, so the result is
    * deterministic and replays exactly in SQL. Resolution is the bucket
    * width — the classic histogram-sketch tradeoff, explicit here.
    *
    * @param qs quantiles as (name, numerator, denominator) — e.g.
    *           ("p50", 1, 2); thresholds are ceil(num·N / den) in exact
    *           integer arithmetic
    * @return one row per group: groupCols*, n, and per quantile the bucket's
    *         lower bound `<name>_lo` (bucket index × width, capped bucket) */
  def histogramQuantiles(df: DataFrame, valueCol: String,
                         groupCols: Seq[String], bucketWidth: Long,
                         nBuckets: Int,
                         qs: Seq[(String, Long, Long)]): DataFrame = {
    require(bucketWidth > 0 && nBuckets > 0 && qs.nonEmpty)
    val gcols = groupCols.map(col)
    val bucket = least(expr(s"$valueCol div $bucketWidth"), lit(nBuckets - 1L))
    val counts = df.select((gcols :+ bucket.as("__b")): _*)
      .groupBy((gcols :+ col("__b")): _*).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("__b"))
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(gcols: _*)))
    val qCols: Seq[Column] = qs.map { case (name, num, den) =>
      // first bucket with cum >= ceil(num*N/den); exact: (num*N + den - 1) div den
      min(when(col("__cum") * den >= col("__n") * num, col("__b")))
        .multiply(bucketWidth).as(s"${name}_lo")
    }
    cum.groupBy(gcols: _*)
      .agg(max(col("__n")).as("n"), qCols: _*)
  }
}
