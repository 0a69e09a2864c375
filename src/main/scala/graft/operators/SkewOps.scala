package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale shuffles. AQE's skew-join
  * splitting covers sort-merge joins automatically; these helpers cover the
  * cases it does not: skewed AGGREGATION keys and broadcast-infeasible skewed
  * joins. */
object SkewOps {

  /** Two-phase (salted) aggregation: partial-aggregate on (keys × salt) then
    * final-aggregate on keys. Correct for any algebraic aggregate expressed as
    * (partial, merge) pairs; here exposed for the common sum/count/min/max
    * case via a map of column → function name.
    *
    * A hot grouping key that would funnel into one reducer is spread over
    * `saltBuckets` partial groups first — the second shuffle carries only
    * `saltBuckets` rows per hot key. */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      aggs: Map[String, String], saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id()
      + pmod(hash(keys.map(col): _*), lit(saltBuckets)), lit(saltBuckets)))
    val partialExprs = aggs.toSeq.map { case (c, fn) =>
      expr(s"$fn(`$c`)").as(s"__p_$c")
    }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
    val mergeFn = aggs.map { case (c, fn) =>
      val merge = fn.toLowerCase match {
        case "count" | "sum" => "sum"
        case "min" => "min"
        case "max" => "max"
        case other => throw new IllegalArgumentException(
          s"saltedAggregate supports sum/count/min/max, got $other")
      }
      c -> merge
    }
    val finalExprs = aggs.toSeq.map { case (c, fn) =>
      expr(s"${mergeFn(c)}(`__p_$c`)").as(s"${fn}_$c")
    }
    partial.groupBy(keys.map(col): _*).agg(finalExprs.head, finalExprs.tail: _*)
  }

  /** Skewed equi-join: replicate the (small-ish) right side `saltBuckets`
    * times and salt the left side, so one hot key's rows spread across
    * `saltBuckets` reducers instead of one. Use when the right side is too
    * large to broadcast but small enough to replicate. Inner/left joins. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType).drop("__salt")
  }
}
