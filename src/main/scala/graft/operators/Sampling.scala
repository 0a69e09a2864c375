package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent dataset splitting for training
  * pipelines: a row's split is a pure function of its id (md5 bucket), so the
  * assignment is reproducible across runs, engines, and cluster sizes, and
  * new rows never reshuffle old ones between splits — unlike randomSplit,
  * which depends on partitioning and seed plumbing. */
object Sampling {

  /** Stable bucket in [0, 65536) from the md5 of the stringified id.
    * NULL ids land deterministically in bucket 0 (the first-named split /
    * always-sampled stratum) instead of silently falling through to the
    * LAST split via three-valued logic. */
  def hashBucket(id: Column): Column =
    coalesce(conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int"), lit(0))

  /** Assign each row a named split with the given weights (normalized).
    * Buckets partition [0, 65536) by cumulative weight. */
  def splitByHash(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights required")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(f => math.round(f * 65536).toInt)
    val bucket = hashBucket(col(idCol))
    val expr = weights.zipWithIndex.foldRight(lit(weights.last._1)) {
      case (((name, _), i), acc) =>
        when(bucket >= cuts(i) && bucket < cuts(i + 1), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic stratified sample: keep `fractions(stratum)` of each
    * stratum (default fraction for unlisted strata), selected by the same
    * stable id-hash — the reproducible analog of `DataFrame.stat.sampleBy`.
    * The hash is salted with the stratum so the same id can be selected in
    * one stratum and not another. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    val bucket = hashBucket(concat(col(stratumCol).cast("string"), lit("|"),
      col(idCol).cast("string")))
    val cutoff = fractions.foldLeft(lit(math.round(defaultFraction * 65536).toInt)) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(math.round(f * 65536).toInt)).otherwise(acc)
    }
    df.filter(bucket < cutoff)
  }
}
