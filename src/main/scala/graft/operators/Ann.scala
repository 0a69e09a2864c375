package graft.operators

import graft.functions.{SimilarityFunctions => S}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. Queries are broadcast (small side);
  *    the corpus streams map-side — no corpus shuffle, scales to any corpus size
  *    with bounded query-set size. Per-partition top-k then global top-k via a
  *    single narrow window on (query, rank).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus bucketed once (reusable,
  *    write-out-able), probes join only their own bucket. The scale path when the
  *    query set is large.
  */
object Ann {

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * a value in [-1,1) derived from a fixed LCG — identical across engines and
    * runs, no Math.random. */
  private def planeComponent(p: Int, d: Int): Double = {
    var x = p.toLong * 1000003L + d.toLong * 7919L + 12345L
    x = x * 6364136223846793005L + 1442695040888963407L
    x = x * 6364136223846793005L + 1442695040888963407L
    (x >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Sign-bit bucket of a vector under `planes` fixed hyperplanes: a long whose
    * bit p is 1 iff dot(v, plane_p) > 0. Native Catalyst expression (one array
    * scan; the element_at formulation built a dim×planes expression tree). */
  def hyperplaneBucket(v: Column, dim: Int, planes: Int): Column =
    graft.functions.expressions.HashExpressions.hyperplane_bucket(v, dim, planes)

  /** Built-in-only formulation, kept for cross-checking the expression. */
  def hyperplaneBucketHof(v: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dotP = (0 until dim).map(d => element_at(v, d + 1) * lit(planeComponent(p, d))).reduce(_ + _)
      when(dotP > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact top-k by cosine: broadcast the query frame against the corpus.
    * Output: (queryIdCol, corpus idCol, cosine, rank). Ties broken by corpus id
    * for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, queryIdCol: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol), col(vecCol).as("__qv")))
    val scored = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .join(q)
      .withColumn("cosine", S.cosine(col("__qv"), col("__cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))))
      .filter(col("rank") <= k)
      .drop("__qv", "__cv")
  }

  /** LSH ANN: corpus and queries bucketed by [[hyperplaneBucket]]; each query
    * joins only its bucket, then exact cosine + top-k within the candidates.
    * Recall is tunable via `planes` (fewer planes → bigger buckets → higher
    * recall, more compute). Multi-probe: also probe buckets at hamming
    * distance 1 when `probe1` (flips each bit once → planes+1 probes/query). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, queryIdCol: String,
              dim: Int, k: Int, planes: Int = 10, probe1: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .withColumn("bucket", hyperplaneBucket(col("__cv"), dim, planes))
    val qb = queries.select(col(queryIdCol), col(vecCol).as("__qv"))
      .withColumn("bucket0", hyperplaneBucket(col("__qv"), dim, planes))
    val probes =
      if (!probe1) array(col("bucket0"))
      else array(col("bucket0") +: (0 until planes).map(p =>
        col("bucket0").bitwiseXOR(lit(1L << p))): _*)
    val q = qb.withColumn("bucket", explode(probes)).drop("bucket0")
    q.join(c, Seq("bucket"))
      .withColumn("cosine", S.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine"), col("rank"))
  }
}
