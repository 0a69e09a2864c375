package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the dominant cost of most queries is the scan, and the lever is
  * LAYOUT: files clustered so that a predicate on ANY of several dimensions
  * touches few of them. A plain sort clusters only its leading column;
  * Z-ORDER (Morton) interleaves the bits of several dimensions so that rows
  * close in the curve are close in every dimension — each parquet file then
  * covers a small hyper-rectangle and min/max footer stats prune on all
  * dimensions at once (the Delta/Iceberg OPTIMIZE ZORDER strategy, built here
  * from plain Spark primitives: an integer bit-interleave expression +
  * repartitionByRange + sortWithinPartitions).
  */
object Layout {

  /** Morton (Z-order) code: interleave the low `bits` bits of each dimension
    * column (round-robin, dim 0 owns the least-significant position of each
    * group). Pure integer Column arithmetic — codegen'd, replayable in SQL.
    *
    * Callers map each dimension to a bounded non-negative integer first
    * (range-rank, bucket id, or modulus); values ≥ 2^bits simply truncate to
    * their low bits, so bound them upstream for a meaningful curve. */
  def mortonCode(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits > 0 && dims.size * bits <= 62,
      s"need 0 < dims*bits <= 62, got ${dims.size} dims x $bits bits")
    val n = dims.size
    val terms = for {
      j <- 0 until bits
      i <- 0 until n
    } yield shiftleft(shiftright(dims(i).cast("long"), j).bitwiseAND(lit(1L)),
      j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Z-order the frame: add the Morton code of `dims` as `zCol`, range-
    * partition by it, and sort each partition by it — after a write, every
    * output file covers a compact curve segment, i.e. a small box in ALL
    * dimensions, so footer min/max stats prune multi-dimensional predicates.
    *
    * Exactly ONE shuffle (the range exchange, sampled bounds) and a
    * per-partition sort — never a global sort. The curve order is fully
    * deterministic; only the partition CUTS vary with range sampling, which
    * affects file boundaries, not content or pruning correctness. */
  def zorderBy(df: DataFrame, dims: Seq[Column], bits: Int,
               numPartitions: Int, zCol: String = "zval"): DataFrame =
    df.withColumn(zCol, mortonCode(dims, bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))

  /** Hilbert-curve layout (2-D): same physical shape as [[zorderBy]] but on
    * the Hilbert index, whose CONSECUTIVE values are always grid-adjacent —
    * no quadrant-seam jumps — so curve segments (files) cover tighter boxes
    * than the Z curve at the same size: measurably fewer files overlap a
    * given rectangle predicate. The index is a codegen'd per-row kernel
    * ([[graft.functions.expressions.Kernels.hilbertIndex]]). */
  def hilbertBy(df: DataFrame, x: Column, y: Column, bits: Int,
                numPartitions: Int, hCol: String = "hval"): DataFrame =
    df.withColumn(hCol, graft.functions.expressions.HashExpressions
        .hilbert_index(x.cast("long"), y.cast("long"), bits))
      .repartitionByRange(numPartitions, col(hCol))
      .sortWithinPartitions(col(hCol))

  // ------------------------------------------- KLL-driven range partitioning

  /** `n−1` range cut points for `valueCol` from ONE KLL pass — the
    * equal-mass bounds `repartitionByRange`'s reservoir sampling
    * approximates. Spark's range exchange samples ~100 rows per output
    * partition, so on a skewed or lumpy distribution the sampled bounds
    * carry a few-percent rank error each and file sizes spread accordingly;
    * the KLL sketch (k=4096 ≈ 0.4 % rank error, mergeable map-side) prices
    * the same bounds from the WHOLE distribution in one aggregation. */
  def rangeBoundsFromKll(df: DataFrame, valueCol: Column, n: Int,
                         k: Int = 4096): Array[Double] = {
    require(n > 1, s"need n > 1 ranges, got $n")
    import graft.functions.expressions.{SketchAggregates => SK}
    val sk = df.agg(SK.kll_sketch(valueCol.cast("double"), k).as("sk"))
    val row = sk.select((1 until n).map(i =>
      SK.kll_quantile(col("sk"), i.toDouble / n).as(s"q$i")): _*).head()
    // an empty (or all-null) input yields null quantiles — 0 bounds = one
    // range, the same graceful degradation repartitionByRange has
    (0 until n - 1).flatMap(i =>
      if (row.isNullAt(i)) None else Some(row.getDouble(i))).toArray
  }

  /** Range-bucket id (0..bounds.length) of `valueCol` under the given cut
    * points: the count of bounds strictly below the value, monotone in the
    * value so bucket order IS value order. Small bound lists compile to a
    * codegen'd when-chain; past 64 bounds the chain would blow the 64 KB
    * generated-method limit (falling back to interpreted eval, or a
    * StackOverflow at thousands of bounds — exactly the huge-partition case
    * kllBounds targets), so larger lists count via one HOF filter over a
    * constant array — a shallow expression whatever the bound count. */
  def rangeBucket(valueCol: Column, bounds: Array[Double]): Column =
    if (bounds.length <= 64)
      bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(valueCol.cast("double") > lit(b), 1).otherwise(0)
      }
    else
      size(filter(typedLit(bounds.toSeq),
        b => valueCol.cast("double") > b))

  /** Range repartition with KLL-priced bounds: assign the equal-mass bucket
    * id, place each bucket in ITS OWN partition via an exact identity
    * partitioner, sort within partitions by the value.
    *
    * Why not `repartitionByRange` on the bucket id: every DataFrame-level
    * range exchange re-SAMPLES its keys — on the raw value (or any
    * composite containing it) that re-prices the very quantiles the sketch
    * just computed, and on the n-valued bucket id the sampler's tie-stepping
    * bound selection measurably yields empty/doubled partitions when
    * distinct keys ≈ partitions. The one-per-bucket placement is a
    * deterministic integer mapping, so this is the rare case where a raw
    * `Partitioner` is the honest tool (the narrow per-partition sort and
    * all downstream work stay in the DataFrame plan). Duplicate cut points
    * (a value heavier than a whole bucket) collapse, so partitions are
    * never empty by construction. Two passes over the input (sketch +
    * exchange) vs one, bought back in even file sizes. */
  def repartitionByKllRange(df: DataFrame, valueCol: Column, n: Int,
                            k: Int = 4096): DataFrame = {
    if (n <= 1) return df.coalesce(1).sortWithinPartitions(valueCol)
    val bounds = rangeBoundsFromKll(df, valueCol, n, k).distinct
    if (bounds.isEmpty) return df.coalesce(1).sortWithinPartitions(valueCol)
    val m = bounds.length + 1
    val bucketed = df.withColumn("__kllb", rangeBucket(valueCol, bounds))
    val idx = bucketed.schema.fieldIndex("__kllb")
    val placed = bucketed.rdd.map(r => (r.getInt(idx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = m
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      }).map(_._2)
    df.sparkSession.createDataFrame(placed, bucketed.schema)
      .drop("__kllb")
      .sortWithinPartitions(valueCol)
  }
}
