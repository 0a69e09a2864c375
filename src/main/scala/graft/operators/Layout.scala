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
}
