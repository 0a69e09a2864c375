package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.6, W1–W2). */
object WindowOps {

  /** W1 `filldown` — forward-fill nulls in `fields` ordered by `sort` within
    * optional `partition` columns. Ref: datatransform_misc.py:37-74 (two-pass
    * count+first trick); re-expressed as the idiomatic single-pass
    * `last(col, ignoreNulls=true)` over an unbounded-preceding row frame — one
    * shuffle instead of two, same semantics.
    *
    * At scale: partitioned fill (the common case) shuffles by the partition key
    * only. A fill with NO partition key requires a global order — a single-task
    * window — so callers at 100 TB must supply partition columns; we keep the
    * degenerate global form for reference parity on small data.
    */
  def fillDown(df: DataFrame, fields: Seq[String], sort: Seq[Column],
               partition: Seq[Column] = Seq.empty): DataFrame = {
    val base = if (partition.isEmpty) Window.partitionBy(lit(1)) else Window.partitionBy(partition: _*)
    val w = base.orderBy(sort: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = fields.map(f => f -> last(col(f), ignoreNulls = true).over(w)).toMap
    df.withColumns(filled)
  }

  /** W2 `rownumber` — row_number over (partition, sort); both default lit(1).
    * Ref: datatransform_misc.py:76-98. */
  def rowNumber(df: DataFrame, outCol: String,
                partition: Seq[Column] = Seq(lit(1)),
                sort: Seq[Column] = Seq(lit(1))): DataFrame = {
    val p = if (partition.isEmpty) Seq(lit(1)) else partition
    val s = if (sort.isEmpty) Seq(lit(1)) else sort
    df.withColumn(outCol, row_number().over(Window.partitionBy(p: _*).orderBy(s: _*)))
  }

  /** Top-k rows per group: rank by `order` within `partition`, keep rank<=k.
    * Building block for ANN top-k and entity-match best-candidate selection.
    * Uses row_number (not rank) so output size is bounded k×groups. */
  def topKPerGroup(df: DataFrame, partition: Seq[Column], order: Seq[Column], k: Int,
                   rankCol: String = "rank"): DataFrame =
    df.withColumn(rankCol, row_number().over(Window.partitionBy(partition: _*).orderBy(order: _*)))
      .filter(col(rankCol) <= k)
}
