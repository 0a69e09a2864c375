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

  /** Gap-based BATCH sessionization — the batch twin of
    * StreamingOps.sessionize: a new session opens when the gap to the user's
    * previous event exceeds `gapSeconds`. Adds `session_idx` (1-based per
    * user, in time order).
    *
    * Gap arithmetic is in integer MICROSECONDS (`unix_micros`), never float
    * seconds, so the boundary comparison is exact and an external SQL replay
    * (epoch_us) reproduces it bit-for-bit.
    *
    * At scale: ONE shuffle by `userCol`; both windows share the same
    * (partition, order) so Catalyst plans a single Window exchange+sort. The
    * per-user frame is the only ordered scope — no global sort exists. Skewed
    * users (one key with millions of events) are the same hazard as any
    * per-key window; upstream bounding (e.g. a per-user event cap like the
    * streaming state guard) applies.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 gapSeconds: Long, tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val order = col(tsCol) +: tieBreak
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // unix_micros needs TIMESTAMP; a TIMESTAMP_NTZ input is reinterpreted in
    // the session zone (this engine pins UTC), so micros == the naive epoch
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val prevMicros = lag(micros, 1).over(w)
    val opens = when(
      prevMicros.isNull || micros - prevMicros > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_idx", sum(opens).over(run))
  }
}
