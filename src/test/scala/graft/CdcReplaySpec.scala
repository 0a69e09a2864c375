package graft

import graft.catalog.HiveParquetFormat
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-batch replay idempotence for the streaming CDC upsert (q138's
  * foreachBatch → mergeUpsert): Structured Streaming's foreachBatch is
  * AT-LEAST-ONCE — after a failure between the batch's side effect and the
  * checkpoint commit, the SAME batch (same epoch) is re-delivered. The CDC
  * merge must therefore be a per-key idempotent operation: the winner per
  * key is argmax(ts, event_id) over {stored row} ∪ {batch rows}, and since
  * the stored row after the first application already dominates the batch,
  * re-applying the batch elects the same winner. These specs ASSERT that —
  * for exact re-delivery, for replay of an older (already superseded)
  * batch, and for replay interleaved with newer data — rather than assuming
  * it. README documents the per-sink exactly-once story. */
class CdcReplaySpec extends SparkSpec {
  import spark.implicits._

  /** The q138 merge closure verbatim: contest only the touched keys. */
  private def applyBatch(table: String, batch: DataFrame): Unit = {
    spark.sql(s"REFRESH TABLE $table")
    val cur = spark.table(table)
      .join(batch.select("k").distinct(), Seq("k"), "left_semi")
    val merged = cur.unionByName(batch)
      .withColumn("__r", row_number().over(Window.partitionBy(col("k"))
        .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("__r") === 1).drop("__r")
    HiveParquetFormat.mergeUpsert(spark, table, merged, "k")
  }

  private def snapshot(table: String): Seq[org.apache.spark.sql.Row] = {
    spark.sql(s"REFRESH TABLE $table")
    spark.table(table).orderBy(col("k")).collect().toSeq
  }

  private def mkTable(): String = {
    val db = s"cdcreplay${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val t = s"$db.latest"
    Seq.empty[(Long, Long, java.sql.Timestamp, Double)]
      .toDF("k", "event_id", "ts", "value")
      .write.format("parquet").saveAsTable(t)
    t
  }

  private def batchOf(rows: (Long, Long, Long, Double)*): DataFrame =
    rows.map { case (k, id, ts, v) =>
      (k, id, new java.sql.Timestamp(ts * 1000), v)
    }.toDF("k", "event_id", "ts", "value")

  test("re-applying the same batch (same epoch) leaves the table identical") {
    val t = mkTable()
    val b1 = batchOf((1L, 10L, 100L, 1.0), (2L, 20L, 100L, 2.0))
    val b2 = batchOf((1L, 11L, 200L, 1.5), (3L, 30L, 150L, 3.0))
    applyBatch(t, b1)
    applyBatch(t, b2)
    val afterOnce = snapshot(t)
    applyBatch(t, b2) // crash-recovery re-delivery of the latest epoch
    assert(snapshot(t) == afterOnce)
    applyBatch(t, b2) // and again — idempotent at any re-delivery count
    assert(snapshot(t) == afterOnce)
  }

  test("replaying an OLDER batch after newer data is a no-op (late-data safety)") {
    val t = mkTable()
    val b1 = batchOf((1L, 10L, 100L, 1.0), (2L, 20L, 100L, 2.0))
    val b2 = batchOf((1L, 11L, 200L, 1.5))
    applyBatch(t, b1)
    applyBatch(t, b2)
    val afterBoth = snapshot(t)
    // a restarted stream may re-run from an earlier checkpoint: the
    // superseded epoch must not resurrect old versions
    applyBatch(t, b1)
    assert(snapshot(t) == afterBoth)
  }

  test("tie on ts breaks by event_id — deterministic under re-delivery") {
    val t = mkTable()
    val b = batchOf((1L, 10L, 100L, 1.0), (1L, 12L, 100L, 9.0), (1L, 11L, 100L, 5.0))
    applyBatch(t, b)
    val afterOnce = snapshot(t)
    assert(afterOnce.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 12L)))
    applyBatch(t, b)
    assert(snapshot(t) == afterOnce)
  }

  test("incremental appends fragment the table; compaction repairs it content-invariantly") {
    // the operational loop round 9 closes: each per-run append adds files
    // to its partitions (the K1 reload path between full rewrites) →
    // OPTIMIZE → same rows, fewer files. (The CDC merge path REWRITES its
    // affected partitions per batch, so its fragmentation is bounded per
    // partition; appends are the unbounded accumulator.)
    val db = s"cdcfrag${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val t = s"$db.appended"
    batchOf((0L, 1L, 10L, 1.0)).write.format("parquet")
      .partitionBy("k").saveAsTable(t)
    (1 to 12).foreach { i =>
      batchOf(((i % 4).toLong, 100L + i, i.toLong * 10, i * 1.0))
        .select(col("event_id"), col("ts"), col("value"), col("k"))
        .write.mode("append").insertInto(t)
    }
    val before = snapshot(t)
    val (_, m0) = graft.catalog.Compaction.listManifests(spark, t)
    assert(m0.map(_.files).sum >= 13, s"appends must fragment: $m0")
    val report = graft.catalog.Compaction.compactTable(spark, t, 64L << 20)
    assert(report.filesAfter < report.filesBefore)
    assert(snapshot(t).map(_.toSeq).sortBy(_.toString) ==
      before.map(_.toSeq).sortBy(_.toString),
      "compaction must not change appended content")
  }

  test("full replayed stream (all epochs twice, in order) converges to the same table") {
    val t = mkTable()
    val epochs = Seq(
      batchOf((1L, 10L, 100L, 1.0), (2L, 20L, 110L, 2.0)),
      batchOf((1L, 11L, 200L, 1.1), (3L, 30L, 120L, 3.0)),
      batchOf((2L, 21L, 300L, 2.1)))
    epochs.foreach(applyBatch(t, _))
    val once = snapshot(t)
    // at-least-once worst case: every epoch delivered twice back-to-back
    val t2 = mkTable()
    epochs.foreach { e => applyBatch(t2, e); applyBatch(t2, e) }
    assert(snapshot(t2).map(_.toSeq) == once.map(_.toSeq))
  }
}
