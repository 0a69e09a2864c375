package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted row deletion over Hive-layout tables — the right-to-be-forgotten
  * verb a training-data lake must support alongside OPTIMIZE
  * ([[Compaction]]): given a frame of keys, rewrite ONLY the partitions that
  * contain matching rows, leaving every other partition's files untouched.
  *
  * Mechanism: one semi-join finds the affected partition tuples
  * (driver-bounded — one row per affected PARTITION, not per deleted row);
  * each affected partition's survivors are materialized
  * (localCheckpoint — the overwrite below must not read the path it
  * replaces) and written back with a STATIC `INSERT OVERWRITE … PARTITION`
  * spec. Static, not dynamic, deliberately: dynamic partition overwrite
  * only replaces partitions PRESENT in the result, so a partition whose
  * rows are ALL deleted would emit nothing, be skipped, and silently keep
  * the very rows the delete targeted — static overwrite of an empty result
  * clears the partition. Each statement goes through Spark's file
  * committer (staging dir + rename), so a crash mid-delete leaves
  * partitions either old or new, never mixed; re-running the same delete
  * is a no-op (no matching keys remain → no affected partitions).
  *
  * Scale shape: cost is one pruned scan + rewrite per AFFECTED partition —
  * a handful of deletion requests against a date-partitioned 100 TB table
  * touches only the dates those users appear in; the untouched-partition
  * invariance is spec-asserted file-by-file. Single writer assumed (the
  * Hive-layout caveat shared with [[Compaction.compactTable]]).
  */
object Retention {

  final case class DeleteReport(rowsDeleted: Long, partitionsRewritten: Int,
                                partitionsSeen: Int)

  /** Partition-spec literal: numbers and booleans render bare, EVERYTHING
    * else (strings, dates, timestamps — anything whose toString the
    * partition-spec grammar cannot lex as one token) renders as a quoted,
    * escaped string; Hive partition semantics coerce quoted literals to
    * the partition column's type. */
  private def sqlLit(v: Any): String = v match {
    case null => "NULL"
    case n: java.lang.Number => n.toString
    case b: java.lang.Boolean => b.toString
    case other => "'" + other.toString.replace("'", "''") + "'"
  }

  /** Delete every row of `table` whose `keyCol` appears in `keys`.
    * Unpartitioned tables rewrite wholesale (there is nothing to prune). */
  def deleteRows(spark: SparkSession, table: String, keyCol: String,
                 keys: DataFrame,
                 lineage: Option[graft.lineage.Lineage] = None): DeleteReport = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val partCols = meta.partitionColumnNames
    val k = keys.select(col(keyCol)).distinct().localCheckpoint(true)
    val matching = spark.table(table).join(k, Seq(keyCol), "left_semi")
    val dataCols = meta.schema.fieldNames.filterNot(partCols.contains)

    def overwrite(partSpecSql: Option[String], pred: Option[org.apache.spark.sql.Column]): Unit = {
      val base = pred.fold(spark.table(table))(p => spark.table(table).filter(p))
      val remaining = base.join(k, Seq(keyCol), "left_anti")
        .select((dataCols ++ partCols).map(col).toIndexedSeq: _*)
        .localCheckpoint(true) // settle before overwriting the same path
      val v = s"graft_del_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      remaining.createOrReplaceTempView(v)
      val target = partSpecSql.fold(s"INSERT OVERWRITE TABLE $table")(ps =>
        s"INSERT OVERWRITE TABLE $table PARTITION ($ps)")
      try spark.sql(
        s"$target SELECT ${dataCols.map(c => s"`$c`").mkString(", ")} FROM $v")
      finally { spark.catalog.dropTempView(v); () }
    }

    val report =
      if (partCols.isEmpty) {
        val n = matching.count()
        if (n > 0) overwrite(None, None)
        DeleteReport(n, if (n > 0) 1 else 0, 1)
      } else {
        // partition COUNT from the partition listing only (SHOW PARTITIONS
        // walks directories, not files) — a full listManifests file walk
        // here would contradict the affected-partitions-only cost contract
        val seen = spark.sql(s"SHOW PARTITIONS $table").count().toInt
        // one row per AFFECTED partition + the doomed-row count, one pass
        val affected = matching
          .groupBy(partCols.map(col): _*).agg(count(lit(1)).as("__n"))
          .collect()
        affected.foreach { row =>
          val spec = partCols.zipWithIndex
            .map { case (c, i) => s"$c=${sqlLit(row.get(i))}" }.mkString(", ")
          val pred = partCols.zipWithIndex
            .map { case (c, i) => col(c) <=> lit(row.get(i)) }.reduce(_ && _)
          overwrite(Some(spec), Some(pred))
        }
        DeleteReport(affected.map(_.getLong(partCols.length)).sum,
          affected.length, seen)
      }
    lineage.foreach(_.update(spark.emptyDataFrame, "delete",
      s"table=$table key=$keyCol rows=${report.rowsDeleted} " +
        s"partitions=${report.partitionsRewritten}/${report.partitionsSeen}"))
    spark.catalog.refreshTable(table)
    report
  }
}
