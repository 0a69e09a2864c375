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
    * Unpartitioned tables rewrite wholesale (there is nothing to prune).
    *
    * With `statsTable` (a [[FileStats]] index whose spec declares `keyCol`,
    * ideally as a bloom column), the affected-partition DISCOVERY reads
    * only the files whose per-file stats admit a key — cost ∝ files the
    * keys might live in, FLAT in table size — instead of the full-table
    * semi-join scan, which at 100 TB charges every forget-me batch a whole
    * table read. The key set is collected to the driver for the stats
    * probe (bounded by `maxDiscoveryKeys`; the md5 key hashes are computed
    * once and probed against every per-file filter in one stats-table
    * pass); larger batches fall back to the full scan, which is the right
    * trade anyway — a million-key delete touches most partitions. After
    * the rewrite the index is refreshed under the SAME spec it carries
    * (new files of rewritten partitions get scanned; dropped files'
    * rows vanish), so the next delete prunes correctly. Stats staleness is
    * never a correctness risk ([[FileStats.pruneFiles]] treats unknown
    * files as candidates). */
  def deleteRows(spark: SparkSession, table: String, keyCol: String,
                 keys: DataFrame,
                 lineage: Option[graft.lineage.Lineage] = None,
                 statsTable: Option[String] = None,
                 maxDiscoveryKeys: Int = 100000): DeleteReport = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val partCols = meta.partitionColumnNames
    val k = keys.select(col(keyCol)).distinct().localCheckpoint(true)
    val pruned = statsPrunedMatching(spark, table, keyCol, k, statsTable,
      maxDiscoveryKeys)
    val matching = pruned
      .getOrElse(spark.table(table).join(k, Seq(keyCol), "left_semi"))
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
    statsTable.filter(_ => report.partitionsRewritten > 0)
      .foreach(st => specOf(spark, st).foreach { sp =>
        // SCOPED refresh (guide §6 — cost ∝ touched): a rewritten partition
        // must have held a matching row, and matching rows live only in
        // files the pruned discovery admitted — so the admitted files'
        // partition dirs are a sound SUPERSET of everything this delete
        // changed (admitted-but-unchanged files are re-recognized as
        // covered and skipped). The rels come from the pruned scan's own
        // resolved file list, never from re-rendered partition specs.
        // Unpartitioned tables and full-scan discovery refresh unscoped.
        val scope: Option[Set[String]] =
          if (partCols.isEmpty) None
          else pruned.flatMap { m =>
            scala.util.Try {
              val rootNorm = new org.apache.hadoop.fs.Path(meta.location)
                .toString.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
              m.inputFiles.toSeq.map { p =>
                val norm = p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
                val parent = norm.substring(0, norm.lastIndexOf('/'))
                require(parent == rootNorm || parent.startsWith(rootNorm + "/"),
                  s"input file $p outside table root $rootNorm")
                if (parent == rootNorm) "" else parent.drop(rootNorm.length + 1)
              }.toSet
            }.toOption.filter(rs => rs.nonEmpty && !rs.contains(""))
          }
        FileStats.refresh(spark, table, st, sp, scopeRels = scope)
      })
    report
  }

  /** One derived table a forget-me request must reach: the key column the
    * document/user id appears under there, plus an optional [[FileStats]]
    * index for pruned discovery. */
  final case class DeleteTarget(table: String, keyCol: String,
                                statsTable: Option[String] = None)

  /** Right-to-be-forgotten PROPAGATION: delete one key set from a table
    * AND every derived table that remembers it — the dedup corpus/report,
    * a minhash signature index, BM25 postings + lengths, IVF-PQ code
    * tables (all of which are row-per-id by construction, so row deletion
    * leaves each index bit-equal to one built over a corpus that never
    * contained the ids; BM25's df/N/avgdl and ANN's candidate sets are
    * derived at SEARCH time from the surviving rows). The reference's
    * token store keeps raw↔hash pairs in exactly this derived-side-table
    * shape (`datatransform_dataprotection.py:158-173`) — a delete that
    * stops at the primary table is not a delete.
    *
    * Run inside the same single-writer window as the gates' `maintain`
    * hook — never beside a live writer of ANY target. Each target is
    * deleted independently ([[deleteRows]] semantics and crash posture
    * apply per table; a crash mid-list leaves completed targets clean and
    * the re-run converges — re-deleting an absent key is a no-op).
    *
    * What this verb deliberately does NOT do: rewrite rows that REFERENCE
    * a forgotten id in non-key columns (e.g. a dedup report's
    * `attributed_to`). Deleting those rows would falsify history for
    * surviving docs; scrubbing the reference is a schema-specific UPDATE
    * the caller owns. Declare such tables as extra targets keyed on the
    * referencing column if full erasure is required.
    *
    * @return per-table reports, in target order. */
  def deleteRowsAll(spark: SparkSession, keys: DataFrame,
                    targets: Seq[DeleteTarget],
                    lineage: Option[graft.lineage.Lineage] = None,
                    maxDiscoveryKeys: Int = 100000): Seq[(String, DeleteReport)] = {
    require(keys.columns.length == 1,
      s"keys must be a single-column frame, got ${keys.columns.mkString(", ")}")
    require(targets.nonEmpty, "no delete targets")
    val k = keys.distinct().localCheckpoint(true)
    targets.map { t =>
      t.table -> deleteRows(spark, t.table, t.keyCol, k.toDF(t.keyCol),
        lineage, t.statsTable, maxDiscoveryKeys)
    }
  }

  /** Stats-pruned replacement for the discovery semi-join: the shared
    * [[FileStats.keysPrunedScan]] probe, semi-joined back to the exact key
    * frame. None → caller falls back to the full scan (no/missing index,
    * key set over the probe bound, keyCol not indexed, or probe failure —
    * the helper logs it). */
  private def statsPrunedMatching(spark: SparkSession, table: String,
                                  keyCol: String, k: DataFrame,
                                  statsTable: Option[String],
                                  maxDiscoveryKeys: Int): Option[DataFrame] =
    statsTable.filter(spark.catalog.tableExists).flatMap { st =>
      // spec-level indexed-column check — a metadata/memoized read, not a
      // stats-table job on the discovery hot path
      if (!FileStats.cachedStatsSpecOf(spark, st).exists(_.cols.contains(keyCol))) None
      else FileStats.keysPrunedScan(spark, table, st, keyCol, k, maxDiscoveryKeys)
        .map(_.join(k, Seq(keyCol), "left_semi"))
    }

  private def specOf(spark: SparkSession, statsTable: String): Option[FileStats.StatsSpec] =
    FileStats.cachedStatsSpecOf(spark, statsTable)

}
