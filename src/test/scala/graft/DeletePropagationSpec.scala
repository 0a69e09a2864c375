package graft

import graft.catalog.Retention
import graft.catalog.Retention.DeleteTarget
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forget-propagation across derived state: deleting ids from the minhash
  * signature index and the dedup corpus leaves each bit-equal to one built
  * over a corpus that never contained them, a re-crawl of a forgotten doc is
  * KEPT (the index no longer remembers it), and partitions without doomed
  * rows keep their files byte-identical. The BM25 and IVF-PQ legs are
  * oracle-pinned (q205/q206); these are the legs whose replay has no SQL
  * twin. */
class DeletePropagationSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDocs: DataFrame = Seq.tabulate(40) { i =>
    (i.toLong, s"document number $i talks about topic ${i % 5} in detail " +
      s"with unique trail ${i * 7919}")
  }.toDF("doc_id", "text")

  test("minhash index: deleteRowsAll == index built over the never-contained corpus; re-crawl of a forgotten doc is kept") {
    val db = s"fgmh${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.sigidx"
    val docs = corpusDocs
    // two batch partitions, as the gates lay indexes out
    Seq(0L, 1L).foreach { b =>
      Dedup.minhashIndex(docs.filter(pmod(col("doc_id"), lit(2)) === b),
          "text", "doc_id")
        .withColumn("batch_id", lit(b))
        .write.mode(if (b == 0L) "overwrite" else "append")
        .partitionBy("batch_id").saveAsTable(t)
    }
    val doomedIds = Seq(6L, 13L, 27L)
    val reports = Retention.deleteRowsAll(spark,
      doomedIds.toDF("doc_id"), Seq(DeleteTarget(t, "doc_id")))
    assert(reports.head._2.rowsDeleted == doomedIds.size)

    // bit-equality with the never-contained build (signatures are
    // deterministic, so frame equality is exact row equality)
    val surviving = docs.filter(!col("doc_id").isin(doomedIds: _*))
    val fromScratch = Dedup.minhashIndex(surviving, "text", "doc_id")
    val stored = spark.table(t).drop("batch_id")
    assert(stored.exceptAll(fromScratch).isEmpty &&
      fromScratch.exceptAll(stored).isEmpty,
      "post-delete index must equal the never-contained index")

    // a re-crawl of forgotten doc 13 under a new id: with the rows gone it
    // is KEPT (nothing matches); against the pre-delete index it would have
    // been dup_of_stored — the observable difference deletion must make
    val recrawl = docs.filter(col("doc_id") === 13L)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val (report, _) = Dedup.incrementalMinhash(
      spark.table(t).drop("batch_id"), recrawl, "text", "doc_id",
      threshold = 0.9)
    val row = report.select("doc_id", "status").as[(Long, String)].collect()
    assert(row.toSeq == Seq((1013L, "kept")), row.mkString(", "))
    // and the same replay over the never-contained index agrees exactly
    val (report2, _) = Dedup.incrementalMinhash(
      fromScratch, recrawl, "text", "doc_id", threshold = 0.9)
    assert(report.exceptAll(report2).isEmpty && report2.exceptAll(report).isEmpty)
  }

  test("dedup corpus: partitions with no doomed rows keep files byte-identical") {
    val db = s"fgcp${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.corpus"
    // corpus laid out by batch; doomed ids all live in batch 0
    Seq(0L, 1L).foreach { b =>
      corpusDocs.filter(pmod(col("doc_id"), lit(2)) === b)
        .withColumn("batch_id", lit(b))
        .write.mode(if (b == 0L) "overwrite" else "append")
        .partitionBy("batch_id").saveAsTable(t)
    }
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(t))
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def stamps(rel: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(root, rel))
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime)).toSet
    val before = stamps("batch_id=1")
    // doomed: even ids only -> batch_id=0 partition
    Retention.deleteRowsAll(spark, Seq(2L, 4L, 8L).toDF("doc_id"),
      Seq(DeleteTarget(t, "doc_id")))
    assert(stamps("batch_id=1") == before,
      "a partition without doomed rows must not be rewritten")
    assert(spark.table(t).filter(col("doc_id").isin(2L, 4L, 8L)).isEmpty)
    assert(spark.table(t).count() == 37)
  }

  test("deleteRowsAll: validates input shape") {
    intercept[IllegalArgumentException] {
      Retention.deleteRowsAll(spark, Seq((1L, 2L)).toDF("a", "b"),
        Seq(DeleteTarget("x.y", "a")))
    }
    intercept[IllegalArgumentException] {
      Retention.deleteRowsAll(spark, Seq(1L).toDF("a"), Seq.empty)
    }
  }
}
