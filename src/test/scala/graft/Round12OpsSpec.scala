package graft

import graft.operators.{Analytics, Privacy}
import org.apache.spark.sql.functions._

/** Round-12 fixes: DP-sum sensitivity under add/remove-one adjacency,
  * calibration-bin clamping, consolidation startup convergence, and
  * null-partition deletes. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- dpSums sensitivity

  test("dpSums: noise calibrates to max(|lo|,|hi|), not hi-lo") {
    // all values already inside [100, 200], so clipping is identical for
    // ranges [100,200] and [0,200] — under the correct add/remove-one
    // sensitivity max(|lo|,|hi|) both releases share scale 200/eps and
    // must be bit-identical; the old hi-lo convention would give the
    // first release HALF the noise (scale 100/eps) and under-protect it
    val df = Seq.tabulate(50)(i => (s"g${i % 3}", 100.0 + i % 100))
      .toDF("g", "value")
    val a = Privacy.dpSums(df, "value", Seq("g"), lo = 100.0, hi = 200.0,
      epsilon = 1.0, seed = "s").as[(String, Double)].collect().toMap
    val b = Privacy.dpSums(df, "value", Seq("g"), lo = 0.0, hi = 200.0,
      epsilon = 1.0, seed = "s").as[(String, Double)].collect().toMap
    assert(a == b,
      "identical clipped sums + identical sensitivity must release identically")
    // and the noise really is there (not degenerate)
    val exact = df.groupBy("g").agg(sum(col("value"))).as[(String, Double)]
      .collect().toMap
    assert(a.exists { case (g, v) => math.abs(v - exact(g)) > 1e-6 })
  }

  test("dpSums: negative-only clip range uses |lo| as the scale") {
    // [-200, -100]: hi-lo = 100 but one row moves the sum by up to 200
    val df = Seq(("g1", -150.0), ("g1", -120.0)).toDF("g", "value")
    val neg = Privacy.dpSums(df, "value", Seq("g"), lo = -200.0, hi = -100.0,
      epsilon = 1.0, seed = "s").as[(String, Double)].collect().toMap
    val wide = Privacy.dpSums(df, "value", Seq("g"), lo = -200.0, hi = 0.0,
      epsilon = 1.0, seed = "s").as[(String, Double)].collect().toMap
    assert(neg == wide, "same clipped sums, same max(|lo|,|hi|) => same release")
  }

  // ------------------------------------------------- calibration bins

  test("calibrationBins: out-of-range scores clamp into the edge bins") {
    val df = Seq((-0.3, 0), (-0.0001, 1), (0.05, 0), (1.2, 1), (0.999, 0))
      .toDF("score", "label")
    val out = Analytics.calibrationBins(df, "score", "label", bins = 10)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSet == Set(0L, 9L), out.mkString(", "))
    val bin0 = out.find(_._1 == 0L).get
    assert(bin0._2 == 3, "both negative scores and 0.05 land in bin 0")
    val bin9 = out.find(_._1 == 9L).get
    assert(bin9._2 == 2, "score >= 1 clamps into the top bin")
  }

  // ------------------------------------------------- consolidation convergence

  private def stageBatchTable(t: String, nBatches: Int): Unit =
    (0 until nBatches).foreach { b =>
      Seq.tabulate(10)(i => (b * 100L + i, s"doc $b $i"))
        .toDF("doc_id", "text").withColumn("batch_id", lit(b.toLong))
        .write.mode(if (b == 0) "overwrite" else "append")
        .partitionBy("batch_id").saveAsTable(t)
    }

  /** Reproduce the exact crash window: WAL written (with _SUCCESS), target
    * partition overwritten, source drops NOT run, scratch NOT deleted. */
  private def stageCrashAfterOverwrite(t: String, upTo: Long): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(t))
    val scratch = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(meta.location), s".graft_consolidate_upTo=$upTo")
    val dataCols = meta.schema.fieldNames.filterNot(_ == "batch_id").toSeq
    spark.table(t).filter(col("batch_id") <= upTo)
      .dropDuplicates(Seq("doc_id")).select(dataCols.map(col): _*)
      .write.mode("overwrite").parquet(scratch.toString)
    val wal = spark.read.parquet(scratch.toString).localCheckpoint(true)
    wal.createOrReplaceTempView("r12_crash_wal")
    spark.sql(s"INSERT OVERWRITE TABLE $t PARTITION (batch_id=$upTo) " +
      s"SELECT ${dataCols.map(c => s"`$c`").mkString(", ")} FROM r12_crash_wal")
    spark.catalog.refreshTable(t)
  }

  test("convergeConsolidation: finishes a crash-after-overwrite run; duplicates vanish") {
    import graft.catalog.Compaction
    val db = s"conv${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.corpus"
    stageBatchTable(t, 5)
    val before = spark.table(t).select("doc_id").as[Long].collect().toSet
    stageCrashAfterOverwrite(t, upTo = 3L)
    // mid-crash state: partition 3 holds the 40-row fold, sources 0-2 remain
    assert(spark.table(t).count() == 80, "crash state must show duplicates")
    assert(Compaction.convergeConsolidation(spark, t) == 3)
    assert(spark.table(t).select("doc_id").as[Long].collect().toSet == before)
    assert(spark.table(t).count() == 50)
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).toSet
    assert(parts == Set("batch_id=3", "batch_id=4"), parts.toString)
    // scratch gone, second pass a no-op
    assert(Compaction.convergeConsolidation(spark, t) == 0)
  }

  test("convergeConsolidation: incomplete WAL (no _SUCCESS) is swept, table untouched") {
    import graft.catalog.Compaction
    val db = s"convi${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.corpus"
    stageBatchTable(t, 3)
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(t))
    val scratch = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(meta.location), ".graft_consolidate_upTo=2")
    val fs = scratch.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(scratch) // WAL started, never committed: no _SUCCESS
    fs.create(new org.apache.hadoop.fs.Path(scratch, "part-00000.parquet")).close()
    assert(Compaction.convergeConsolidation(spark, t) == 0)
    assert(!fs.exists(scratch), "stale incomplete WAL must be swept")
    assert(spark.table(t).count() == 30)
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).toSet
    assert(parts == Set("batch_id=0", "batch_id=1", "batch_id=2"))
    // non-batch_id tables and missing tables are cheap no-ops
    assert(Compaction.convergeConsolidation(spark, s"$db.nope") == 0)
  }

  test("ingestDedupGate: startup convergence repairs a crashed consolidation before the stored read") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val db = s"convg${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val (ct, rt) = (s"$db.corpus", s"$db.report")
    val ckpt = java.nio.file.Files.createTempDirectory("r12_gate_ckpt").toString

    // two committed batches through the real gate
    val in1 = MemoryStream[(Long, String, String)]
    in1.addData((1L, "b", "alpha beta gamma delta"), (2L, "b", "omega psi chi phi"))
    val q1 = StreamingOps.ingestDedupGate(
      in1.toDF().toDF("doc_id", "blk", "text"), "text", "doc_id",
      Seq("blk"), 0.7, ct, rt, ckpt, availableNow = true)
    q1.awaitTermination()
    in1.addData((3L, "b", "epsilon zeta eta theta"))
    val q2 = StreamingOps.ingestDedupGate(
      in1.toDF().toDF("doc_id", "blk", "text"), "text", "doc_id",
      Seq("blk"), 0.7, ct, rt, ckpt, availableNow = true)
    q2.awaitTermination()
    spark.catalog.refreshTable(ct)
    val survivors = spark.table(ct).select("doc_id").as[Long].collect().toSet

    // crash a consolidation of the corpus mid-swap: duplicates on disk
    stageCrashAfterOverwrite(ct, upTo = 1L)
    assert(spark.table(ct).count() > survivors.size, "crash duplicates staged")

    // restart the gate with a batch that DUPLICATES doc 1's text: if the
    // stored side were read before convergence it would see doc 1 twice
    // (batch 0 + the folded partition) — with convergence the report still
    // attributes exactly one stored duplicate and the corpus is clean
    in1.addData((9L, "b", "alpha beta gamma delta"))
    val q3 = StreamingOps.ingestDedupGate(
      in1.toDF().toDF("doc_id", "blk", "text"), "text", "doc_id",
      Seq("blk"), 0.7, ct, rt, ckpt, availableNow = true)
    q3.awaitTermination()
    spark.catalog.refreshTable(ct)
    spark.catalog.refreshTable(rt)
    val corpus = spark.table(ct).select("doc_id").as[Long].collect().toSeq
    assert(corpus.size == corpus.distinct.size, "corpus must hold no duplicates")
    assert(corpus.toSet == survivors, "doc 9 is a dup_of_stored, not kept")
    val rep9 = spark.table(rt).filter(col("doc_id") === 9L)
      .select("status", "attributed_to").as[(String, Long)].collect()
    assert(rep9.toSeq == Seq(("dup_of_stored", 1L)), rep9.mkString(", "))
    // and the crash scratch is gone
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(ct))
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.listStatus(root).exists(
      _.getPath.getName.startsWith(".graft_consolidate_upTo=")))
  }

  // ------------------------------------------------- dataset-tier DQ gate

  test("ingestDatasetDqGate: halt is a standing verdict under replay; relaxed rules release the batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val db = s"dsdq${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val (sink, res) = (s"$db.sink", s"$db.results")
    val ckpt = java.nio.file.Files.createTempDirectory("r12_dsdq_ckpt").toString
    val mem = MemoryStream[(Long, String)]
    def gate(halt: Seq[String]) = StreamingOps.ingestDatasetDqGate(
      mem.toDF().toDF("id", "status"),
      warnRules = Seq("ColumnValues 'status' in ['ok']"),
      haltRules = halt, sink, res, ckpt, availableNow = true)

    // batch 0: 2 rows, passes RowCount <= 3, flows (warn records a failure)
    mem.addData((1L, "ok"), (2L, "bad"))
    gate(Seq("RowCount <= 3")).awaitTermination()
    spark.catalog.refreshTable(sink); spark.catalog.refreshTable(res)
    assert(spark.table(sink).count() == 2)
    assert(spark.table(res).filter(col("tier") === "warn" &&
      col("outcome") === "Failed").count() == 1, "warn failure recorded, batch flowed")

    // batch 1: 5 rows -> halt fails, stream dies, nothing committed
    mem.addData((3L, "ok"), (4L, "ok"), (5L, "ok"), (6L, "ok"), (7L, "ok"))
    val e1 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      gate(Seq("RowCount <= 3")).awaitTermination()
    }
    assert(e1.getMessage.contains("Dataset DQ halt"), e1.getMessage)
    spark.catalog.refreshTable(sink); spark.catalog.refreshTable(res)
    assert(spark.table(sink).count() == 2, "halted batch must not reach the sink")
    val haltRows = spark.table(res).filter(col("tier") === "halt" &&
      col("outcome") === "Failed")
    assert(haltRows.count() == 1, "the standing failure is observable")
    assert(StreamingOps.readCommitted(spark, sink, ckpt).count() == 2,
      "committed view excludes the halted batch")

    // replay with the same rules: deterministic re-failure, outcome rows
    // REPLACED not duplicated
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      gate(Seq("RowCount <= 3")).awaitTermination()
    }
    assert(e2.getMessage.contains("Dataset DQ halt"))
    spark.catalog.refreshTable(res)
    assert(spark.table(res).filter(col("tier") === "halt" &&
      col("outcome") === "Failed").count() == 1, "replay must not duplicate outcomes")
    assert(spark.table(sink).count() == 2)

    // operator intervenes: relaxed halt rule -> the batch replays, passes,
    // flows, commits; the outcome partition now records the pass
    gate(Seq("RowCount <= 100")).awaitTermination()
    spark.catalog.refreshTable(sink); spark.catalog.refreshTable(res)
    assert(spark.table(sink).count() == 7, "released batch reaches the sink")
    assert(StreamingOps.readCommitted(spark, sink, ckpt).count() == 7)
    assert(spark.table(res).filter(col("tier") === "halt" &&
      col("outcome") === "Failed").isEmpty, "the standing failure clears")
  }

  // ------------------------------------------------- daily-ops composition

  test("q209 daily-ops chain: gates, consolidation, forget, and DP release hold their invariants") {
    val d = "/root/testdata/sf0.001"
    // the query body carries its own requires (quarantine non-empty,
    // consolidation folded, post-delete ANN == never-contained build);
    // this spec drives it end-to-end and checks the state it leaves
    val out = graft.SparkEntry.queries("q209_daily_ops")(spark, d).collect()
    assert(out.nonEmpty, "DP release must emit per-lang rows")
    val db = s"graftops${math.abs(d.hashCode)}"
    val corpus = spark.table(s"$db.corpus")
    assert(corpus.filter(pmod(col("doc_id"), lit(13)) === 0).isEmpty,
      "forgotten ids must be gone from the corpus")
    assert(corpus.filter(col("doc_id") >= 40000).isEmpty,
      "planted twins must never survive dedup")
    val ids = corpus.select("doc_id").as[Long].collect()
    assert(ids.length == ids.distinct.length, "corpus holds no duplicates")
    assert(spark.sql(s"SHOW PARTITIONS $db.corpus").count() <= 2,
      "consolidation must fold the per-batch partition sprawl")
    assert(spark.table(s"$db.annidx")
      .filter(pmod(col("vec_id"), lit(13)) === 0).isEmpty,
      "forgotten vectors must be gone from the ANN index")
  }

  // ------------------------------------------------- null-partition deletes

  test("deleteRows: null-valued partition (the __HIVE_DEFAULT_PARTITION__ dir) deletes correctly") {
    import graft.catalog.Retention
    val db = s"delnull${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.events"
    Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", null),
        (4L, "d", null), (5L, "e", "p2"))
      .toDF("user_id", "payload", "day")
      .write.partitionBy("day").saveAsTable(t)
    val keys = Seq(3L, 5L).toDF("user_id")
    val report = Retention.deleteRows(spark, t, "user_id", keys)
    assert(report.rowsDeleted == 2, report.toString)
    assert(report.partitionsRewritten == 2, report.toString)
    val left = spark.table(t).select("user_id", "day")
      .as[(Long, Option[String])].collect().toSet
    assert(left == Set((1L, Some("p1")), (2L, Some("p1")), (4L, None)),
      left.toString)
  }

  test("convergeConsolidation: a STALE complete WAL (superseded by a later fold) is swept, never resurrected") {
    import graft.catalog.Compaction
    val db = s"convs${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.corpus"
    stageBatchTable(t, 5)
    val before = spark.table(t).select("doc_id").as[Long].collect().toSet
    // run 1 crashes after its overwrite of partition 2 (scratch 2 lingers)
    stageCrashAfterOverwrite(t, upTo = 2L)
    // run 2 (a later maintenance tick) folds up to 4 SUCCESSFULLY — it
    // deletes only its own scratch, leaving scratch 2 stale
    assert(Compaction.consolidateBatches(spark, t, 4L, Seq("doc_id")) >= 1)
    assert(spark.table(t).count() == 50)
    // convergence must SWEEP scratch 2 — overwriting partition 2 from the
    // stale WAL would resurrect rows that now live in partition 4
    assert(Compaction.convergeConsolidation(spark, t) == 0)
    assert(spark.table(t).select("doc_id").as[Long].collect().toSet == before)
    assert(spark.table(t).count() == 50, "no resurrected duplicates")
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).toSet
    assert(parts == Set("batch_id=4"), parts.toString)
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(t))
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.listStatus(root).exists(
      _.getPath.getName.startsWith(".graft_consolidate_upTo=")))
  }

  test("calibrationBins: NULL scores/labels are excluded, not routed to the top bin") {
    import graft.operators.Analytics
    val df = Seq((Some(0.95), Some(1)), (None, Some(1)), (Some(0.05), None))
      .toDF("score", "label")
    val out = Analytics.calibrationBins(df, "score", "label", bins = 10)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq((9L, 1L, 0.95, 1.0)), out.mkString(", "))
  }

  test("ingestDedupGate(statsTable): block-bloom pruned stored reads, bit-identical outcome, index gate-maintained") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.catalog.FileStats
    import graft.streaming.StreamingOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def drive(db: String, statsTable: Option[String]): (Set[(Long, String, Long)], String) = {
      spark.sql(s"CREATE DATABASE $db")
      val (ct, rt) = (s"$db.corpus", s"$db.report")
      val ckpt = java.nio.file.Files.createTempDirectory(s"r12_bp_$db").toString
      val mem = MemoryStream[(Long, String, String)]
      def run(): Unit = {
        val q = StreamingOps.ingestDedupGate(
          mem.toDF().toDF("doc_id", "blk", "text"), "text", "doc_id",
          Seq("blk"), 0.7, ct, rt, ckpt, availableNow = true,
          statsTable = statsTable)
        q.awaitTermination()
      }
      // three batches over DISJOINT-ish blocks, with a cross-batch dup in
      // block a and a never-seen block in batch 3
      mem.addData((1L, "a", "alpha beta gamma delta"),
        (2L, "b", "omega psi chi phi"))
      run()
      mem.addData((3L, "a", "alpha beta gamma delta"), // dup_of_stored 1
        (4L, "c", "epsilon zeta eta theta"))
      run()
      mem.addData((5L, "d", "rho sigma tau upsilon"))
      run()
      spark.catalog.refreshTable(ct); spark.catalog.refreshTable(rt)
      val rep = spark.table(rt)
        .select(col("doc_id"), col("status"),
          coalesce(col("attributed_to"), lit(-1L)).as("att"))
        .as[(Long, String, Long)].collect().toSet
      (rep, ct)
    }

    val dbA = s"bpgate${System.nanoTime()}"
    val (repPlain, _) = drive(dbA, None)
    val dbB = s"bpgate${System.nanoTime()}x"
    val st = s"$dbB.corpus_stats"
    val (repPruned, ct) = drive(dbB, Some(st))
    assert(repPruned == repPlain,
      "block-bloom pruning must not change a single report row")
    assert(repPruned.exists(_._2 == "dup_of_stored"),
      "the cross-batch dup proves the stored side was actually consulted")
    // the gate maintained the index: every corpus file covered
    val (_, _, cover) = FileStats.pruneFiles(spark, ct, st,
      Seq(FileStats.RangePredicate("blk", None, None)))
    assert(cover.filesUnknown == 0, s"gate must refresh its index: $cover")
    // and a single-block probe skips files of other blocks
    val (_, _, probe) = FileStats.pruneFiles(spark, ct, st,
      Seq(FileStats.KeysPredicate("blk", Seq("d"))))
    assert(probe.filesSelected < probe.filesTotal,
      s"a one-block probe must prune: $probe")
  }
}
