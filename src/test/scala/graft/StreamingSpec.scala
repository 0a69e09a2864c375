package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.nio.file.Files

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("file-arrival stream drains available files as one batch (AvailableNow)") {
    val dir = Files.createTempDirectory("graft_stream")
    Files.writeString(dir.resolve("f1.csv"), "1,a\n2,b\n")
    Files.writeString(dir.resolve("f2.csv"), "3,c\n")
    val stream = StreamingOps.fileArrivalStream(spark, dir.toString, "csv",
      "id INT, v STRING", Map("header" -> "false"))
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("file_arrivals")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("file_arrivals").count() == 3)
  }

  test("watermarked windowed aggregation over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedCounts(df, "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Complete).start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 10:05:00"), "click", 1.0),
      (t("2024-01-01 10:55:00"), "click", 2.0),
      (t("2024-01-01 11:05:00"), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("win_agg").orderBy("window_start", "event_type").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 2) // both clicks in 10:00 window
    assert(rows(0).getAs[Double]("sum_value") == 3.0)
  }

  test("streaming dedup drops watermark-window duplicates with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "content_hash")
    val out = StreamingOps.streamingDedup(df, Seq("content_hash"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append).start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 10:00:00"), "aaa"), (t("2024-01-01 10:01:00"), "aaa"),
      (t("2024-01-01 10:02:00"), "bbb"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 10:03:00"), "aaa")) // still within window: dropped
    q.processAllAvailable()
    val rows = spark.table("stream_dedup").orderBy("ts").collect()
    q.stop()
    assert(rows.map(_.getString(1)).toSeq == Seq("aaa", "bbb"))
  }

  test("event-time-timeout sessionization closes a session when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Event]
    val watermarked = mem.toDS().withWatermark("ts", "0 seconds")
    val sessions = StreamingOps.sessionize(watermarked, gapMs = 1000)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      StreamingOps.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.0),
      StreamingOps.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:10"), "view", 2.0))
    q.processAllAvailable()
    // advance the watermark far past user 1's gap → its session times out
    mem.addData(StreamingOps.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "click", 9.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "click", 1.0))
    q.processAllAvailable()
    val closed = spark.table("sessions").collect()
    q.stop()
    // gap 1s: user 1's two events (10s apart) split IN-batch into two
    // single-event sessions; user 2's 11:00 session closes when 12:00
    // arrives. The 12:00 session is still open.
    assert(closed.length == 3)
    val u1 = closed.filter(_.getAs[Long]("user_id") == 1L)
      .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
    assert(u1 == Set((1L, 1.0), (1L, 2.0)))
    val u2 = closed.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 1 && u2.head.getAs[Double]("total_value") == 9.0)
    assert(closed.forall(_.getAs[Boolean]("closed")))
  }

  test("sessionize caps the per-key in-batch buffer: a flooded key degrades, others are exact") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Event]
    val watermarked = mem.toDS().withWatermark("ts", "0 seconds")
    // bound of 5: the 100-event flood key keeps only its first 5 events per
    // batch; the healthy key is untouched
    val sessions = StreamingOps.sessionize(watermarked, gapMs = 60000L,
      maxBatchEventsPerKey = 5)
    val q = sessions.writeStream.format("memory").queryName("flood_sessions")
      .outputMode(OutputMode.Append).start()
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val flood = (0 until 100).map(i =>
      StreamingOps.Event(7L, new java.sql.Timestamp(base + i * 10), "click", 1.0))
    val healthy = Seq(
      StreamingOps.Event(8L, new java.sql.Timestamp(base), "click", 2.0),
      StreamingOps.Event(8L, new java.sql.Timestamp(base + 1000), "click", 3.0))
    mem.addData(flood ++ healthy: _*)
    q.processAllAvailable()
    // advance the watermark past both keys' gaps → both sessions close
    mem.addData(StreamingOps.Event(9L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "click", 0.0))
    q.processAllAvailable()
    val closed = spark.table("flood_sessions").collect()
    q.stop()
    val floodRow = closed.filter(_.getAs[Long]("user_id") == 7L)
    assert(floodRow.length == 1)
    assert(floodRow.head.getAs[Long]("n_events") == 5) // capped, job survived
    val healthyRow = closed.filter(_.getAs[Long]("user_id") == 8L)
    assert(healthyRow.length == 1)
    assert(healthyRow.head.getAs[Long]("n_events") == 2)
    assert(healthyRow.head.getAs[Double]("total_value") == 5.0)
  }

  test("batch sessionization splits on gap and aggregates per session") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:10:00", 2.0),
      (1L, "2024-01-01 12:00:00", 3.0), // >1h gap → new session
      (2L, "2024-01-01 09:00:00", 4.0)
    ).toDF("user_id", "ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val out = StreamingOps.sessionizeBatch(df, gapSecs = 3600)
    assert(out.count() == 3)
    val u1 = out.filter(col("user_id") === 1).orderBy("session_id")
      .select("n_events").as[Long].collect().toSeq
    assert(u1 == Seq(2L, 1L))
  }

  test("fileArrivalPipeline: incremental cleanse of arriving files with exactly-once batches") {
    val dir = Files.createTempDirectory("graft_sp")
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val db = s"streamdb${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    Files.writeString(dir.resolve("day1.csv"), "1,100.0\n2,-5.0\n")

    def runOnce(): Unit = {
      val q = StreamingOps.fileArrivalPipeline(spark, dir.toString, "csv",
        "id INT, amount DOUBLE", ckpt, Map("header" -> "false")) { (batch, _) =>
        // foreachBatch executes in a CLONED session — use the batch's session
        // for catalog ops, and the outer session must REFRESH afterwards
        // (its per-session relation cache does not see the clone's inserts)
        val s = batch.sparkSession
        if (!batch.isEmpty) {
          // per-batch cleanse: DQ quarantine + append-publish
          val res = new graft.dq.DqEngine().runQuarantine(batch,
            Seq("ColumnValues 'amount' >= 0"))
          if (s.catalog.tableExists(s"$db.cleansed"))
            res.passed.write.mode("append").insertInto(s"$db.cleansed")
          else res.passed.write.saveAsTable(s"$db.cleansed")
        }
      }
      q.awaitTermination()
      spark.sql(s"REFRESH TABLE $db.cleansed")
    }

    runOnce()
    assert(spark.table(s"$db.cleansed").count() == 1) // -5 quarantined
    // same files again: checkpoint makes re-run a no-op (exactly-once)
    runOnce()
    assert(spark.table(s"$db.cleansed").count() == 1)
    // a NEW file arrives: only it is processed
    Files.writeString(dir.resolve("day2.csv"), "3,7.5\n4,8.5\n")
    runOnce()
    assert(spark.table(s"$db.cleansed").count() == 3)
  }

  test("ingest-dedup gate: streamed batches equal the sequential batch fixpoint; restart replays nothing") {
    val db = s"dedupgate${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val (ct, rt) = (s"$db.corpus", s"$db.report")
    val ckpt = Files.createTempDirectory("graft_gate_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingOps.ingestDedupGate(
      mem.toDF().toDF("doc_id", "blk", "text"),
      "text", "doc_id", Seq("blk"), 0.7, ct, rt, ckpt)
    // day 1: two distinct docs + an in-batch twin of the first
    val b1 = Seq((1L, "b", "alpha beta gamma delta"),
                 (2L, "b", "alpha beta gamma delta"),
                 (3L, "b", "epsilon zeta eta theta"))
    // day 2: a re-send of doc 1's text (dups vs the day-1 survivor), one new
    val b2 = Seq((10L, "b", "alpha beta gamma delta"),
                 (11L, "b", "iota kappa lambda mu"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    spark.sql(s"REFRESH TABLE $rt"); spark.sql(s"REFRESH TABLE $ct")
    val rep = spark.table(rt)
      .select("doc_id", "status", "attributed_to", "batch_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))))
      .toMap
    assert(rep(1L)._1 == "kept" && rep(3L)._1 == "kept")
    assert(rep(2L) == (("dup_in_batch", Some(1L), 0L)))
    assert(rep(10L) == (("dup_of_stored", Some(1L), 1L)),
      "day-2 re-send must dedup against the day-1 SURVIVOR in the corpus table")
    assert(rep(11L)._1 == "kept")
    // corpus = survivors only, tagged with their batch
    val corpus = spark.table(ct).select("doc_id", "batch_id")
      .as[(Long, Long)].collect().toSet
    assert(corpus == Set(1L -> 0L, 3L -> 0L, 11L -> 1L))
    // restart over the same checkpoint: nothing reprocessed, tables unchanged
    val q2 = StreamingOps.ingestDedupGate(
      mem.toDF().toDF("doc_id", "blk", "text"),
      "text", "doc_id", Seq("blk"), 0.7, ct, rt, ckpt)
    q2.processAllAvailable(); q2.stop()
    spark.sql(s"REFRESH TABLE $rt"); spark.sql(s"REFRESH TABLE $ct")
    assert(spark.table(rt).count() == 5 && spark.table(ct).count() == 3)
    // and the streamed reports equal the sequential batch fixpoint
    import graft.operators.Dedup
    def toks(rows: Seq[(Long, String, String)]) = rows.toDF("doc_id", "blk", "text")
      .select(col("doc_id"), col("blk"),
        array_distinct(split(lower(trim(col("text"))), "\\s+")).as("__toks"))
    val s0 = toks(b1).limit(0)
    val r1 = Dedup.incrementalDedup(s0, toks(b1), "__toks", "doc_id", Seq("blk"), 0.7)
    val s1 = toks(b1).join(r1.filter(col("status") === "kept").select("doc_id"), Seq("doc_id"))
    val r2 = Dedup.incrementalDedup(s1, toks(b2), "__toks", "doc_id", Seq("blk"), 0.7)
    val seqRep = (r1.collect() ++ r2.collect()).map(r => r.getLong(0) ->
      ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(rep.view.mapValues(v => (v._1, v._2)).toMap == seqRep)
  }

  test("online logistic fit: an orphaned half-committed partition is replaced, never trained against") {
    // crash mid-write leaves partition batch_id=0 populated with garbage but
    // NO commit-log marker — the replay must treat the batch as not applied
    // (the data-table probe would have said "applied") and REPLACE the
    // orphan via dynamic partition overwrite
    val db = s"olforphan${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val wt = s"$db.weights"
    spark.sql(s"CREATE TABLE $wt (feature BIGINT, wq BIGINT) USING parquet " +
      "PARTITIONED BY (batch_id BIGINT)")
    spark.sql(s"INSERT INTO $wt PARTITION (batch_id=0) VALUES (999999, 123456)")
    val ckpt = Files.createTempDirectory("graft_olf_orphan_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Int)]
    val q = StreamingOps.onlineLogisticFit(
      mem.toDF().toDF("doc_id", "text", "y"),
      "text", "doc_id", "y", numFeatures = 64,
      weightsTable = wt, checkpoint = ckpt)
    mem.addData((1 to 20).map(i =>
      (i.toLong, if (i % 2 == 0) "spam junk" else "clean text", i % 2)): _*)
    q.processAllAvailable(); q.stop()
    spark.sql(s"REFRESH TABLE $wt")
    val w = StreamingOps.committedWeights(spark, wt, ckpt)
      .as[(Long, Long)].collect().toMap
    assert(w.nonEmpty, "the batch must train from zero (nothing committed)")
    assert(!w.contains(999999L),
      "the orphaned garbage partition must be replaced, not appended beside")
  }

  test("online logistic fit: external truncation of the committed snapshot fails loudly, never refits from zero") {
    val db = s"olftrunc${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val wt = s"$db.weights"
    val ckpt = Files.createTempDirectory("graft_olf_trunc_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Int)]
    val q = StreamingOps.onlineLogisticFit(
      mem.toDF().toDF("doc_id", "text", "y"),
      "text", "doc_id", "y", numFeatures = 64,
      weightsTable = wt, checkpoint = ckpt)
    mem.addData((1 to 20).map(i =>
      (i.toLong, if (i % 2 == 0) "spam junk" else "clean text", i % 2)): _*)
    q.processAllAvailable()
    // simulate external damage: the snapshot the log vouches for vanishes
    spark.sql(s"ALTER TABLE $wt DROP PARTITION (batch_id=0)")
    mem.addData((21 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) "spam junk" else "clean text", i % 2)): _*)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("snapshot partition is missing/empty")),
      s"expected the loud missing-snapshot failure, got: $e")
  }

  test("online logistic fit: per-batch SGD over a weights table equals the offline step sequence; replay is skipped") {
    val db = s"onlinefit${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val wt = s"$db.weights"
    val ckpt = Files.createTempDirectory("graft_olf_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Int)]
    val q = StreamingOps.onlineLogisticFit(
      mem.toDF().toDF("doc_id", "text", "y"),
      "text", "doc_id", "y", numFeatures = 64,
      weightsTable = wt, checkpoint = ckpt)
    val b1 = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "spam spam junk" else "clean text", i % 2))
    val b2 = (41 to 80).map(i => (i.toLong, if (i % 3 == 0) "spam spam more" else "fine words", if (i % 3 == 0) 1 else 0))
    mem.addData(b1: _*); q.processAllAvailable()
    spark.sql(s"REFRESH TABLE $wt")
    val after1 = StreamingOps.committedWeights(spark, wt, ckpt)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    mem.addData(b2: _*); q.processAllAvailable()
    spark.sql(s"REFRESH TABLE $wt")
    val after2 = StreamingOps.committedWeights(spark, wt, ckpt)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    q.stop()
    // per-batch snapshot partitions: batch 0's model survives as a restore
    // point after batch 1 commits
    assert(spark.table(wt).filter(col("batch_id") === 0)
      .select("feature", "wq").as[(Long, Long)].collect().sortBy(_._1).toSeq == after1)
    assert(after1 != after2 && after2.nonEmpty)

    // offline replay of the SAME batch sequence through sparseGdStep
    import graft.operators.Retrieval
    def step(rows: Seq[(Long, String, Int)], w: org.apache.spark.sql.DataFrame) = {
      val df = rows.toDF("doc_id", "text", "y")
      val labels = df.select(col("doc_id"), col("y"))
      val allFeats = Retrieval.withBias(
        Retrieval.hashedTokenFeatures(df, "text", "doc_id", 64), labels, "doc_id")
        .localCheckpoint(true)
      Retrieval.sparseGdStep(allFeats, labels, w, "doc_id", "y",
        rows.size.toLong, 1, 1).localCheckpoint(true)
    }
    val w0 = Seq.empty[(Long, Long)].toDF("feature", "wq")
    val off1 = step(b1, w0)
    assert(off1.as[(Long, Long)].collect().sortBy(_._1).toSeq == after1)
    val off2 = step(b2, off1)
    assert(off2.as[(Long, Long)].collect().sortBy(_._1).toSeq == after2)

    // a feature seen only in batch 1 must SURVIVE batch 2 (full-outer merge)
    val b1Only = after1.map(_._1).toSet -- step(b2, w0).as[(Long, Long)].collect().map(_._1).toSet
    if (b1Only.nonEmpty)
      assert(after2.map(_._1).toSet.intersect(b1Only) == b1Only)

    // re-delivery guard: a fresh query over the SAME checkpoint reprocesses
    // nothing; manually invoking the batch function again with an old id is
    // the at-least-once case the batch_id skip absorbs — weights unchanged
    val q2 = StreamingOps.onlineLogisticFit(
      mem.toDF().toDF("doc_id", "text", "y"),
      "text", "doc_id", "y", numFeatures = 64,
      weightsTable = wt, checkpoint = ckpt)
    q2.processAllAvailable(); q2.stop()
    spark.sql(s"REFRESH TABLE $wt")
    assert(StreamingOps.committedWeights(spark, wt, ckpt)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq == after2)
  }

  test("every-N-batches compaction inside the ingest loop: same content, bounded files") {
    // 20 single-file micro-batches append-fragment the target table; the
    // maintenance hook compacts every 5 batches. The compacted run must end
    // with the SAME table content as an identical run without maintenance,
    // a bounded file count, and correct between-batch reads (each batch
    // re-reads the table it may have just compacted).
    val src = Files.createTempDirectory("graft_cstream")
    (0 until 20).foreach { i =>
      Files.writeString(src.resolve(f"f$i%02d.csv"), s"$i,${i * 10}.5\n")
    }
    val db = s"cstreamdb${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")

    def dataFiles(table: String): Int = {
      val (_, ms) = graft.catalog.Compaction.listManifests(spark, table)
      ms.map(_.files).sum
    }
    def runIngest(table: String, compactEvery: Int): Long = {
      spark.sql(s"DROP TABLE IF EXISTS $db.$table")
      val ckpt = Files.createTempDirectory("graft_cstream_ck").toString
      var betweenBatchReads = 0L
      val q = StreamingOps.fileArrivalPipeline(spark, src.toString, "csv",
        "id INT, amount DOUBLE", ckpt, Map("maxFilesPerTrigger" -> "1"),
        maintainTable = if (compactEvery > 0) Some(s"$db.$table") else None,
        compactEvery = compactEvery, compactTargetBytes = 128L << 20) { (batch, _) =>
        val s = batch.sparkSession
        if (s.catalog.tableExists(s"$db.$table")) {
          // between-batch read of the possibly-just-compacted table: rows
          // already ingested must all be visible to the next batch
          s.sql(s"REFRESH TABLE $db.$table")
          betweenBatchReads = math.max(betweenBatchReads, s.table(s"$db.$table").count())
          batch.write.mode("append").insertInto(s"$db.$table")
        } else batch.write.saveAsTable(s"$db.$table")
      }
      q.awaitTermination()
      spark.sql(s"REFRESH TABLE $db.$table")
      betweenBatchReads
    }

    val reads = runIngest("maint", compactEvery = 5)
    runIngest("plain", compactEvery = 0)
    assert(reads == 19L, s"a between-batch read lost rows (max seen $reads of 19)")
    val a = spark.table(s"$db.maint").orderBy("id").collect().toSeq
    val b = spark.table(s"$db.plain").orderBy("id").collect().toSeq
    assert(a == b, "maintained table content must equal the no-compaction run")
    assert(dataFiles(s"$db.plain") >= 20, "fixture must fragment without maintenance")
    // 3 compaction passes (at the START of batches 5/10/15 — before the
    // batch's own write, so a compaction failure replays an uncommitted
    // batch); batch 15's pass leaves 1 file + the 5 trailing appends
    assert(dataFiles(s"$db.maint") <= 6,
      s"maintained file count must stay bounded, got ${dataFiles(s"$db.maint")}")
  }
}

class StreamingDqSpec extends SparkSpec {
  import spark.implicits._

  test("DQ quarantine inside a streaming drain equals the batch split") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dq")
    java.nio.file.Files.writeString(dir.resolve("f1.csv"),
      "id,amount\n1,50\n2,5\n3,75\n")
    java.nio.file.Files.writeString(dir.resolve("f2.csv"),
      "id,amount\n4,3\n5,90\n")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_dq_ck")
    val rules = Seq("ColumnValues 'amount' >= 10")
    var passed = 0L; var failed = 0L
    val q = StreamingOps.fileArrivalPipeline(spark, dir.toString, "csv",
      "id INT, amount INT", ckpt.toString, Map("header" -> "true")) { (batch, _) =>
      // the DQ engine is batch-agnostic: foreachBatch hands it a plain
      // DataFrame, so the same DQDL rules run per micro-batch
      val r = new graft.dq.DqEngine().runQuarantine(batch, rules)
      passed += r.passed.count(); failed += r.failed.count()
    }
    q.awaitTermination()
    val all = Seq((1, 50), (2, 5), (3, 75), (4, 3), (5, 90)).toDF("id", "amount")
    val batchRef = new graft.dq.DqEngine().runQuarantine(all, rules)
    assert(passed == batchRef.passed.count())
    assert(failed == batchRef.failed.count())
  }

  test("hll sketch inside a streaming aggregation: multi-batch state merge equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.expressions.{SketchAggregates => SK}
    val mem = MemoryStream[(java.sql.Timestamp, String, Long)]
    val df = mem.toDF().toDF("ts", "event_type", "user_id")
    val agg = df.withWatermark("ts", "90 days")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(SK.hll_sketch(col("user_id").cast("string"), 8).as("regs"))
    val q = agg.writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Complete).start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val day = "2024-01-01"
    // users split across THREE micro-batches with overlap: the state-store
    // register array must merge (max) across batches, not reset
    mem.addData((1L to 40L).map(u => (t(s"$day 01:00:00"), "click", u)): _*)
    q.processAllAvailable()
    mem.addData((20L to 70L).map(u => (t(s"$day 02:00:00"), "click", u)): _*)
    q.processAllAvailable()
    mem.addData((60L to 100L).map(u => (t(s"$day 03:00:00"), "click", u)): _*)
    q.processAllAvailable()
    val streamed = spark.table("hll_stream")
      .select(SK.hll_estimate(col("regs"), 8).as("est")).as[Double].head()
    q.stop()
    val batch = (1L to 100L).toDF("user_id")
      .agg(SK.hll_sketch(col("user_id").cast("string"), 8).as("regs"))
      .select(SK.hll_estimate(col("regs"), 8).as("est")).as[Double].head()
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }

  test("left-outer interval join emits NULL-padded rows after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rm = MemoryStream[(Long, Long, java.sql.Timestamp)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val joined = StreamingOps.intervalJoin(
      lm.toDF().toDF("user_id", "click_id", "click_ts"),
      rm.toDF().toDF("user_id", "purchase_id", "purchase_ts"),
      "user_id", "click_ts", "purchase_ts", 3600L, "10 minutes", "left_outer")
    val q = joined.select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("oj_spec")
      .outputMode(OutputMode.Append).start()
    lm.addData((1L, 100L, t("2024-01-01 10:00:00")), (2L, 101L, t("2024-01-01 10:00:00")))
    rm.addData((1L, 200L, t("2024-01-01 10:30:00")))
    q.processAllAvailable()
    // watermark still behind click+1h: only the match is out
    assert(spark.table("oj_spec").count() == 1)
    lm.addData((9L, 900L, t("2024-01-02 10:00:00")))
    rm.addData((9L, 901L, t("2024-01-02 10:00:00")))
    q.processAllAvailable() // includes the no-data batch that flushes state
    q.stop()
    val rows = spark.table("oj_spec").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(rows.contains((101L, None)), s"unmatched click must NULL-pad: ${rows.mkString(",")}")
    assert(rows.contains((100L, Some(200L))))
  }

  test("watermark-advancing sentinels must not be filtered pre-sink (pushdown hazard)") {
    // a pre-sink filter on a non-time column is pushed BELOW the
    // EventTimeWatermark operator and removes the sentinel before the
    // watermark tracker sees it — this spec pins the hazard so the q140
    // pattern (post-drain filtering) is not \"simplified\" back
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val rm = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val joined = StreamingOps.intervalJoin(
      lm.toDF().toDF("user_id", "click_id", "click_ts", "ltype"),
      rm.toDF().toDF("user_id", "purchase_id", "purchase_ts", "rtype"),
      "user_id", "click_ts", "purchase_ts", 3600L, "10 minutes", "left_outer")
    // the HAZARD form: stream-side filter on ltype
    val q = joined.filter(col("ltype") === "click").select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("oj_hazard")
      .outputMode(OutputMode.Append).start()
    lm.addData((2L, 101L, t("2024-01-01 10:00:00"), "click"),
      (-1L, -1L, t("2024-01-05 10:00:00"), "__sentinel"))
    rm.addData((-1L, -1L, t("2024-01-05 10:00:00"), "__sentinel"))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    // the sentinel was filtered below the watermark op: no NULL row emitted
    // even though the sentinel should have advanced the watermark past it
    assert(spark.table("oj_hazard").count() == 0,
      "if this starts passing, Catalyst stopped pushing filters through " +
        "EventTimeWatermark and q140 can filter in-stream again")
  }
}
