package graft

import org.apache.spark.sql.functions._

/** Round-13 operators: the unified three-tier streaming DQ gate (reference
  * ordering incl. the pre-quarantine-halt quirk), and its failure modes. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------ unified three-tier DQ gate

  test("ingestRulesetDqGate: one pass runs warn + quarantine + halt; halt " +
    "evaluates the PRE-quarantine frame (the :312 quirk)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val db = s"rsdq${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val (cl, qt, res) = (s"$db.cleansed", s"$db.quarantine", s"$db.results")
    val ckpt = java.nio.file.Files.createTempDirectory("r13_rsdq_ckpt").toString
    val mem = MemoryStream[(Long, String, Double)]
    def gate(halt: Seq[String]) = StreamingOps.ingestRulesetDqGate(
      mem.toDF().toDF("id", "status", "amount"),
      warnRules = Seq("ColumnValues 'status' in ['ok']"),
      quarantineRules = Seq("ColumnValues 'amount' >= 0"),
      haltRules = halt, cl, qt, res, ckpt, availableNow = true)

    // batch 0: one negative row -> quarantined; warn records a failure;
    // halt (amount >= -100, pre-quarantine) passes; batch flows
    mem.addData((1L, "ok", 5.0), (2L, "bad", 7.0), (3L, "ok", -1.0))
    gate(Seq("ColumnValues 'amount' >= -100")).awaitTermination()
    Seq(cl, qt, res).foreach(t => spark.catalog.refreshTable(t))
    assert(spark.table(cl).select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(spark.table(qt).select("id").as[Long].collect().toSeq == Seq(3L))
    val r0 = spark.table(res).filter(col("batch_id") === 0L)
      .select("tier", "outcome").as[(String, String)].collect().toSet
    assert(r0 == Set(("warn", "Failed"), ("quarantine", "Failed"), ("halt", "Passed")), r0)

    // batch 1: THE QUIRK — the only halt-violating row (-500) is ALSO
    // quarantined away; a post-quarantine halt would pass, but the
    // reference evaluates halt on the original frame, so the stream halts.
    // The quarantine partition and verdicts are written; nothing commits.
    mem.addData((4L, "ok", 10.0), (5L, "ok", -500.0))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      gate(Seq("ColumnValues 'amount' >= -100")).awaitTermination()
    }
    assert(e.getMessage.contains("Dataset DQ halt"), e.getMessage)
    Seq(cl, qt, res).foreach(t => spark.catalog.refreshTable(t))
    assert(spark.table(cl).filter(col("id") === 4L).isEmpty,
      "halted batch must not reach the cleansed table")
    assert(spark.table(qt).filter(col("batch_id") === 1L)
      .select("id").as[Long].collect().toSeq == Seq(5L),
      "quarantined rows persist even under a halt (reference write order)")
    assert(spark.table(res).filter(col("batch_id") === 1L &&
      col("tier") === "halt" && col("outcome") === "Failed").count() == 1,
      "the halt verdict is observable though the batch never commits")
    assert(StreamingOps.readCommitted(spark, cl, ckpt)
      .select("id").as[Long].collect().toSet == Set(1L, 2L),
      "committed view excludes the halted batch")

    // operator relaxes the halt rule: the SAME batch replays, its
    // outcome/quarantine partitions are REPLACED (not duplicated), flows
    gate(Seq("ColumnValues 'amount' >= -1000")).awaitTermination()
    Seq(cl, qt, res).foreach(t => spark.catalog.refreshTable(t))
    assert(spark.table(cl).select("id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    assert(spark.table(qt).filter(col("batch_id") === 1L).count() == 1)
    assert(spark.table(res).filter(col("batch_id") === 1L &&
      col("tier") === "halt").count() == 1, "replay replaces, never duplicates")
    assert(spark.table(res).filter(col("batch_id") === 1L &&
      col("tier") === "halt" && col("outcome") === "Passed").count() == 1)
  }

  // ------------------------------ incremental exact-substring dedup

  private def charDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("incrementalScrubRepeatedCharSpans: batch scrub equals the from-scratch union run, both modes") {
    import graft.operators.SuffixArray
    val banner = "shared-boilerplate-across-the-corpus!!"
    val stored = charDocs(Seq(
      (1L, s"alpha $banner omega"),
      (2L, "totally unique stored text with nothing repeated here"),
      (3L, s"stored twin $banner"),
      (4L, "sh")))
    val batch = charDocs(Seq(
      (10L, s"new doc carrying $banner too"),        // hot vs stored
      (11L, "fresh unique content nothing shared"),  // untouched
      (12L, "batch-only duplicate window ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789abcd!"),
      (13L, "batch-only duplicate window ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789abcd!"),
      (14L, "")))                                     // empty passes through
    for (kf <- Seq(false, true); minLen <- Seq(20, 38)) {
      val idx = SuffixArray.charWindowIndex(stored, "doc_id", "text", minLen)
      val (report, updated) = SuffixArray.incrementalScrubRepeatedCharSpans(
        idx, batch, "doc_id", "text", minLen, keepFirst = kf)
      val union = stored.unionByName(batch)
      val scratch = SuffixArray.scrubRepeatedCharSpans(
          union, "doc_id", "text", minLen, keepFirst = kf)
        .filter(col("doc_id") >= 10L)
      assert(report.exceptAll(scratch).isEmpty && scratch.exceptAll(report).isEmpty,
        s"keepFirst=$kf minLen=$minLen: batch scrub must equal the union slice")
      // the updated index IS the union corpus's index — tomorrow composes
      val unionIdx = SuffixArray.charWindowIndex(union, "doc_id", "text", minLen)
      assert(updated.exceptAll(unionIdx).isEmpty && unionIdx.exceptAll(updated).isEmpty,
        s"keepFirst=$kf minLen=$minLen: updated index must equal the union build")
    }
  }

  test("incrementalScrubRepeatedCharSpans: two chained days compose; forced shuffle fallback stays exact") {
    import graft.operators.SuffixArray
    val b = "another-long-banner-window-for-days!"
    val day0 = charDocs(Seq((1L, s"base $b"), (2L, "quiet stored doc one")))
    val day1 = charDocs(Seq((10L, s"first delivery $b"), (11L, "noise alpha")))
    val day2 = charDocs(Seq((20L, s"second delivery $b and more"), (21L, "noise beta")))
    val minLen = b.length
    val i0 = SuffixArray.charWindowIndex(day0, "doc_id", "text", minLen)
    val (_, i1) = SuffixArray.incrementalScrubRepeatedCharSpans(
      i0, day1, "doc_id", "text", minLen, keepFirst = true)
    // broadcastMaxRows = 1 forces every guarded hint to shuffle joins
    val (r2, i2) = SuffixArray.incrementalScrubRepeatedCharSpans(
      i1, day2, "doc_id", "text", minLen, keepFirst = true, broadcastMaxRows = 1L)
    val union = day0.unionByName(day1).unionByName(day2)
    val scratch = SuffixArray.scrubRepeatedCharSpans(
        union, "doc_id", "text", minLen, keepFirst = true)
      .filter(col("doc_id") >= 20L)
    assert(r2.exceptAll(scratch).isEmpty && scratch.exceptAll(r2).isEmpty)
    val unionIdx = SuffixArray.charWindowIndex(union, "doc_id", "text", minLen)
    assert(i2.exceptAll(unionIdx).isEmpty && unionIdx.exceptAll(i2).isEmpty)
  }

  // ------------------------------ streaming substring-dedup gate

  test("ingestSubstringDedupGate: per-batch reports match the incremental op; " +
    "index state equals the one-shot union build; replay adds nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.operators.SuffixArray
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val db = s"ssd${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val (rt, it) = (s"$db.report", s"$db.windex")
    val ckpt = java.nio.file.Files.createTempDirectory("r13_ssd_ckpt").toString
    val banner = "gate-level-shared-banner-across-batches!"
    val minLen = banner.length
    val mem = MemoryStream[(Long, String)]
    def gate() = StreamingOps.ingestSubstringDedupGate(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id", minLen,
      keepFirst = true, rt, it, ckpt, availableNow = true)

    // batch 0: banner appears twice WITHIN the batch -> second copy scrubbed
    val b0 = Seq((1L, s"first $banner"), (2L, s"second $banner"),
      (3L, "unique quiet document one"))
    mem.addData(b0: _*)
    gate().awaitTermination()
    Seq(rt, it).foreach(t => spark.catalog.refreshTable(t))
    val r0 = spark.table(rt).filter(col("batch_id") === 0L)
      .select("doc_id", "n_masked").as[(Long, Long)].collect().toMap
    // the maximal shared repeat is " $banner" — the leading space rides
    // along, so 41 chars mask, not 40
    assert(r0 == Map(1L -> 0L, 2L -> (minLen + 1).toLong, 3L -> 0L), r0.toString)

    // batch 1: banner arrives again -> scrubbed against STORED state; a
    // batch-unique doc passes
    val b1 = Seq((10L, s"third $banner"), (11L, "another quiet document"))
    mem.addData(b1: _*)
    gate().awaitTermination()
    Seq(rt, it).foreach(t => spark.catalog.refreshTable(t))
    val r1 = spark.table(rt).filter(col("batch_id") === 1L)
      .select("doc_id", "n_masked").as[(Long, Long)].collect().toMap
    // "third" and the stored "second" both end in 'd', so the maximal
    // shared repeat is "d $banner" — 42 chars
    assert(r1 == Map(10L -> (minLen + 2).toLong, 11L -> 0L), r1.toString)
    // and the report equals the incremental op run against batch-0 state
    val (expect1, _) = SuffixArray.incrementalScrubRepeatedCharSpans(
      SuffixArray.charWindowIndex(b0.toDF("doc_id", "text"), "doc_id", "text", minLen),
      b1.toDF("doc_id", "text"), "doc_id", "text", minLen, keepFirst = true)
    val got1 = spark.table(rt).filter(col("batch_id") === 1L).drop("batch_id")
    assert(got1.exceptAll(expect1).isEmpty && expect1.exceptAll(got1).isEmpty)

    // the gate-maintained index AGGREGATES to the one-shot union build
    val aggIdx = spark.table(it).drop("batch_id")
      .groupBy(col("w")).agg(max(col("h")).as("h"), sum(col("cnt")).as("cnt"),
        min(struct(col("first_doc").as("d"), col("first_pos").as("p"))).as("f"))
      .select(col("h"), col("w"), col("cnt"),
        col("f.d").as("first_doc"), col("f.p").as("first_pos"))
    val unionIdx = SuffixArray.charWindowIndex(
      (b0 ++ b1).toDF("doc_id", "text"), "doc_id", "text", minLen)
    assert(aggIdx.exceptAll(unionIdx).isEmpty && unionIdx.exceptAll(aggIdx).isEmpty,
      "gate index must aggregate to the union build")

    // replay: a fresh drain with no new data changes nothing
    gate().awaitTermination()
    Seq(rt, it).foreach(t => spark.catalog.refreshTable(t))
    assert(spark.table(rt).count() == 5 && spark.table(it).groupBy("batch_id").count().count() == 2)
  }

  // ------------------------------------------ incremental PageRank

  private def prEdges(es: Seq[(Long, Long)]) = es.toDF("src", "dst")
  private def prNodes(ids: Seq[Long]) = ids.toDF("id")
  private def eq(a: org.apache.spark.sql.DataFrame,
                 b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("fixedPointTrace: final slice equals fixedPoint; iter 0 is uniform scale") {
    import graft.operators.PageRank
    val nodes = prNodes(0L to 19L)
    val edges = prEdges((0L to 19L).flatMap(i =>
      Seq((i, (2 * i + 1) % 20), (i, (5 * i + 3) % 20))))
    val trace = PageRank.fixedPointTrace(edges, "src", "dst", nodes, "id", 3)
    val direct = PageRank.fixedPoint(edges, "src", "dst", nodes, "id", 3)
      .withColumnRenamed("id", "id")
    assert(eq(trace.filter(col("iter") === 3).select("id", "pr"), direct))
    val it0 = trace.filter(col("iter") === 0).as[(Int, Long, Long)].collect()
    assert(it0.length == 20 && it0.forall(_._3 == 1000000L))
  }

  test("incrementalFixedPoint: exact whole-trace equality with the from-scratch union run") {
    import graft.operators.PageRank
    // two communities plus a chain; the batch bridges, adds a parallel
    // edge (out-degree change on an existing src), and attaches two
    // brand-new nodes
    val nodes = prNodes(0L to 29L)
    val stored = prEdges(
      (0L to 9L).map(i => (i, (i + 1) % 10)) ++
      (10L to 19L).map(i => (i, 10L + (i + 3) % 10)) ++
      Seq((20L, 21L), (21L, 22L), (22L, 23L)))
    val batch = prEdges(Seq((5L, 15L), (0L, 1L), (100L, 7L), (101L, 100L)))
    val trace = PageRank.fixedPointTrace(stored, "src", "dst", nodes, "id", 3)
    val inc = PageRank.incrementalFixedPoint(stored, trace, batch, "src", "dst", 3)
    val unionNodes = prNodes((0L to 29L) ++ Seq(100L, 101L))
    val scratch = PageRank.fixedPointTrace(stored.unionByName(batch),
      "src", "dst", unionNodes, "id", 3)
    assert(eq(inc, scratch), "incremental trace must equal the union trace")
    // untouched chain rows pass through verbatim from the stored trace
    val chainInc = inc.filter(col("id").between(21L, 23L))
    val chainStored = trace.filter(col("id").between(21L, 23L))
    assert(eq(chainInc, chainStored))
  }

  test("incrementalFixedPoint: day-2 composes on day-1's trace; forced shuffle fallback stays exact") {
    import graft.operators.PageRank
    val nodes = prNodes(0L to 9L)
    val day0 = prEdges(Seq((0L, 1L), (1L, 2L), (2L, 0L), (5L, 6L)))
    val day1 = prEdges(Seq((2L, 5L), (6L, 7L)))
    val day2 = prEdges(Seq((7L, 0L), (8L, 9L)))
    val t0 = PageRank.fixedPointTrace(day0, "src", "dst", nodes, "id", 3)
    val t1 = PageRank.incrementalFixedPoint(day0, t0, day1, "src", "dst", 3)
    // broadcastMaxRows = 1 forces every guarded hint to shuffle joins
    val t2 = PageRank.incrementalFixedPoint(day0.unionByName(day1), t1, day2,
      "src", "dst", 3, broadcastMaxRows = 1L)
    val scratch = PageRank.fixedPointTrace(
      day0.unionByName(day1).unionByName(day2), "src", "dst", nodes, "id", 3)
    assert(eq(t2, scratch))
  }

  test("ingestRulesetDqGate: quarantining every row is itself a halt, checked before the halt tier") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val db = s"rsdqall${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val (cl, qt, res) = (s"$db.cleansed", s"$db.quarantine", s"$db.results")
    val ckpt = java.nio.file.Files.createTempDirectory("r13_rsdqall_ckpt").toString
    val mem = MemoryStream[(Long, Double)]
    def gate(quar: Seq[String]) = StreamingOps.ingestRulesetDqGate(
      mem.toDF().toDF("id", "amount"),
      warnRules = Nil, quarantineRules = quar,
      haltRules = Seq("RowCount > 0"), cl, qt, res, ckpt, availableNow = true)

    mem.addData((1L, -5.0), (2L, -6.0))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      gate(Seq("ColumnValues 'amount' >= 0")).awaitTermination()
    }
    assert(e.getMessage.contains("quarantined all rows"), e.getMessage)
    Seq(qt, res).foreach(t => spark.catalog.refreshTable(t))
    assert(spark.table(qt).count() == 2, "the rows are in quarantine, observable")
    assert(spark.table(res).filter(col("tier") === "quarantine" &&
      col("outcome") === "Failed").count() == 1)
    // relaxed quarantine rule releases the batch on replay
    gate(Seq("ColumnValues 'amount' >= -100")).awaitTermination()
    Seq(cl, qt, res).foreach(t => spark.catalog.refreshTable(t))
    assert(spark.table(cl).count() == 2)
    assert(spark.table(qt).filter(col("batch_id") === 0L).count() == 0,
      "the replayed batch's quarantine partition is replaced with the new (empty) split")
  }
}
