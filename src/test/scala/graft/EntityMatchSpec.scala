package graft

import graft.config.Specs
import graft.operators.EntityMatch
import org.apache.spark.sql.functions._

class EntityMatchSpec extends SparkSpec {
  import spark.implicits._

  private val specJson = Specs.parseJson(
    """{
      "primary_entity_table": "SHOULD_BE_OVERRIDDEN",
      "global_id_field": "globalid",
      "sort_field": "lastupdated",
      "exact_match_fields": {
        "source_primary_key": "customerno",
        "source_system_key": "srcsystemid"
      },
      "levels": [
        {"id": "1",
         "blocks": ["firstname[:1]", "zip"],
         "fields": [
           {"fieldname": "firstname", "type": "string", "weight": 0.3,
            "method": "jarowinkler", "threshold": 0.85},
           {"fieldname": "dob", "type": "exact", "weight": 0.7}],
         "threshold": 0.85},
        {"id": "2",
         "blocks": ["phone"],
         "fields": [{"fieldname": "email", "type": "exact", "weight": 1.0}],
         "threshold": 1.0}
      ]
    }""")

  private def mkSpec(table: String) =
    EntityMatch.parseSpec(specJson).copy(primaryTable = table)

  private def primaryDf = Seq(
    ("C1", "A01", "g-1", "alice", "1990-01-01", "10001", "555-1111", "a@x.com", "2024-01-01"),
    ("C2", "A01", "g-2", "robert", "1985-05-05", "20002", "555-2222", "b@x.com", "2024-01-01"),
    ("C3", "C25", "g-3", "carol", "1970-10-10", "30003", "555-3333", "c@x.com", "2024-01-01")
  ).toDF("customerno", "srcsystemid", "globalid", "firstname", "dob", "zip", "phone", "email", "lastupdated")

  test("parseSpec reads the reference dialect") {
    val s = EntityMatch.parseSpec(specJson)
    assert(s.globalIdField == "globalid" && s.sourcePrimaryKey == "customerno")
    assert(s.levels.map(_.blocks) == Seq(Seq("firstname[:1]", "zip"), Seq("phone")))
    assert(s.levels.head.fields.head.threshold.contains(0.85))
    assert(!s.collapseIncoming) // extension flag defaults OFF
    val on = EntityMatch.parseSpec(graft.config.Specs.parseJson(
      """{"collapse_incoming": true}"""))
    assert(on.collapseIncoming)
  }

  test("blocking slice replicates the reference substring conversion") {
    val df = Seq(("alice", "10001")).toDF("firstname", "zip")
    val got = df.select(EntityMatch.blockingCol(Seq("firstname[:1]", "zip")).as("b"))
      .as[String].head()
    // reference quirk: [:1] yields substring(col,1,2) = first TWO chars
    assert(got == "al10001")
  }

  test("exact match inherits primary gid; unmatched stays null") {
    val spec = mkSpec("t")
    val incoming = Seq(
      ("C1", "A01", null, "alice", "1990-01-01", "10001", "555-1111", "a@x.com", "2024-02-01"),
      ("C9", "A01", null, "zed", "2000-02-02", "90009", "555-9999", "z@x.com", "2024-02-01")
    ).toDF("customerno", "srcsystemid", "globalid", "firstname", "dob", "zip", "phone", "email", "lastupdated")
    val (matched, unmatched) = EntityMatch.exactMatch(incoming, primaryDf, spec)
    assert(matched.select("globalid").as[String].collect().toSeq == Seq("g-1"))
    assert(unmatched.select("customerno").as[String].collect().toSeq == Seq("C9"))
  }

  test("fuzzy match: jarowinkler+exact weighted level matches typo'd name in same block") {
    val spec = mkSpec("t")
    // same first-2-chars block ("al"+zip), firstname typo, same dob → score 1.0
    val incoming = Seq(
      ("X1", "F15", null, "alicia", "1990-01-01", "10001", "555-0000", "other@x.com", "2024-02-01"),
      ("X2", "F15", null, "nomatch", "1999-09-09", "99999", "555-0001", "no@x.com", "2024-02-01")
    ).toDF("customerno", "srcsystemid", "globalid", "firstname", "dob", "zip", "phone", "email", "lastupdated")
    val (matched, unmatched) =
      EntityMatch.fuzzyMatch(incoming, primaryDf, spec, Seq("customerno", "srcsystemid"))
    assert(matched.select("customerno", "globalid").as[(String, String)].collect().toSeq ==
      Seq(("X1", "g-1")))
    assert(unmatched.select("customerno").as[String].collect().toSeq == Seq("X2"))
  }

  test("collapseIncoming is exactly result-preserving (incl. duplicate signatures, nulls, multi-level)") {
    val spec = mkSpec("t")
    val incoming = Seq(
      ("X1", "F15", null, "alicia", "1990-01-01", "10001", "555-0000", "other@x.com", "2024-02-01"),
      // duplicate field signature of X1 under a different row key
      ("X9", "F16", null, "alicia", "1990-01-01", "10001", "555-0000", "other@x.com", "2024-03-01"),
      ("X2", "F15", null, "nomatch", "1999-09-09", "99999", "555-0001", "no@x.com", "2024-02-01"),
      // null field values inside a valid block
      ("X3", "F15", null, "alicia", null, "10001", "555-2222", "b@x.com", "2024-02-01"),
      // level-2 (phone block) match only
      ("Y1", "F15", null, "bob", "1985-05-05", "77777", "555-2222", "b@x.com", "2024-02-01"),
      // DUPLICATE row key with a DIFFERENT signature (re-sent corrected
      // record): both paths must pick the same single winner per key
      ("X1", "F15", null, "alicai", "1990-01-01", "10001", "555-0000", "other@x.com", "2024-02-02")
    ).toDF("customerno", "srcsystemid", "globalid", "firstname", "dob", "zip", "phone", "email", "lastupdated")
    val key = Seq("customerno", "srcsystemid")
    def result(collapse: Boolean): (Seq[(String, String)], Seq[String]) = {
      val (m, u) = EntityMatch.fuzzyMatch(incoming, primaryDf, spec, key,
        collapseIncoming = collapse)
      (m.select("customerno", "globalid").as[(String, String)].collect().toSeq.sorted,
        u.select("customerno").as[String].collect().toSeq.sorted)
    }
    val direct = result(collapse = false)
    val collapsed = result(collapse = true)
    assert(collapsed == direct)
    assert(direct._1.map(_._1).contains("X9")) // the duplicate signature matched too
  }

  test("salt split on a distinct-tuple hot block is exactly result-preserving") {
    // one hot block value, every primary tuple DISTINCT (the case the tuple
    // collapse cannot linearize and the salt guard exists for); a tiny
    // saltTupleThreshold forces the split here, compared against the
    // unsalted path (threshold above the block size)
    val spec = EntityMatch.MatchSpec(
      "t", "globalid", "", "", "",
      Seq(EntityMatch.LevelSpec("1", Seq("blk"),
        Seq(EntityMatch.FieldSpec("name", "string", "jarowinkler", Some(0.85), 1.0)),
        1.0)))
    val primary = (1 to 400).map(i => (s"p$i", "HOT", f"name-$i%04d", s"g-$i"))
      .toDF("pid", "blk", "name", "globalid")
    val incoming = (1 to 300).map(i =>
        (s"i$i", "HOT", f"name-${i * 7 % 400 + 1}%04d", null: String))
      .toDF("rid", "blk", "name", "globalid")
    def run(threshold: Int) = {
      val (m, u) = EntityMatch.fuzzyMatch(incoming, primary, spec, Seq("rid"),
        saltTupleThreshold = threshold)
      (m.select("rid", "globalid").as[(String, String)].collect().toSeq.sorted,
        u.select("rid").as[String].collect().toSeq.sorted)
    }
    val salted = run(threshold = 16) // 400 tuples >> 16 -> nsalt capped at 64
    val direct = run(threshold = 100000)
    assert(salted == direct)
    assert(salted._1.nonEmpty)
    // both paths also agree under the incoming collapse
    val saltedCollapsed = {
      val (m, u) = EntityMatch.fuzzyMatch(incoming, primary, spec, Seq("rid"),
        collapseIncoming = true, saltTupleThreshold = 16)
      (m.select("rid", "globalid").as[(String, String)].collect().toSeq.sorted,
        u.select("rid").as[String].collect().toSeq.sorted)
    }
    assert(saltedCollapsed == direct)
  }

  test("fuzzy match level 2 (phone block, exact email) overrides level 1 miss") {
    val spec = mkSpec("t")
    val incoming = Seq(
      // different name+zip (level 1 cannot match) but same phone+email → level 2
      ("Y1", "F15", null, "bob", "1985-05-05", "77777", "555-2222", "b@x.com", "2024-02-01")
    ).toDF("customerno", "srcsystemid", "globalid", "firstname", "dob", "zip", "phone", "email", "lastupdated")
    val (matched, _) =
      EntityMatch.fuzzyMatch(incoming, primaryDf, spec, Seq("customerno", "srcsystemid"))
    assert(matched.select("globalid").as[String].head() == "g-2")
  }

  test("partitioned primary: upsert rewrites only the affected partitions") {
    val db = s"emdbp${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val table = s"$db.primary_part"
    primaryDf.write.partitionBy("srcsystemid").saveAsTable(table)
    val loc = spark.sql(s"DESCRIBE FORMATTED $table")
      .filter(col("col_name") === "Location").select("data_type").as[String].head()
    def listing(part: String) = {
      val d = new java.io.File(new java.net.URI(s"$loc/srcsystemid=$part"))
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified(), f.length())).toSeq.sortBy(_._1)
    }
    val c25Before = listing("C25")
    val a01Before = listing("A01")
    assert(c25Before.nonEmpty && a01Before.nonEmpty)
    val incoming = Seq(
      ("C1", "A01", "g-1", "alicia", "1990-01-01", "10001", "555-1111", "a2@x.com", "2024-04-01")
    ).toDF("customerno", "srcsystemid", "globalid", "firstname", "dob", "zip", "phone", "email", "lastupdated")
    EntityMatch.upsert(spark, table, incoming, mkSpec(table))
    // untouched partition: same files, byte-for-byte; touched partition: rewritten
    assert(listing("C25") == c25Before)
    assert(listing("A01") != a01Before)
    val primary = spark.table(table)
    assert(primary.count() == 3)
    assert(primary.filter(col("customerno") === "C1").select("email").as[String].head() == "a2@x.com")
    assert(primary.filter(col("srcsystemid") === "C25")
      .select("globalid").as[String].collect().toSeq == Seq("g-3"))
  }

  test("upsert drops a partition the merge drained (row moved between partitions)") {
    val db = s"emdbd${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val table = s"$db.primary_drain"
    primaryDf.write.partitionBy("srcsystemid").saveAsTable(table)
    // g-3 is the ONLY row in partition C25; its latest version moves to A01 —
    // dynamic overwrite alone would never touch C25 and the stale row would
    // survive as a duplicate gid
    val incoming = Seq(
      ("C3", "A01", "g-3", "carol", "1970-10-10", "30003", "555-3333", "c@x.com", "2024-04-01")
    ).toDF("customerno", "srcsystemid", "globalid", "firstname", "dob", "zip", "phone", "email", "lastupdated")
    EntityMatch.upsert(spark, table, incoming, mkSpec(table))
    val primary = spark.table(table)
    assert(primary.count() == 3)
    assert(primary.filter(col("globalid") === "g-3").count() == 1)
    assert(primary.filter(col("srcsystemid") === "C25").isEmpty)
    assert(primary.filter(col("globalid") === "g-3")
      .select("srcsystemid").as[String].head() == "A01")
  }

  test("full run: first run creates primary with uuids; second run matches + upserts") {
    val table = s"emdb${System.nanoTime()}.primary"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${table.split('.')(0)}")
    val spec = mkSpec(table)
    val day1 = primaryDf.drop("globalid")
    val out1 = EntityMatch.run(spark, day1, spec, Seq("customerno", "srcsystemid"))
    assert(out1.filter(col("globalid").isNull).isEmpty)
    assert(spark.table(table).count() == 3)

    val day2 = Seq(
      // exact re-match of C1 with newer timestamp
      ("C1", "A01", "alice", "1990-01-01", "10001", "555-1111", "a@x.com", "2024-03-01"),
      // brand new entity
      ("N1", "C25", "nina", "1992-02-02", "40004", "555-4444", "n@x.com", "2024-03-01")
    ).toDF("customerno", "srcsystemid", "firstname", "dob", "zip", "phone", "email", "lastupdated")
    EntityMatch.run(spark, day2, spec, Seq("customerno", "srcsystemid"))
    val primary = spark.table(table)
    assert(primary.count() == 4) // C1 updated in place, N1 inserted
    assert(primary.filter(col("customerno") === "C1")
      .select("lastupdated").as[String].head() == "2024-03-01")
    assert(primary.select("globalid").distinct().count() == 4)
  }

  test("stats-pruned exact leg: identical result to the plain run, fewer primary files read") {
    import graft.catalog.FileStats
    val db = s"empr${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    // a years-deep primary: 2000 entities across 16 files, pk clustered so
    // the bloom + range stats can prune hard
    val big = spark.range(0, 2000).select(
      concat(lit("C"), col("id")).as("customerno"), lit("A01").as("srcsystemid"),
      concat(lit("g-"), col("id")).as("globalid"),
      concat(lit("name"), col("id")).as("firstname"),
      lit("1990-01-01").as("dob"),
      (col("id") % 90000 + 10000).cast("string").as("zip"),
      concat(lit("555-"), col("id")).as("phone"),
      concat(lit("u"), col("id"), lit("@x.com")).as("email"),
      lit("2024-01-01").as("lastupdated"))
    def mk(t: String): Unit =
      big.repartitionByRange(16, col("customerno")).write.saveAsTable(t)
    mk(s"$db.plain"); mk(s"$db.pruned")
    FileStats.refresh(spark, s"$db.pruned", s"$db.pruned_stats",
      FileStats.StatsSpec(Seq("customerno"), bloomCols = Seq("customerno"),
        bloomBits = 1 << 15))
    // a small daily batch: two exact re-matches, one fuzzy, one new
    val day = Seq(
      ("C7", "A01", "name7", "1990-01-01", "10007", "555-7", "u7@x.com", "2024-03-01"),
      ("C1500", "A01", "name1500", "1990-01-01", "11500", "555-1500", "u1500@x.com", "2024-03-01"),
      ("X1", "B99", "name42", "1990-01-01", "10042", "555-42", "u42@x.com", "2024-03-01"),
      ("Z9", "B99", "zed", "1999-09-09", "99999", "555-0000", "z@x.com", "2024-03-01")
    ).toDF("customerno", "srcsystemid", "firstname", "dob", "zip", "phone", "email", "lastupdated")
    val outPlain = EntityMatch.run(spark, day,
      mkSpec(s"$db.plain"), Seq("customerno", "srcsystemid"))
    val outPruned = EntityMatch.run(spark, day,
      mkSpec(s"$db.pruned"), Seq("customerno", "srcsystemid"),
      statsTable = Some(s"$db.pruned_stats"))
    // gids are uuid-filled for new entities, so compare the MATCH outcome:
    // which incoming rows landed which stored gid (null-safe for news)
    def outcome(df: org.apache.spark.sql.DataFrame) = df
      .select(col("customerno"), col("srcsystemid"),
        when(col("globalid").startsWith("g-"), col("globalid")).as("stored_gid"))
    assert(outcome(outPruned).exceptAll(outcome(outPlain)).isEmpty &&
      outcome(outPlain).exceptAll(outcome(outPruned)).isEmpty,
      "pruned exact leg must be result-preserving")
    // both primaries converged identically (modulo the new entity's uuid)
    def state(t: String) = spark.table(t)
      .select(col("customerno"), col("lastupdated"))
    assert(state(s"$db.pruned").exceptAll(state(s"$db.plain")).isEmpty)
    // and the plan-level claim: the exact leg read a fraction of the files
    val probe = FileStats.keysPrunedScan(spark, s"$db.pruned",
      s"$db.pruned_stats", "customerno",
      day.select(col("customerno")), 1000).get
    assert(probe.inputFiles.length <= 16 / 2,
      s"bloom must prune the primary read: ${probe.inputFiles.length} of 16")
    // write-path maintenance: the run refreshed the index after its
    // upsert, so a follow-up refresh is steady-state (scans nothing) and
    // post-rewrite probes prune against FRESH stats (zero unknown files)
    val r = FileStats.refresh(spark, s"$db.pruned", s"$db.pruned_stats",
      FileStats.statsSpecOf(spark, s"$db.pruned_stats").get)
    assert(r.filesScanned == 0, s"post-run refresh must be steady-state: $r")
    val (_, _, rep) = FileStats.pruneFiles(spark, s"$db.pruned",
      s"$db.pruned_stats", Seq(FileStats.KeysPredicate("customerno", Seq("C7"))))
    assert(rep.filesUnknown == 0, rep.toString)
  }

  test("TableFormat seam: explicit HiveParquetFormat behaves identically") {
    val db = s"emdbs${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val table = s"$db.primary_seam"
    primaryDf.write.saveAsTable(table)
    val incoming = Seq(
      ("C1", "A01", "g-1", "alicia", "1990-01-01", "10001", "555-1111", "seam@x.com", "2024-04-01")
    ).toDF("customerno", "srcsystemid", "globalid", "firstname", "dob", "zip", "phone", "email", "lastupdated")
    EntityMatch.upsert(spark, table, incoming, mkSpec(table),
      format = graft.catalog.HiveParquetFormat)
    val primary = spark.table(table)
    assert(primary.count() == 3)
    assert(primary.filter(col("globalid") === "g-1")
      .select("email").as[String].head() == "seam@x.com")
  }

  test("date-partitioned primary: upsert merges and drained-partition DROP round-trips") {
    val db = s"emdbdate${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val table = s"$db.primary_date"
    // C1→2024-01-01, C2→2024-02-01, C3→2024-03-01 (one partition each)
    primaryDf.withColumn("load_date",
        to_date(concat(lit("2024-0"), substring(col("customerno"), 2, 1), lit("-01"))))
      .write.partitionBy("load_date").saveAsTable(table)
    // g-3's only row moves to a different load_date: exercises BOTH the
    // dynamic overwrite and the drained-partition DROP with a DATE literal
    val incoming = Seq(
      ("C3", "A01", "g-3", "carol", "1970-10-10", "30003", "555-3333", "c@x.com", "2024-04-01")
    ).toDF("customerno", "srcsystemid", "globalid", "firstname", "dob", "zip", "phone", "email", "lastupdated")
      .withColumn("load_date", to_date(lit("2024-01-01")))
    EntityMatch.upsert(spark, table, incoming, mkSpec(table))
    val primary = spark.table(table)
    assert(primary.count() == 3)
    assert(primary.filter(col("globalid") === "g-3").count() == 1)
    assert(primary.filter(col("globalid") === "g-3")
      .select("load_date").as[java.sql.Date].head().toString == "2024-01-01")
  }

  test("SqlMergeFormat emits the reference's MERGE statement shape") {
    val sql = graft.catalog.SqlMergeFormat.mergeSql("db.entity_primary", "src_v", "global`id")
    assert(sql.contains("MERGE INTO db.entity_primary t"))
    assert(sql.contains("USING `src_v` s"))
    // null-safe key equality and backtick-escaped identifier
    assert(sql.contains("ON t.`global``id` <=> s.`global``id`"))
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET *"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT *"))
  }

  test("SqlMergeFormat dry-run: generated MERGE parses and analyzes against real relations") {
    // No Iceberg/Delta jar exists in this sandbox, so the statement can't
    // EXECUTE — but parsing + analysis against a real target table and source
    // view still validates syntax and column references, catching drift
    // before a real deployment. Spark's analyzer resolves the MERGE fully and
    // only then rejects the v1 parquet target's missing row-level-op
    // capability, so the error CLASS tells the two cases apart.
    val db = "graft_mergedry"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Seq(("g-1", "alice", 1)).toDF("globalid", "name", "nationkey")
        .write.mode("overwrite").saveAsTable(s"$db.primary_t")
      Seq(("g-2", "bob", 2)).toDF("globalid", "name", "nationkey")
        .createOrReplaceTempView("merge_src_v")

      val good = graft.catalog.SqlMergeFormat.mergeSql(s"$db.primary_t", "merge_src_v", "globalid")
      // syntax: must parse
      spark.sessionState.sqlParser.parsePlan(good)
      // analysis: every reference must resolve; the only acceptable failure
      // is the target-table capability rejection
      val eGood = intercept[Exception](spark.sql(good))
      assert(eGood.getMessage.toLowerCase.contains("merge"),
        s"expected a MERGE capability rejection, got: ${eGood.getMessage}")
      assert(!eGood.getMessage.contains("UNRESOLVED"), eGood.getMessage)

      // a drifted key column must fail RESOLUTION, proving the dry-run
      // actually checks columns, not just syntax
      val bad = graft.catalog.SqlMergeFormat.mergeSql(s"$db.primary_t", "merge_src_v", "no_such_col")
      val eBad = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad))
      assert(eBad.getCondition != null &&
        eBad.getCondition.startsWith("UNRESOLVED"), s"${eBad.getCondition}: ${eBad.getMessage}")
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      spark.catalog.dropTempView("merge_src_v")
    }
  }
}
