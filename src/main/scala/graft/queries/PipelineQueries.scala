package graft.queries

import graft.config.Specs
import graft.pipeline.{JobArgs, PipelineRunner}
import graft.transforms.TransformContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end pipeline as an oracle-checked, benchmarked query: lineitem is
  * re-materialized as a raw CSV (insurance-feed stand-in), then runs the FULL
  * collect-to-cleanse path — csv read with inferSchema, mapping rename, date
  * parse, decimal changetype, filterrows, DQ quarantine, partition literals,
  * evolution-gated partitioned write — and the cleansed frame is compared to
  * a DuckDB oracle replicating the same semantics over the parquet source. */
object PipelineQueries {

  /** Recursive delete with the walk stream closed (Files.walk holds open
    * directory handles — unclosed, it leaks fds on every bench invocation). */
  private def wipeDir(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
      finally s.close()
    }

  private def csvPath(sfDir: String): String =
    s"/tmp/graft_ingest_csv/${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"

  private def ensureCsv(spark: SparkSession, sfDir: String): String = {
    val dir = csvPath(sfDir)
    val done = new java.io.File(s"$dir/_SUCCESS")
    if (!done.exists()) {
      Tables(spark, sfDir, "lineitem")
        .select(
          col("l_orderkey").as("OrderKey"),
          col("l_linenumber").as("LineNumber"),
          col("l_quantity").as("Quantity"),
          col("l_extendedprice").as("ExtendedPrice"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ShipDate"),
          col("l_returnflag").as("ReturnFlag"))
        .coalesce(4)
        .write.mode("overwrite").option("header", "true").csv(dir)
    }
    dir
  }

  /** Driver-written single-file fixtures for the non-CSV source formats
    * (S2/S4/S5): nation re-materialized as JSONL, XML, and fixed-width text.
    * Tiny (25-row) config-like artifacts — driver-side writes by design. */
  private def ensureFormats(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths}
    val dir = s"/tmp/graft_src_formats/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    // Check every expected artifact AND the `.done` marker (written last):
    // the artifact list catches a fixture dir written by an older build
    // (pre-ORC, pre-Avro — new legs would FileNotFound), while `.done`
    // catches a crash mid-generation that left an artifact existing but
    // truncated (e.g. a flushed-on-close partial Avro container).
    val expected = Seq("nation.jsonl", "nation.xml", "nation.dat",
      "nation_orc/_SUCCESS", "nation_avro/part-0.avro", ".done")
    if (!expected.forall(p => Files.exists(Paths.get(dir, p)))) {
      Files.createDirectories(Paths.get(dir))
      // invalidate first: a stale `.done` from an older generation must not
      // vouch for a regeneration that crashes partway through
      Files.deleteIfExists(Paths.get(dir, ".done"))
      val rows = Tables(s, d, "nation")
        .select(col("n_nationkey").cast(LongType), col("n_regionkey").cast(LongType), col("n_name"))
        .orderBy(col("n_nationkey")).collect()
      Files.writeString(Paths.get(dir, "nation.jsonl"), rows.map(r =>
        s"""{"nationkey": ${r.getLong(0)}, "regionkey": ${r.getLong(1)}, "name": "${r.getString(2)}"}""")
        .mkString("\n"))
      Files.writeString(Paths.get(dir, "nation.xml"),
        "<nations>\n" + rows.map(r =>
          s"  <nation><nationkey>${r.getLong(0)}</nationkey><regionkey>${r.getLong(1)}</regionkey>" +
          s"<name>${r.getString(2)}</name></nation>").mkString("\n") + "\n</nations>")
      Files.writeString(Paths.get(dir, "nation.dat"), rows.map(r =>
        f"${r.getLong(0)}%-6d${r.getLong(1)}%-6d${r.getString(2)}%-20s").mkString("\n"))
      Tables(s, d, "nation")
        .select(col("n_nationkey").cast(LongType).as("nationkey"),
          col("n_regionkey").cast(LongType).as("regionkey"),
          col("n_name").as("name"))
        .coalesce(1).write.mode("overwrite").orc(s"$dir/nation_orc")
      // Avro container fixture via the avro CORE api (no spark-avro module
      // jar exists here — the same reason AvroSource decodes natively)
      locally {
        import org.apache.avro.{Schema, SchemaBuilder}
        import org.apache.avro.file.DataFileWriter
        import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
        val schema: Schema = SchemaBuilder.record("nation").fields()
          .requiredLong("nationkey").requiredLong("regionkey")
          .requiredString("name").endRecord()
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        Files.createDirectories(Paths.get(dir, "nation_avro"))
        // create() is inside the try so a failure there (unwritable dir)
        // still runs close() and doesn't leak the writer
        try {
          w.create(schema, new java.io.File(s"$dir/nation_avro/part-0.avro"))
          rows.foreach { r =>
            val rec = new GenericData.Record(schema)
            rec.put("nationkey", r.getLong(0))
            rec.put("regionkey", r.getLong(1))
            rec.put("name", r.getString(2))
            w.append(rec)
          }
        } finally w.close()
      }
      Files.writeString(Paths.get(dir, ".done"), "ok")
    }
    dir
  }

  // multiline: false — the staged feed is machine-written with no quoted
  // embedded newlines; the opt-out restores per-file SPLITTABLE parsing
  // (multiLine CSV pins one task per file — the reference-parity default
  // costs ~1.5 s of 4-way-parallel parse on 32 cores here, and at 100 TB
  // it is the difference between a parallel scan and per-file stragglers)
  private val specJson = Specs.parseJson(
    """{
      "input_spec": {"csv": {"header": true, "multiline": false}, "allow_schema_change": "permissive"},
      "transform_spec": {
        "date": [{"field": "shipdate", "format": "yyyy-MM-dd"}],
        "changetype": {"extendedprice": "decimal(18,2)", "quantity": "decimal(18,2)"},
        "filterrows": [{"condition": "quantity IS NOT NULL"}],
        "literal": {"source_system": "bench"}
      }
    }""")

  private val mapping = Specs.mappingCsv(
    "SourceName,DestName\nOrderKey,orderkey\nLineNumber,linenumber\nQuantity,quantity\n" +
      "ExtendedPrice,extendedprice\nShipDate,shipdate\nReturnFlag,returnflag\n")

  private val dq = Specs.dqRules(Specs.parseJson(
    """{"after_transform": {
         "quarantine_rules": ["ColumnValues 'extendedprice' >= 2000"],
         "halt_rules": ["(ColumnExists 'orderkey') and (IsComplete 'orderkey')"]}}"""))

  /** Driver-written lookup-store fixture (S9/S10): a value-lookup JSON map and
    * a multi-lookup parquet derived from the nation table — tiny config-like
    * artifacts, written once per sf dir. */
  private def ensureLookupDir(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths}
    val dir = s"/tmp/graft_lookup_store/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (!Files.exists(Paths.get(dir, ".done"))) {
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(dir, "mktseg.json"),
        """{"AUTOMOBILE": "AUTO", "BUILDING": "BLDG", "FURNITURE": "FURN",
           |"HOUSEHOLD": "HSLD", "MACHINERY": "MACH"}""".stripMargin)
      Tables(s, d, "nation")
        .select(col("n_nationkey").cast(StringType).as("lookup_item"),
          col("n_name").as("nation_name"),
          col("n_regionkey").cast(LongType).as("region_key"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/multi_nations.parquet")
      Files.writeString(Paths.get(dir, ".done"), "ok")
    }
    dir
  }

  /** Staged event stream for the q77/q78 streaming-operator oracles: events
    * with ts truncated to MILLISECONDS (java.sql.Timestamp.getTime is
    * ms-granular — truncating on BOTH sides keeps gap/duration arithmetic
    * exact vs DuckDB's `date_trunc('milliseconds', ts)`), sorted by ts into a
    * single file (one file → one AvailableNow micro-batch → deterministic
    * in-batch processing order), plus one `__sentinel` event per user past
    * every real ts + session gap so trailing sessions provably close inside
    * the drain. Verification staging only — production streams are unbounded
    * and never need a closing sentinel. */
  private def ensureEventStream(s: SparkSession, d: String): String = {
    val dir = s"/tmp/graft_stream_sessions/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      val real = Tables(s, d, "events")
        .select(col("user_id").cast(LongType).as("user_id"),
          expr("timestamp_millis(unix_micros(cast(ts as timestamp)) div 1000)").as("ts"),
          col("event_type"), col("value").cast(DoubleType).as("value"))
      val mx = real.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(mx.getTime + 1800000L + 3600000L)
      val sentinels = real.select(col("user_id")).distinct()
        .withColumn("ts", lit(sentinelTs))
        .withColumn("event_type", lit("__sentinel"))
        .withColumn("value", lit(0.0))
      real.unionByName(sentinels).orderBy(col("ts")).coalesce(1)
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** q110's staged event stream: event ids + microsecond instant timestamps
    * (the sessions staging truncates to ms and drops event_id). */
  private def ensureEventJoinStream(s: SparkSession, d: String): String = {
    val dir = s"/tmp/graft_stream_join/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      Tables(s, d, "events")
        .select(col("event_id").cast(LongType).as("event_id"),
          col("user_id").cast(LongType).as("user_id"),
          col("ts").cast(TimestampType).as("ts"), col("event_type"))
        .orderBy(col("ts")).coalesce(1)
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** q140's staged stream: the join feed PLUS one far-future `__sentinel`
    * row — outer-join NULL emission fires only when the watermark passes
    * `left_ts + within + delay`, and a bounded drain's watermark stops at
    * the last real event without it. The sentinel never matches (its ts is
    * outside every interval) and is filtered from the OUTPUT post-join,
    * but it DOES pass both sides' pre-join watermark operators. Emission
    * then needs the post-watermark no-data batch — see
    * StreamingOps.drainToMemoryProcessAll. */
  private def ensureEventOuterJoinStream(s: SparkSession, d: String): String = {
    val dir = s"/tmp/graft_stream_ojoin/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      val real = Tables(s, d, "events")
        .select(col("event_id").cast(LongType).as("event_id"),
          col("user_id").cast(LongType).as("user_id"),
          col("ts").cast(TimestampType).as("ts"), col("event_type"))
      val mx = real.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
          lit(new java.sql.Timestamp(mx.getTime + 40L * 86400000L)).as("ts"),
          lit("__sentinel").as("event_type"))
      real.unionByName(sentinel).orderBy(col("ts")).coalesce(1)
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** Stage every driver-independent fixture (CSV feed, event stream, format
    * files, lookup store) for a sf dir. Bench calls this in its UNTIMED
    * warm-up so per-query timings measure operators, not one-time fixture
    * writes; queries still self-stage when run standalone. */
  private[graft] def stageFixtures(s: SparkSession, d: String): Unit = {
    ensureCsv(s, d)
    ensureEventStream(s, d)
    ensureFormats(s, d)
    ensureLookupDir(s, d)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C7 filename + S9/S10 directory-backed lookup store, all driven through
    // the config-dispatched transform registry exactly as a dataset spec
    // would: feed date parsed from the incoming file name, a value lookup
    // recoding mktsegment, and a multilookup appending nation attributes.
    "q66_filename_lookup_store" -> ((s, d) => {
      import graft.stores.LookupStore
      val dir = ensureLookupDir(s, d)
      val spec = Specs.datasetSpec(Specs.parseJson(
        """{"transform_spec": {
          "filename": [{"field": "feed_date", "pattern": "customer_(\\d{8})\\.csv", "required": true}],
          "lookup": [{"field": "segment_code", "source": "c_mktsegment",
                      "lookup": "mktseg", "nomatch": "OTHER"}],
          "multilookup": [{"lookup_group": "nations", "match_columns": ["c_nationkey"],
                           "return_attributes": ["nation_name", "region_key"]}]
        }}"""))
      val ctx = TransformContext(s, filename = "customer_20260812.csv",
        lookupStore = LookupStore.fromDirectory(dir))
      val transformed = graft.transforms.TransformRegistry.applyAll(
        Tables(s, d, "customer"), spec.transformSpec, ctx)
      transformed.select(
          col("c_custkey").cast(LongType).as("custkey"),
          col("segment_code"), col("feed_date"),
          col("nation_name"), col("region_key"))
        .orderBy(col("custkey"))
    }),

    // K9 DDL passthrough → local views: cleanse-to-consume publishes a
    // consume table AND runs the passthrough view DDL; the query returns a
    // read of the CREATED VIEW, proving the round-trip the reference drives
    // through Athena (dataquery.py:7-117).
    "q67_view_passthrough" -> ((s, d) => {
      val db = s"graftviews${math.abs(d.hashCode)}"
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      if (!s.catalog.tableExists(s"$db.orders"))
        Tables(s, d, "orders").write.mode("overwrite").saveAsTable(s"$db.orders")
      val sql = s"""
        SELECT o_orderkey, o_totalprice FROM $db.orders
        WHERE o_totalprice > {cutoff} ORDER BY o_orderkey"""
      val args = JobArgs("Bench", "orders_big", "", "bench-exec",
        Map.empty, db, environment = "Dev")
      new PipelineRunner(s).cleanseToConsume(args, sql, Map("cutoff" -> "250000"),
        Map.empty,
        viewSql = Seq(s"""CREATE OR REPLACE VIEW ${db}_consume.orders_big_v AS
          SELECT o_orderkey, CASE WHEN o_totalprice > 350000 THEN 'xl' ELSE 'l' END AS band,
                 o_totalprice
          FROM ${db}_consume.orders_big"""))
      s.table(s"${db}_consume.orders_big_v").orderBy(col("o_orderkey"))
    }),

    // Bucketed co-located join: orders and lineitem bucketed on the join key
    // with the same bucket count, then joined + aggregated WITHOUT a shuffle
    // on either fact side (BucketingSpec asserts the no-Exchange plan; this
    // row proves the VALUES match the plain-join oracle).
    "q73_bucketed_join" -> ((s, d) => {
      val db = s"graftbkt${math.abs(d.hashCode)}"
      // guard on BOTH tables: a crash between the two writes must not leave
      // the fixture half-created forever
      if (!s.catalog.tableExists(s"$db.orders_b") ||
          !s.catalog.tableExists(s"$db.lineitem_b")) {
        graft.catalog.CatalogOps.writeBucketed(
          Tables(s, d, "orders").select(col("o_orderkey"), col("o_totalprice")),
          s"$db.orders_b", Seq("o_orderkey"), 8, Seq("o_orderkey"))
        graft.catalog.CatalogOps.writeBucketed(
          Tables(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity")),
          s"$db.lineitem_b", Seq("l_orderkey"), 8, Seq("l_orderkey"))
      }
      s.table(s"$db.orders_b")
        .join(s.table(s"$db.lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
        .orderBy(col("o_orderkey"))
    }),

    // S3 Excel source: nation re-materialized as a real .xlsx workbook
    // (driver-written fixture, like the other single-file format fixtures)
    // and read back through the Sources dispatcher via the minimal native
    // XLSX reader — numeric cells and shared-string cells both exercised,
    // verified against the parquet nation table.
    "q72_excel_source" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      val dir = s"/tmp/graft_xlsx_src/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      val f = Paths.get(dir, "nation.xlsx")
      if (!Files.exists(f)) {
        Files.createDirectories(Paths.get(dir))
        val rows = Tables(s, d, "nation")
          .select(col("n_nationkey").cast(LongType), col("n_regionkey").cast(LongType), col("n_name"))
          .orderBy(col("n_nationkey")).collect()
        // write-then-atomic-move: a crash mid-write must not leave a corrupt
        // zip behind the Files.exists guard forever; per-process tmp name +
        // tolerated move loss so two racing JVMs can't interleave writes or
        // throw when the other wins (fixtures are byte-identical)
        val tmp = Paths.get(dir,
          s"nation.xlsx.${ProcessHandle.current.pid}-${System.nanoTime()}.tmp")
        graft.sources.ExcelSource.write(tmp.toString,
          Seq(Seq("nationkey", "regionkey", "name")) ++ rows.map(r =>
            Seq(r.getLong(0).toString, r.getLong(1).toString, r.getString(2))))
        try Files.move(tmp, f, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) }
      }
      graft.sources.Sources.read(s, f.toString, Some(Specs.parseJson("""{"excel": {}}""")))
        .select(col("nationkey").cast(LongType).as("nationkey"),
          col("regionkey").cast(LongType).as("regionkey"), col("name"))
        .orderBy(col("nationkey"))
    }),

    // S3 + workbookPassword (etl_collect_to_cleanse.py:171-185): the same
    // nation workbook, agile-encrypted (ECMA-376 AES-256-CBC/SHA-512 via
    // OoxmlCrypto, JDK crypto only) and read back through the dispatcher
    // with the spec's `password` field — exercising the CFB container
    // parse, spin-count key derivation, verifier check, HMAC integrity
    // check, and segment decryption end-to-end against the parquet oracle.
    "q98_excel_encrypted" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      val dir = s"/tmp/graft_xlsx_enc/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      val f = Paths.get(dir, "nation_enc.xlsx")
      if (!Files.exists(f)) {
        Files.createDirectories(Paths.get(dir))
        val rows = Tables(s, d, "nation")
          .select(col("n_nationkey").cast(LongType), col("n_regionkey").cast(LongType), col("n_name"))
          .orderBy(col("n_nationkey")).collect()
        // per-process tmp names + tolerated move loss: two JVMs racing the
        // !exists check must not interleave writes into a shared tmp or
        // throw when the other one wins the ATOMIC_MOVE (both produce
        // byte-identical fixtures — seed-pinned encrypt)
        val uniq = s"${ProcessHandle.current.pid}-${System.nanoTime()}"
        val plain = Paths.get(dir, s"nation_plain.$uniq.tmp")
        graft.sources.ExcelSource.write(plain.toString,
          Seq(Seq("nationkey", "regionkey", "name")) ++ rows.map(r =>
            Seq(r.getLong(0).toString, r.getLong(1).toString, r.getString(2))))
        val enc = graft.sources.OoxmlCrypto.encrypt(Files.readAllBytes(plain),
          "gr@ft-s3cret", spinCount = 10000, seed = 42L)
        Files.delete(plain)
        val tmp = Paths.get(dir, s"nation_enc.xlsx.$uniq.tmp")
        Files.write(tmp, enc)
        try Files.move(tmp, f, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) }
      }
      graft.sources.Sources.read(s, f.toString,
          Some(Specs.parseJson("""{"excel": {"password": "gr@ft-s3cret"}}""")))
        .select(col("nationkey").cast(LongType).as("nationkey"),
          col("regionkey").cast(LongType).as("regionkey"), col("name"))
        .orderBy(col("nationkey"))
    }),

    // S3 + data_address: the table sits at C3:E28 of a sheet with a title
    // row, margin notes, and a TOTAL footer — the range (with a quoted sheet
    // prefix and a sheet_names try-list) must crop all of it away
    // (etl_collect_to_cleanse.py:165-175).
    "q76_excel_range" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      val dir = s"/tmp/graft_xlsx_rng/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      val f = Paths.get(dir, "report.xlsx")
      if (!Files.exists(f)) {
        Files.createDirectories(Paths.get(dir))
        val rows = Tables(s, d, "nation")
          .select(col("n_nationkey").cast(LongType), col("n_regionkey").cast(LongType), col("n_name"))
          .orderBy(col("n_nationkey")).collect()
        val pad2 = Seq(null, null): Seq[String]
        val grid =
          Seq(Seq("NATION EXTRACT — INTERNAL"), Seq.empty[String],
            pad2 ++ Seq("nationkey", "regionkey", "name")) ++
          rows.map(r => pad2 ++ Seq(r.getLong(0).toString, r.getLong(1).toString, r.getString(2))) ++
          Seq(pad2 ++ Seq("TOTAL", rows.length.toString, null))
        val tmp = Paths.get(dir, "report.xlsx.tmp")
        graft.sources.ExcelSource.write(tmp.toString, grid, sheetName = "Q1 Data")
        Files.move(tmp, f, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      graft.sources.Sources.read(s, f.toString, Some(Specs.parseJson(
          s"""{"excel": {"sheet_names": ["Summary", "Q1 Data"],
                         "data_address": "'Q1 Data'!C3:E${3 + 25}"}}""")))
        .select(col("nationkey").cast(LongType).as("nationkey"),
          col("regionkey").cast(LongType).as("regionkey"), col("name"))
        .orderBy(col("nationkey"))
    }),

    // A3 count/isEmpty control flow (etl_collect_to_cleanse.py:249-250): the
    // pipeline must ABORT on an empty source file and PROCEED on a non-empty
    // one. Both decisions are exercised through the real collectToCleanse
    // path and returned as rows the oracle pins: (scenario, proceeded,
    // out_rows). The gate is isEmpty — O(first non-empty partition), not a
    // full count — so the decision itself is O(1) at 100 TB.
    "q75_empty_gate" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      val base = s"/tmp/graft_emptygate/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      val srcDir = Paths.get(base, "src")
      if (!Files.exists(srcDir.resolve("feed.csv"))) {
        Files.createDirectories(srcDir)
        Files.writeString(srcDir.resolve("empty.csv"), "RegionKey,RegionName\n")
        val rows = Tables(s, d, "region")
          .select(col("r_regionkey").cast(LongType), col("r_name"))
          .orderBy(col("r_regionkey")).collect()
        Files.writeString(srcDir.resolve("feed.csv"),
          "RegionKey,RegionName\n" + rows.map(r =>
            s"${r.getLong(0)},${r.getString(1)}").mkString("\n") + "\n")
      }
      val db = s"graftgate${math.abs(d.hashCode)}"
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      val spec = Specs.datasetSpec(
        Specs.parseJson("""{"input_spec": {"csv": {"header": true}}}"""))
      def attempt(file: String): (Boolean, Long) =
        try {
          val out = new PipelineRunner(s).collectToCleanse(
            JobArgs("Bench", "gate", s"$srcDir/$file", s"gate-$file",
              Map("year" -> "2026"), db, environment = "Dev"),
            spec, Seq.empty, Map.empty, TransformContext(s, filename = file))
          (true, out.count())
        } catch {
          case e: RuntimeException if e.getMessage.contains("No data found") =>
            (false, 0L)
        }
      val (pEmpty, nEmpty) = attempt("empty.csv")
      val (pFeed, nFeed) = attempt("feed.csv")
      import s.implicits._
      Seq(("empty", pEmpty, nEmpty), ("nonempty", pFeed, nFeed))
        .toDF("scenario", "proceeded", "out_rows")
        .orderBy(col("scenario"))
    }),

    // §1.4 dependency gate (lambda_handler.py:157-178): queue / release /
    // lookback-expiry decisions materialized as rows. The audit log is built
    // from the events table (latest SUCCEEDED run per event_type = its max
    // ts); "now" is the corpus max ts + 1h, so every decision is a
    // deterministic function of the data, which the oracle recomputes with
    // interval arithmetic. A later FAILED run is planted to prove only
    // SUCCEEDED rows gate.
    "q88_dependency_gate" -> ((s, d) => {
      import graft.pipeline.DependencyGate
      import graft.pipeline.DependencyGate.JobRun
      import s.implicits._
      val maxPerType = Tables(s, d, "events")
        .groupBy(col("event_type")).agg(max(col("ts")).as("mx"))
        .collect().map { r =>
          val inst = r.get(1) match { // ts may be TIMESTAMP or TIMESTAMP_NTZ
            case t: java.sql.Timestamp => t.toInstant
            case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC)
          }
          r.getString(0) -> inst
        }.toMap
      val now = maxPerType.values.maxBy(_.toEpochMilli)
        .plus(java.time.Duration.ofHours(1))
      val audit = new DependencyGate.AuditLog
      maxPerType.foreach { case (k, t) => audit.record(JobRun(k, "e1", "SUCCEEDED", t)) }
      audit.record(JobRun(maxPerType.keys.min, "e2", "FAILED", now))
      def spec(json: String) = DependencyGate.parseSpec(Specs.parseJson(json))
      val types = maxPerType.keys.toSeq.sorted
      val perType = types.map { t =>
        (s"tight_$t", DependencyGate.mustQueue(
          spec(s"""{"depends_on": {"$t": 1}, "lookback": {"hours": 2}}"""), audit, now))
      } ++ types.map { t =>
        // lookback == now-offset: only the type(s) holding the global max ts
        // are still fresh — every other dependency has EXPIRED
        (s"expiry_$t", DependencyGate.mustQueue(
          spec(s"""{"depends_on": {"$t": 1}, "lookback": {"hours": 1}}"""), audit, now))
      }
      val allDeps = types.map(t => s""""$t": 1""").mkString(", ")
      val fixed = Seq(
        ("no_deps", DependencyGate.mustQueue(spec("{}"), audit, now)),
        ("all_wide", DependencyGate.mustQueue(
          spec(s"""{"depends_on": {$allDeps}, "lookback": {"days": 3650}}"""), audit, now)),
        ("missing_dep", DependencyGate.mustQueue(
          spec("""{"depends_on": {"never_ran": 1}, "lookback": {"days": 3650}}"""), audit, now)),
        ("no_lookback", DependencyGate.mustQueue(
          spec(s"""{"depends_on": {$allDeps}}"""), audit, now)))
      // release: the queued dependent is re-evaluated once its source reports
      val relSpec = spec("""{"depends_on": {"late_src": 1}, "lookback": {"hours": 2}}""")
      val before = DependencyGate.mustQueue(relSpec, audit, now)
      audit.record(JobRun("late_src", "e3", "SUCCEEDED", now))
      val after = DependencyGate.mustQueue(relSpec, audit, now)
      (fixed ++ perType ++ Seq(("release_before", before), ("release_after", after)))
        .toDF("scenario", "queued").orderBy(col("scenario"))
    }),

    // K10: a dataset arriving with NO mapping/transform config makes the
    // pipeline write the recommended config files (clean-names mapping CSV +
    // transform-spec skeleton) next to the job — this query runs that path on
    // a messy-header feed and returns the PARSED generated artifacts, so the
    // oracle pins their exact content.
    "q70_generated_specs" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      val base = s"/tmp/graft_genspec/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      val srcDir = Paths.get(base, "src")
      if (!Files.exists(srcDir.resolve("feed.csv"))) {
        Files.createDirectories(srcDir)
        val rows = Tables(s, d, "region")
          .select(col("r_regionkey").cast(LongType), col("r_name"))
          .orderBy(col("r_regionkey")).collect()
        Files.writeString(srcDir.resolve("feed.csv"),
          "Region Key,Region.Name,Created Date,Acct Bal\n" + rows.map(r =>
            s"${r.getLong(0)},${r.getString(1)},01/1${r.getLong(0)}/24,${r.getLong(0)}00.25")
            .mkString("\n") + "\n")
      }
      val outDir = Paths.get(base, "generated")
      wipeDir(outDir)
      Files.createDirectories(outDir)
      val db = s"graftgen${math.abs(d.hashCode)}"
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      val args = JobArgs("Bench", "genspec", s"$srcDir/feed.csv", "gen-exec",
        Map("year" -> "2026"), db, environment = "Dev", specOutDir = Some(outDir.toString))
      new PipelineRunner(s).collectToCleanse(args,
        Specs.datasetSpec(Specs.parseJson("""{"input_spec": {"csv": {"header": true}}}""")),
        Seq.empty, Map.empty, TransformContext(s, filename = "feed.csv"))
      val mappingRows = s.read.option("header", "true")
        .csv(s"$outDir/genspec.csv")
        .select(lit("mapping").as("kind"), col("SourceName").as("name"),
          col("DestName").as("value"))
      val gen = Specs.parseJson(Files.readString(outDir.resolve("genspec.json")))
      val t = gen.get("transform_spec")
      import scala.jdk.CollectionConverters._
      val dates = t.get("date").elements().asScala.map(n =>
        ("date", n.get("field").asText, n.get("format").asText)).toSeq
      val cts = t.get("changetype").properties().asScala.map(e =>
        ("changetype", e.getKey, e.getValue.asText)).toSeq
      import s.implicits._
      val specRows = (dates ++ cts).toDF("kind", "name", "value")
      mappingRows.unionByName(specRows).orderBy(col("kind"), col("name"))
    }),

    // §1.4 watermarked tumbling-window aggregation driven as a REAL stream:
    // events staged to plain parquet (the nanos-typed original needs a
    // session conf streams can't set per-read), readStream + window + drain
    // to a memory sink in Complete mode — must equal the batch hourly
    // aggregation (q17 semantics; DECIMAL sums keep the compare exact).
    // Conversion gaps (Analytics.conversionGaps): seconds from first signup
    // to first subsequent purchase per user — the funnel's latency readout.
    // Oracle replays the strict frontier + integer-second gap.
    // Small-file compaction (Compaction.compactTable, the OPTIMIZE verb):
    // orders re-materialized as a deliberately fragmented partitioned table
    // (12 writers x 3 status partitions), compacted to target size, read
    // back. The oracle is the source table itself — compaction must be
    // CONTENT-INVARIANT through the full write→compact→read cycle; the
    // in-query requires make a silent no-op or a file-count regression an
    // oracle error rather than a quiet pass.
    "q158_compaction" -> ((s, d) => {
      val t = s"graftcompact${math.abs(d.hashCode)}.orders_frag"
      s.sql(s"CREATE DATABASE IF NOT EXISTS ${t.split('.').head}")
      s.sql(s"DROP TABLE IF EXISTS $t")
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderstatus"))
        .repartition(12)
        .write.partitionBy("o_orderstatus").saveAsTable(t)
      val report = graft.catalog.Compaction.compactTable(s, t, targetBytes = 128L << 20)
      require(report.filesAfter < report.filesBefore,
        s"compaction must reduce files: $report")
      require(report.partitionsCompacted == report.partitionsSeen,
        s"all fragmented partitions must be selected: $report")
      s.table(t)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    "q156_conversion_gap" -> ((s, d) => {
      graft.operators.Analytics.conversionGaps(Tables(s, d, "events"),
          "user_id", "ts", "event_type", "event_id", "signup", "purchase")
        .orderBy(col("user_id"))
    }),

    // Hourly rate-anomaly detection: per event_type, hours whose event count
    // sits ≥ 2σ from that type's hourly mean — pipeline monitoring from two
    // bounded aggregations (hour counts → per-type integer moments), no
    // window. z is ONE float formula over exact integer sums, rounded.
    "q155_rate_anomaly" -> ((s, d) => {
      val hours = Tables(s, d, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
      val m = hours.groupBy(col("event_type")).agg(
        count(lit(1)).as("nh"), sum(col("n")).as("sn"),
        sum(col("n") * col("n")).as("snn"))
      // z = (n - mean)/std with mean = sn/nh, var = (nh·snn - sn²)/nh² —
      // cross-multiplied so every operand stays an exact integer until the
      // one division: z = (n·nh - sn) / sqrt(nh·snn - sn²)
      val num = (col("n") * col("nh") - col("sn")).cast("double")
      val den = sqrt((col("nh") * col("snn") - col("sn") * col("sn")).cast("double"))
      hours.join(m, Seq("event_type"))
        .withColumn("z_r", round(when(den > 0.0, num / den).otherwise(lit(0.0)), 6))
        .filter(abs(col("z_r")) >= 2.0)
        .select(col("event_type"), col("hour"), col("n"), col("z_r"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // SCD Type-2 history (SnapshotDiff.scd2): per-user event_type history
    // with consecutive-duplicate collapse and [from, to) intervals — the
    // policy-history shape. One per-key window; the oracle replays
    // lag-filter + lead-close.
    "q151_scd2" -> ((s, d) => {
      graft.operators.SnapshotDiff.scd2(Tables(s, d, "events"),
          "user_id", "ts", "event_type", "event_id")
        .orderBy(col("user_id"), col("valid_from"))
    }),

    // Column profiler (Analytics.profile): per-column null/distinct/min/max
    // in ONE scan — the ANALYZE TABLE readout. Oracle: plain aggregates.
    "q148_profile" -> ((s, d) => {
      graft.operators.Analytics.profile(
          Tables(s, d, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"))
        .orderBy(col("column"))
    }),

    // Sketch-mode profiler (Analytics.profileSketch): q148's shape with
    // n_distinct from the HLL register aggregate — the bounded-shuffle
    // profile a 100 TB-wide table needs. Oracle replays the registers and
    // the estimator arithmetic symbol-for-symbol (q128's regime), covering
    // BOTH estimator branches: o_orderstatus (3 distinct → linear counting)
    // and o_orderkey/o_custkey (thousands → raw harmonic mean).
    "q159_profile_sketch" -> ((s, d) => {
      graft.operators.Analytics.profileSketch(
          Tables(s, d, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus"), p = 8)
        .orderBy(col("column"))
    }),

    // Funnel analysis (Analytics.funnel): signup → click → purchase with
    // strict (ts, event_id) ordering — per-step min-frontier joins, no
    // full-history window. Oracle replays each frontier with row_number.
    "q149_funnel" -> ((s, d) => {
      graft.operators.Analytics.funnel(Tables(s, d, "events"),
          "user_id", "ts", "event_type", "event_id",
          Seq("signup", "click", "purchase"))
        .orderBy(col("step"))
    }),

    // Retention cohorts (Analytics.retentionCohorts): weekly cohorts over
    // the events table, integer-div period bucketing. Oracle: the same
    // distinct-activity + first-period join.
    "q150_retention" -> ((s, d) => {
      graft.operators.Analytics.retentionCohorts(Tables(s, d, "events"),
          "user_id", "ts", periodSeconds = 7L * 86400)
        .orderBy(col("cohort"), col("period_offset"))
    }),

    // Stream-stream LEFT OUTER interval join: every click, with its
    // within-1h purchases OR NULL-padded if none — the attribution-with-
    // negatives query the inner join (q110) can't answer. Unmatched rows
    // emit only when the watermark proves no match can arrive; the staged
    // sentinel advances it past every real click (see
    // ensureEventOuterJoinStream), and the oracle is the batch LEFT JOIN.
    "q140_stream_outer_join" -> ((s, d) => {
      import graft.streaming.StreamingOps
      val dir = ensureEventOuterJoinStream(s, d)
      val staged = s.read.parquet(dir)
      def side(t: String, idAs: String, tsAs: String, typeAs: String) =
        s.readStream.schema(staged.schema).parquet(dir)
          .filter(col("event_type").isin(t, "__sentinel"))
          .select(col("user_id"), col("event_id").as(idAs),
            col("ts").as(tsAs), col("event_type").as(typeAs))
      val joined = StreamingOps.intervalJoin(
        side("click", "click_id", "click_ts", "click_type"),
        side("purchase", "purchase_id", "purchase_ts", "purchase_type"),
        "user_id", "click_ts", "purchase_ts",
        withinSecs = 3600L, watermark = "30 days", joinType = "left_outer")
      // sentinel rows are excluded AFTER the drain, not in the stream: a
      // pre-sink filter on click_type gets PUSHED BELOW the left side's
      // EventTimeWatermark operator (it doesn't reference the time column),
      // silently removing the sentinel before the watermark tracker sees it
      // — the watermark then never passes the clicks' match bound and zero
      // NULL rows emit (measured). The drained memory table is batch, where
      // the filter is safe. The sentinel's own left row stays in state
      // (watermark never reaches sentinel+within) and is filtered here as
      // defense in depth.
      val out = joined.select(col("user_id"), col("click_id"), col("click_type"),
        col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .cast(LongType).as("gap_secs"))
      StreamingOps.drainToMemoryProcessAll(out, s"q140oj_${math.abs(d.hashCode)}")
        .filter(col("click_type") === "click").drop("click_type")
        .orderBy(col("click_id"), col("purchase_id"))
    }),

    // Streaming CDC upsert: each micro-batch merges into a keyed managed
    // table through the TableFormat seam (HiveParquetFormat.mergeUpsert) —
    // the K5 MERGE path driven by a REAL stream. The merge is LATE-DATA-SAFE
    // (order-independent): per batch, the winner per key is the max-(ts,
    // event_id) row over {current table row} ∪ {batch rows}, so whatever
    // order the files arrive in (maxFilesPerTrigger=1 forces many batches),
    // the final table is the global argmax per key — which IS the oracle.
    "q138_streaming_upsert" -> ((s, d) => {
      import graft.catalog.HiveParquetFormat
      import org.apache.spark.sql.expressions.Window
      val dir = s"/tmp/graft_stream_events/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Tables(s, d, "events").select(col("event_id"), col("event_type"), col("ts"), col("value"))
          .write.mode("overwrite").parquet(dir)
      val staged = s.read.parquet(dir)
      val db = s"graftsu${math.abs(d.hashCode)}"
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      s.sql(s"DROP TABLE IF EXISTS $db.latest")
      def keyed(df: DataFrame) = df.select(
        pmod(col("event_id"), lit(50)).as("k"), col("event_id"),
        col("event_type"), col("ts"), col("value"))
      keyed(staged).limit(0).write.format("parquet").saveAsTable(s"$db.latest")
      val stream = s.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession
        ss.sql(s"REFRESH TABLE $db.latest")
        val b = keyed(batch)
        // only the touched keys' current rows join the contest — the merge
        // reads (batch keys × 1 row), never the whole table
        val cur = ss.table(s"$db.latest")
          .join(b.select("k").distinct(), Seq("k"), "left_semi")
        val merged = cur.unionByName(b)
          .withColumn("__r", row_number().over(Window.partitionBy(col("k"))
            .orderBy(col("ts").desc, col("event_id").desc)))
          .filter(col("__r") === 1).drop("__r")
        HiveParquetFormat.mergeUpsert(ss, s"$db.latest", merged, "k")
        ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.sql(s"REFRESH TABLE $db.latest")
      s.table(s"$db.latest")
        .select(col("k"), col("event_id"), col("event_type"), col("ts"), col("value"))
        .orderBy(col("k"))
    }),

    // Streaming HLL: distinct-user estimates per (day, event_type) with the
    // mergeable hll_sketch aggregate INSIDE a streaming window aggregation —
    // per-group state is the fixed 2^p register array (256 ints at p=8)
    // however long the stream runs: the streaming corpus-stats contract
    // (an exact streaming distinct would grow state per user). Register
    // maxima are batch-order-independent, so the drained result replays
    // exactly in SQL (q128's estimator arithmetic, including the
    // linear-counting branch these small groups take).
    // Streaming quantiles: the KLL sketch INSIDE a streaming window
    // aggregation — per-(day, event_type) value quantiles with O(k·log)
    // state per group however long the stream runs (an exact streaming
    // quantile would buffer every value). These groups stay under k=2048,
    // so the sketch operates in its EXACT regime and the drained result is
    // the exact order statistic the oracle replays (q160's arithmetic per
    // streaming group); beyond k the same query degrades gracefully to the
    // ε·n rank-error contract (KllSketchSpec).
    "q162_streaming_kll" -> ((s, d) => {
      import graft.functions.expressions.{SketchAggregates => SK}
      val dir = s"/tmp/graft_stream_events/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Tables(s, d, "events").select(col("event_id"), col("event_type"), col("ts"), col("value"))
          .write.mode("overwrite").parquet(dir)
      val staged = s.read.parquet(dir)
      val stream = s.readStream.schema(staged.schema).parquet(dir)
        .withColumn("ts", col("ts").cast(TimestampType))
      val sk = stream
        .withWatermark("ts", "90 days")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(SK.kll_sketch(col("value"), 2048).as("sk"))
      val drained = graft.streaming.StreamingOps.drainToMemory(sk,
        s"q162k_${math.abs(d.hashCode)}",
        org.apache.spark.sql.streaming.OutputMode.Complete)
      drained.select(col("w.start").as("day"), col("event_type"),
          size(col("sk")).cast(LongType).as("n"),
          SK.kll_quantile(col("sk"), 0.5).as("p50"),
          SK.kll_quantile(col("sk"), 0.95).as("p95"))
        .orderBy(col("day"), col("event_type"))
    }),

    "q136_streaming_hll" -> ((s, d) => {
      import graft.functions.expressions.{SketchAggregates => SK}
      val dir = s"/tmp/graft_stream_events/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Tables(s, d, "events").select(col("event_id"), col("event_type"), col("ts"), col("value"))
          .write.mode("overwrite").parquet(dir)
      val staged = s.read.parquet(dir)
      // rebuild the (event_id -> user_id) mapping the staged feed drops:
      // the stage writes only q71's column set, and user_id is recoverable
      // from events by key — a broadcast-joined static enrich, which is
      // itself the stream-static pattern under test in q93
      val users = Tables(s, d, "events").select(col("event_id"), col("user_id"))
      val stream = s.readStream.schema(staged.schema).parquet(dir)
        .withColumn("ts", col("ts").cast(TimestampType))
        .join(broadcast(users), Seq("event_id"))
      val sk = stream
        .withWatermark("ts", "90 days")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(SK.hll_sketch(col("user_id").cast(StringType), 8).as("regs"))
      val drained = graft.streaming.StreamingOps.drainToMemory(sk,
        s"q136h_${math.abs(d.hashCode)}",
        org.apache.spark.sql.streaming.OutputMode.Complete)
      drained.select(col("w.start").as("day"), col("event_type"),
          size(filter(col("regs"), r => r =!= 0)).cast(LongType).as("nonzero"),
          aggregate(col("regs"), lit(0L),
            (acc, r) => acc + pow(lit(2.0), lit(53) - r).cast("long")).as("s_num"),
          round(SK.hll_estimate(col("regs"), 8), 4).as("est_r"))
        .orderBy(col("day"), col("event_type"))
    }),

    "q71_streaming_windows" -> ((s, d) => {
      import graft.streaming.StreamingOps
      val dir = s"/tmp/graft_stream_events/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        Tables(s, d, "events").select(col("event_id"), col("event_type"), col("ts"), col("value"))
          .write.mode("overwrite").parquet(dir)
      val staged = s.read.parquet(dir)
      val stream = s.readStream.schema(staged.schema).parquet(dir)
        // parquet round-trips the column as TIMESTAMP_NTZ; watermarks demand
        // the instant-typed TIMESTAMP (session tz is pinned UTC, so no shift)
        .withColumn("ts", col("ts").cast(TimestampType))
        .withColumn("value", col("value").cast(DecimalType(18, 2)))
      val counts = StreamingOps.windowedCounts(stream)
      val drained = StreamingOps.drainToMemory(counts,
        s"q71w_${math.abs(d.hashCode)}",
        org.apache.spark.sql.streaming.OutputMode.Complete)
      drained.select(col("window_start").as("hour"), col("event_type"),
          col("n"), col("sum_value").cast(DoubleType).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // §1.4 bounded-state streaming dedup driven as a REAL stream:
    // readStream → withWatermark → dropDuplicatesWithinWatermark on
    // (user_id, event_type) → drain. The staged span (~30 days) sits inside
    // the 90-day watermark delay, so no per-key state expires mid-drain and
    // the drained keys equal the batch DISTINCT — which IS the DuckDB oracle.
    // (Shorter delays drop only within-watermark repeats and expire state
    // with the watermark — the bounded-state contract on an unbounded
    // stream; that shape is exercised in StreamingSpec.)
    "q77_streaming_dedup" -> ((s, d) => {
      import graft.streaming.StreamingOps
      val dir = ensureEventStream(s, d)
      val staged = s.read.parquet(dir)
      val stream = s.readStream.schema(staged.schema).parquet(dir)
        .filter(col("event_type") =!= "__sentinel")
      val deduped = StreamingOps.streamingDedup(
        stream, Seq("user_id", "event_type"), tsCol = "ts", watermark = "90 days")
      StreamingOps.drainToMemory(deduped.select(col("user_id"), col("event_type")),
          s"q77d_${math.abs(d.hashCode)}")
        .orderBy(col("user_id"), col("event_type"))
    }),

    // §1.4 session windows via flatMapGroupsWithState (event-time timeout)
    // driven as a REAL stream. Sessions close in-batch when the gap to the
    // next event exceeds 30 min (sentinels close each user's trailing
    // session); sentinel-opened sessions never close and are never emitted.
    // total_value is deliberately NOT compared — double summation order is
    // engine-specific; counts and ms-exact durations are integers.
    "q78_streaming_sessions" -> ((s, d) => {
      import graft.streaming.StreamingOps
      import s.implicits._
      val dir = ensureEventStream(s, d)
      val staged = s.read.parquet(dir)
      val evs = s.readStream.schema(staged.schema).parquet(dir)
        .withWatermark("ts", "1 second")
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[StreamingOps.Event]
      val sessions = StreamingOps.sessionize(evs, gapMs = 1800000L)
      StreamingOps.drainToMemory(sessions.toDF(), s"q78s_${math.abs(d.hashCode)}")
        .select(col("user_id"), col("n_events"), col("duration_secs"))
        .orderBy(col("user_id"), col("n_events"), col("duration_secs"))
    }),

    // §1.4 stream-stream INTERVAL JOIN driven as a REAL two-stream join:
    // click events attribute purchases by the same user within 1 hour —
    // watermarks on both sides + the time-range predicate bound the join
    // state (the attribution shape on an unbounded stream). The 90-day
    // drain watermark exceeds the staged span, so no row is late-dropped
    // and the drained pairs equal the batch interval join — the oracle.
    "q110_stream_join" -> ((s, d) => {
      import graft.streaming.StreamingOps
      val dir = ensureEventJoinStream(s, d)
      val staged = s.read.parquet(dir)
      def side(t: String, idAs: String, tsAs: String) =
        s.readStream.schema(staged.schema).parquet(dir)
          .filter(col("event_type") === t)
          .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
      val joined = StreamingOps.intervalJoin(
        side("click", "click_id", "click_ts"),
        side("purchase", "purchase_id", "purchase_ts"),
        "user_id", "click_ts", "purchase_ts",
        withinSecs = 3600L, watermark = "90 days")
      val out = joined.select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .cast(LongType).as("gap_secs"))
      StreamingOps.drainToMemory(out, s"q110j_${math.abs(d.hashCode)}")
        .orderBy(col("click_id"), col("purchase_id"))
    }),

    // §1.4 streaming parity: the SAME cleanse logic (mapping → date/decimal
    // types → filterrows → literal) driven through readStream + foreachBatch
    // with Trigger.AvailableNow over the q37 CSV feed — the reference's
    // S3-event→Glue loop as one Structured Streaming drain. The published
    // parquet must equal the batch pipeline's semantics (same DuckDB oracle
    // shape as q37, minus the quarantine rule).
    "q68_streaming_ingest" -> ((s, d) => {
      import graft.streaming.StreamingOps
      val src = ensureCsv(s, d)
      // fixed per-sf sink + checkpoint, WIPED at query start: a clean drain
      // each run (exactly-once bookkeeping is the checkpoint's job in
      // production) without accumulating one lineitem copy per invocation
      val base = s"/tmp/graft_stream/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      def reset(sub: String): String = {
        val p = java.nio.file.Paths.get(base, sub)
        wipeDir(p)
        java.nio.file.Files.createDirectories(p)
        p.toString
      }
      val out = reset("out")
      val ckpt = reset("ckpt")
      val streamSpec = Specs.datasetSpec(Specs.parseJson(
        """{"transform_spec": {
            "date": [{"field": "shipdate", "format": "yyyy-MM-dd"}],
            "changetype": {"extendedprice": "decimal(18,2)", "quantity": "decimal(18,2)"},
            "filterrows": [{"condition": "quantity IS NOT NULL"}],
            "literal": {"source_system": "stream"}}}"""))
      val q = StreamingOps.fileArrivalPipeline(s, src, "csv",
        "OrderKey BIGINT, LineNumber BIGINT, Quantity DOUBLE, ExtendedPrice DOUBLE, " +
          "ShipDate STRING, ReturnFlag STRING",
        ckpt, Map("header" -> "true")) { (batch, _) =>
        // foreachBatch runs in a cloned session — everything references
        // batch.sparkSession, nothing the outer session
        val ctx = TransformContext(batch.sparkSession, filename = "lineitem.csv")
        val mapped = graft.mapping.CustomMapping.applyMapping(batch, mapping)
        val transformed = graft.transforms.TransformRegistry.applyAll(
          mapped, streamSpec.transformSpec, ctx)
        transformed.write.mode("append").parquet(out)
      }
      q.awaitTermination()
      s.read.parquet(out).select(
          col("orderkey").cast(LongType).as("orderkey"),
          col("linenumber").cast(LongType).as("linenumber"),
          col("quantity").cast(DoubleType).as("quantity"),
          col("extendedprice").cast(DoubleType).as("extendedprice"),
          col("shipdate"), col("returnflag"), col("source_system"))
        .orderBy(col("orderkey"), col("linenumber"))
    }),

    // Stream-static ENRICHMENT: each micro-batch of the CSV feed broadcast-
    // joins the static orders dimension (rebuilt from the batch's own cloned
    // session — foreachBatch contract) — the streaming analog of the cleanse
    // stage's lookup enrich. Oracle: the equivalent batch join.
    "q93_streaming_enrich" -> ((s, d) => {
      import graft.streaming.StreamingOps
      val src = ensureCsv(s, d)
      val base = s"/tmp/graft_stream_enrich/${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      def reset(sub: String): String = {
        val p = java.nio.file.Paths.get(base, sub)
        wipeDir(p)
        java.nio.file.Files.createDirectories(p)
        p.toString
      }
      val out = reset("out")
      val ckpt = reset("ckpt")
      val q = StreamingOps.fileArrivalPipeline(s, src, "csv",
        "OrderKey BIGINT, LineNumber BIGINT, Quantity DOUBLE, ExtendedPrice DOUBLE, " +
          "ShipDate STRING, ReturnFlag STRING",
        ckpt, Map("header" -> "true")) { (batch, _) =>
        val bs = batch.sparkSession
        val dim = Tables(bs, d, "orders").select(
          col("o_orderkey").cast(LongType).as("OrderKey"),
          col("o_orderstatus").as("orderstatus"),
          col("o_custkey").cast(LongType).as("custkey"))
        batch.join(broadcast(dim), Seq("OrderKey"), "left")
          .select(col("OrderKey").as("orderkey"), col("LineNumber").as("linenumber"),
            col("orderstatus"), col("custkey"))
          .write.mode("append").parquet(out)
      }
      q.awaitTermination()
      s.read.parquet(out).orderBy(col("orderkey"), col("linenumber"))
    }),

    "q37_pipeline_e2e" -> ((s, d) => {
      val src = ensureCsv(s, d)
      val args = JobArgs("Bench", "lineitem_cleansed", src, "bench-exec",
        Map("year" -> "2026", "month" -> "08", "day" -> "12"),
        s"graftbench${math.abs(d.hashCode)}", environment = "Dev")
      val out = new PipelineRunner(s).collectToCleanse(
        args, Specs.datasetSpec(specJson), mapping, dq, TransformContext(s, filename = "lineitem.csv"))
      out.select(
          col("orderkey").cast(LongType).as("orderkey"),
          col("linenumber").cast(LongType).as("linenumber"),
          col("quantity").cast(DoubleType).as("quantity"),
          col("extendedprice").cast(DoubleType).as("extendedprice"),
          col("shipdate"), col("returnflag"), col("source_system"), col("year"))
        .orderBy(col("orderkey"), col("linenumber"))
    }),

    "q40_consume_e2e" -> ((s, d) => consumeQuery(s, d)),

    // S2/S4/S5: fixed-width, JSONL, and XML scans through the Sources
    // dispatcher, all three verified against the parquet nation table.
    "q62_source_formats" -> ((s, d) => {
      import graft.sources.Sources
      val dir = ensureFormats(s, d)
      def longs(df: DataFrame) = df.select(
        col("nationkey").cast(LongType).as("nationkey"),
        col("regionkey").cast(LongType).as("regionkey"), col("name"))
      val j = longs(Sources.read(s, s"$dir/nation.jsonl", None))
        .withColumn("fmt", lit("json"))
      val x = longs(Sources.read(s, s"$dir/nation.xml",
          Some(Specs.parseJson("""{"xml": {"row_tag": "nation"}}"""))))
        .withColumn("fmt", lit("xml"))
      val f = longs(Sources.read(s, s"$dir/nation.dat",
          Some(Specs.parseJson("""{"fixed": {}}""")),
          Seq(Sources.FixedWidthField("nationkey", 6),
            Sources.FixedWidthField("regionkey", 6),
            Sources.FixedWidthField("name", 20))))
        .withColumn("fmt", lit("fixed"))
      val o = longs(Sources.read(s, s"$dir/nation_orc",
          Some(Specs.parseJson("""{"orc": {}}"""))))
        .withColumn("fmt", lit("orc"))
      val a = longs(Sources.read(s, s"$dir/nation_avro",
          Some(Specs.parseJson("""{"avro": {}}"""))))
        .withColumn("fmt", lit("avro"))
      j.unionByName(x).unionByName(f).unionByName(o).unionByName(a)
        .orderBy(col("fmt"), col("nationkey"))
    }),

    // K7 + K8: the DQ-results table written by PipelineRunner (one row per
    // rule outcome, metrics included) unioned with the lineage JSONL sink's
    // op sequence — both produced by one collect-to-cleanse run and both
    // fully oracle-checked.
    "q58_dq_lineage" -> ((s, d) => {
      val src = ensureCsv(s, d)
      val db = s"graftdq${math.abs(d.hashCode)}"
      val lineagePath = s"/tmp/graft_lineage_${math.abs(d.hashCode)}.jsonl"
      new java.io.File(lineagePath).delete() // fresh sink per run (JSONL appends)
      // the DQ-results table is append-only by contract — reset it too, or a
      // second invocation in one session would double the oracle's 4 rows
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      s.sql(s"DROP TABLE IF EXISTS $db.lineitem_dq_dq_results")
      val args = JobArgs("Bench", "lineitem_dq", src, "dq-exec",
        Map("year" -> "2026"), db, environment = "Dev", lineageSink = Some(lineagePath))
      val dq = Specs.dqRules(Specs.parseJson(
        """{"before_transform": {"warn_rules": ["Completeness 'quantity' >= 0.5",
               "ColumnValues 'returnflag' in ['A','N','R']"]},
            "after_transform": {"quarantine_rules": ["ColumnValues 'extendedprice' >= 2000"],
               "halt_rules": ["(ColumnExists 'orderkey') and (IsComplete 'orderkey')"]}}"""))
      new PipelineRunner(s).collectToCleanse(args, Specs.datasetSpec(specJson), mapping, dq,
        TransformContext(s, filename = "lineitem.csv"))
      val dqRows = s.table(s"$db.lineitem_dq_dq_results")
        .select(lit("dq").as("kind"), lit(0L).as("seq"),
          concat_ws("|", col("ruleset"), col("action"), col("rule")).as("name"),
          col("outcome"), round(col("metric"), 6).as("metric"))
      val lin = s.read.json(lineagePath).distinct()
        .select(lit("lineage").as("kind"), col("seq").cast(LongType).as("seq"),
          col("op").as("name"), lit("").as("outcome"), lit(Double.NaN).as("metric"))
      dqRows.unionByName(lin).orderBy(col("kind"), col("seq"), col("name"))
    }),
  )

  /** Cleanse→Consume end to end: catalog tables + user SQL with {placeholder}
    * substitution + after_sparksql DQ quarantine + consume-table publish. */
  private def consumeQuery(s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val db = s"graftcleanse${math.abs(d.hashCode)}"
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    if (!s.catalog.tableExists(s"$db.orders"))
      Tables(s, d, "orders").write.mode("overwrite").saveAsTable(s"$db.orders")
    if (!s.catalog.tableExists(s"$db.customer"))
      Tables(s, d, "customer").write.mode("overwrite").saveAsTable(s"$db.customer")
    val sql = s"""
      SELECT o.o_orderkey, c.c_name, c.c_mktsegment,
             CASE WHEN o.o_totalprice > {cutoff} THEN 'large' ELSE 'small' END AS band,
             o.o_totalprice
      FROM $db.orders o LEFT OUTER JOIN $db.customer c ON o.o_custkey = c.c_custkey
      ORDER BY o.o_orderkey"""
    val dqRules = Specs.dqRules(Specs.parseJson(
      """{"after_sparksql": {"quarantine_rules":
           ["CustomSql 'SELECT o_orderkey FROM primary WHERE o_totalprice >= 30000'"]}}"""))
    val args = JobArgs("Bench", "orders_enriched", "", "bench-exec",
      Map.empty, db, environment = "Dev")
    new PipelineRunner(s).cleanseToConsume(args, sql,
        Map("cutoff" -> "200000"), dqRules)
      .orderBy(col("o_orderkey"))
  }

  val oracles: Map[String, String] = Map(
    // interval-join replay: µs-truncated instants (the staging's precision),
    // same closed [cts, cts+1h] window, unix-seconds floor for the gap
    "q110_stream_join" -> """
      WITH e AS (SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(user_id AS BIGINT) AS user_id,
               date_trunc('microseconds', ts) AS ts, event_type FROM events),
      c AS (SELECT user_id, event_id AS click_id, ts AS cts FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id, event_id AS purchase_id, ts AS pts FROM e WHERE event_type = 'purchase')
      SELECT c.user_id, click_id, purchase_id,
             CAST(epoch_us(pts) // 1000000 - epoch_us(cts) // 1000000 AS BIGINT) AS gap_secs
      FROM c JOIN p ON c.user_id = p.user_id AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR
      ORDER BY click_id, purchase_id""",
    "q77_streaming_dedup" -> """
      SELECT CAST(user_id AS BIGINT) AS user_id, event_type
      FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""",
    // replicate the staging's millisecond truncation, then the same 30-min
    // gap sessionization as the streaming operator; durations in whole
    // seconds via integer floor-division on epoch milliseconds
    "q78_streaming_sessions" -> """
      WITH e AS (
        SELECT CAST(user_id AS BIGINT) AS user_id,
               date_trunc('milliseconds', ts) AS ts, event_id
        FROM events),
      marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                    THEN 1 ELSE 0 END AS new_s, event_id
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT user_id, count(*) AS n_events,
             CAST((epoch_ms(max(ts)) - epoch_ms(min(ts))) // 1000 AS BIGINT) AS duration_secs
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, n_events, duration_secs""",
    "q66_filename_lookup_store" -> """
      SELECT CAST(c.c_custkey AS BIGINT) AS custkey,
             CASE c.c_mktsegment
               WHEN 'AUTOMOBILE' THEN 'AUTO' WHEN 'BUILDING' THEN 'BLDG'
               WHEN 'FURNITURE' THEN 'FURN' WHEN 'HOUSEHOLD' THEN 'HSLD'
               WHEN 'MACHINERY' THEN 'MACH' ELSE 'OTHER' END AS segment_code,
             '20260812' AS feed_date,
             n.n_name AS nation_name,
             CAST(n.n_regionkey AS BIGINT) AS region_key
      FROM customer c LEFT JOIN nation n ON CAST(c.c_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
      ORDER BY custkey""",
    "q67_view_passthrough" -> """
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 350000 THEN 'xl' ELSE 'l' END AS band,
             o_totalprice
      FROM orders WHERE o_totalprice > 250000
      ORDER BY o_orderkey""",
    "q73_bucketed_join" -> """
      SELECT o.o_orderkey, count(*) AS n_lines,
             CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey ORDER BY o.o_orderkey""",
    "q72_excel_source" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
             CAST(n_regionkey AS BIGINT) AS regionkey,
             n_name AS name
      FROM nation ORDER BY nationkey""",
    "q76_excel_range" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
             CAST(n_regionkey AS BIGINT) AS regionkey,
             n_name AS name
      FROM nation ORDER BY nationkey""",
    "q98_excel_encrypted" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
             CAST(n_regionkey AS BIGINT) AS regionkey,
             n_name AS name
      FROM nation ORDER BY nationkey""",
    "q75_empty_gate" -> """
      SELECT 'empty' AS scenario, false AS proceeded, CAST(0 AS BIGINT) AS out_rows
      UNION ALL
      SELECT 'nonempty', true, (SELECT count(*) FROM region)
      ORDER BY scenario""",
    "q88_dependency_gate" -> """
      WITH mx AS (SELECT event_type, max(ts) AS m FROM events GROUP BY event_type),
      g AS (SELECT max(ts) + INTERVAL 1 HOUR AS now FROM events)
      SELECT 'tight_' || event_type AS scenario,
             NOT (m >= (SELECT now FROM g) - INTERVAL 2 HOUR) AS queued
      FROM mx
      UNION ALL
      SELECT 'expiry_' || event_type,
             NOT (m >= (SELECT now FROM g) - INTERVAL 1 HOUR)
      FROM mx
      UNION ALL SELECT 'no_deps', false
      UNION ALL SELECT 'all_wide', false
      UNION ALL SELECT 'missing_dep', true
      UNION ALL SELECT 'no_lookback', true
      UNION ALL SELECT 'release_before', true
      UNION ALL SELECT 'release_after', false
      ORDER BY scenario""",
    "q70_generated_specs" -> """
      SELECT * FROM (VALUES
        ('changetype', 'acct_bal', 'decimal(16,2)'),
        ('date', 'created_date', 'MM/dd/yy'),
        ('mapping', 'Acct Bal', 'acct_bal'),
        ('mapping', 'Created Date', 'created_date'),
        ('mapping', 'Region Key', 'region_key'),
        ('mapping', 'Region.Name', 'region_name')
      ) AS t(kind, name, value)
      ORDER BY kind, name""",
    "q71_streaming_windows" -> """
      SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    // Conversion-gap replay: first-signup frontier, first strictly-later
    // purchase, floor-div seconds.
    "q156_conversion_gap" -> """
      WITH e AS (SELECT user_id AS u, ts, event_id AS id, event_type AS t FROM events),
      f AS (SELECT u, ts, id FROM (
              SELECT u, ts, id, row_number() OVER (PARTITION BY u ORDER BY ts, id) AS rn
              FROM e WHERE t = 'signup') WHERE rn = 1),
      p AS (SELECT e.u, e.ts FROM (
              SELECT e.u, e.ts,
                     row_number() OVER (PARTITION BY e.u ORDER BY e.ts, e.id) AS rn
              FROM e JOIN f ON e.u = f.u AND (e.ts, e.id) > (f.ts, f.id)
              WHERE e.t = 'purchase') e WHERE rn = 1)
      SELECT f.u AS user_id,
             (epoch_us(p.ts) - epoch_us(f.ts)) // 1000000 AS gap_secs
      FROM f JOIN p ON f.u = p.u ORDER BY user_id""",
    // Anomaly replay: same hour counts, integer moments, one division.
    "q155_rate_anomaly" -> """
      WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
                 FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, count(*) AS nh, sum(n) AS sn, sum(n * n) AS snn
            FROM h GROUP BY 1),
      z AS (SELECT h.event_type, h.hour, h.n,
              round(CASE WHEN nh * snn - sn * sn > 0
                         THEN CAST(h.n * nh - sn AS DOUBLE) /
                              sqrt(CAST(nh * snn - sn * sn AS DOUBLE))
                         ELSE 0.0 END, 6) AS z_r
            FROM h JOIN m USING (event_type))
      SELECT event_type, hour, n, z_r FROM z
      WHERE abs(z_r) >= 2.0 ORDER BY event_type, hour""",
    // SCD2 replay: same lag-filter + lead-close window.
    // Compaction content-invariance: the compacted table must equal the
    // source rows exactly.
    "q158_compaction" -> """
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders ORDER BY o_orderkey""",
    "q151_scd2" -> """
      WITH w AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      ch AS (SELECT user_id, ts, event_id, event_type FROM w
             WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      FROM ch ORDER BY user_id, valid_from""",
    // Profiler replay: one UNION ALL leg per column.
    "q148_profile" -> """
      SELECT 'o_orderkey' AS "column", count(*) AS n, count(*) - count(o_orderkey) AS n_null,
             count(DISTINCT o_orderkey) AS n_distinct,
             CAST(min(o_orderkey) AS VARCHAR) AS min_s, CAST(max(o_orderkey) AS VARCHAR) AS max_s
      FROM orders
      UNION ALL
      SELECT 'o_custkey', count(*), count(*) - count(o_custkey), count(DISTINCT o_custkey),
             CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus),
             min(o_orderstatus), max(o_orderstatus) FROM orders
      UNION ALL
      SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice), count(DISTINCT o_totalprice),
             CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate), count(DISTINCT o_orderdate),
             CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR) FROM orders
      ORDER BY "column"""",
    // Sketch-profiler replay: md5-60bit → (bucket, w) split, rho via bin()
    // bit length, register max, exact-integer harmonic sum, then the same
    // left-associated α·m²·2^53/S division and linear-counting branch as
    // q128, rounded to a BIGINT estimate.
    "q159_profile_sketch" -> """
      WITH src AS (
        SELECT 'o_orderkey' AS colname, CAST(o_orderkey AS VARCHAR) AS v FROM orders
        UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders),
      h AS (SELECT colname, CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h
            FROM src WHERE v IS NOT NULL),
      b AS (SELECT colname, h // 4503599627370496 AS bucket,
                   h % 4503599627370496 AS w FROM h),
      r AS (SELECT colname, bucket,
              max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS rho
            FROM b GROUP BY 1, 2),
      g AS (SELECT colname, count(*) AS nonzero,
              sum(CAST(1 AS BIGINT) << (53 - rho))
                + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS s_num
            FROM r GROUP BY 1),
      e AS (SELECT colname, 256 - nonzero AS zeros,
              0.7213 / (1 + 1.079 / 256) * 256 * 256 * power(2.0, 53)
                / CAST(s_num AS DOUBLE) AS raw
            FROM g),
      est AS (SELECT colname,
              CAST(round(CASE WHEN zeros > 0 AND raw <= 640.0
                              THEN 256.0 * ln(256.0 / zeros) ELSE raw END)
                   AS BIGINT) AS n_distinct
            FROM e),
      stats AS (
        SELECT 'o_orderkey' AS colname, count(*) AS n,
               count(*) - count(o_orderkey) AS n_null,
               CAST(min(o_orderkey) AS VARCHAR) AS min_s,
               CAST(max(o_orderkey) AS VARCHAR) AS max_s FROM orders
        UNION ALL SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
               CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
               min(o_orderstatus), max(o_orderstatus) FROM orders)
      SELECT stats.colname AS "column", n, n_null, est.n_distinct, min_s, max_s
      FROM stats JOIN est USING (colname)
      ORDER BY "column"""",
    // Funnel replay: per-step earliest-frontier via row_number + strict
    // (ts, id) tuple ordering against the previous frontier.
    "q149_funnel" -> """
      WITH e AS (SELECT user_id AS u, ts, event_id AS id, event_type AS t FROM events),
      f1 AS (SELECT u, ts, id FROM (
               SELECT u, ts, id, row_number() OVER (PARTITION BY u ORDER BY ts, id) AS rn
               FROM e WHERE t = 'signup') WHERE rn = 1),
      f2 AS (SELECT u, ts, id FROM (
               SELECT e.u, e.ts, e.id,
                      row_number() OVER (PARTITION BY e.u ORDER BY e.ts, e.id) AS rn
               FROM e JOIN f1 ON e.u = f1.u AND (e.ts, e.id) > (f1.ts, f1.id)
               WHERE e.t = 'click') WHERE rn = 1),
      f3 AS (SELECT u, ts, id FROM (
               SELECT e.u, e.ts, e.id,
                      row_number() OVER (PARTITION BY e.u ORDER BY e.ts, e.id) AS rn
               FROM e JOIN f2 ON e.u = f2.u AND (e.ts, e.id) > (f2.ts, f2.id)
               WHERE e.t = 'purchase') WHERE rn = 1)
      SELECT CAST(step AS BIGINT) AS step, event_type, CAST(n_users AS BIGINT) AS n_users
      FROM (VALUES (1, 'signup', (SELECT count(*) FROM f1)),
                   (2, 'click', (SELECT count(*) FROM f2)),
                   (3, 'purchase', (SELECT count(*) FROM f3))) v(step, event_type, n_users)
      ORDER BY step""",
    // Retention replay: distinct weekly activity + first-period cohort join.
    "q150_retention" -> """
      WITH a AS (SELECT DISTINCT user_id AS u,
               (epoch_us(ts) // 1000000) // 604800 AS p FROM events),
      c AS (SELECT u, min(p) AS cohort FROM a GROUP BY 1)
      SELECT cohort, p - cohort AS period_offset, count(DISTINCT u) AS n_users
      FROM a JOIN c USING (u)
      GROUP BY 1, 2 ORDER BY cohort, period_offset""",
    // Outer-join replay: the batch LEFT JOIN over the same interval.
    "q140_stream_outer_join" -> """
      WITH e AS (SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(user_id AS BIGINT) AS user_id,
               date_trunc('microseconds', ts) AS ts, event_type FROM events),
      c AS (SELECT user_id, event_id AS click_id, ts AS cts FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id, event_id AS purchase_id, ts AS pts FROM e WHERE event_type = 'purchase')
      SELECT c.user_id, click_id, purchase_id,
             CAST(epoch_us(pts) // 1000000 - epoch_us(cts) // 1000000 AS BIGINT) AS gap_secs
      FROM c LEFT JOIN p ON c.user_id = p.user_id
        AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR
      ORDER BY click_id, purchase_id""",
    // Streaming-upsert replay: global argmax per key — batch-order
    // independence of the merge makes this exact however the files split.
    "q138_streaming_upsert" -> """
      WITH r AS (
        SELECT event_id % 50 AS k, event_id, event_type, ts, value,
               row_number() OVER (PARTITION BY event_id % 50
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT k, event_id, event_type, ts, value
      FROM r WHERE rn = 1 ORDER BY k""",
    // Streaming-KLL replay: exact-regime order statistics per (day, type).
    "q162_streaming_kll" -> """
      WITH v AS (SELECT date_trunc('day', ts) AS day, event_type, value
                 FROM events WHERE value IS NOT NULL),
      r AS (SELECT day, event_type, value,
              row_number() OVER (PARTITION BY day, event_type ORDER BY value) AS rn,
              count(*) OVER (PARTITION BY day, event_type) AS n FROM v)
      SELECT day, event_type, CAST(max(n) AS BIGINT) AS n,
             max(CASE WHEN rn = least(floor(0.5 * n) + 1, n) THEN value END) AS p50,
             max(CASE WHEN rn = least(floor(0.95 * n) + 1, n) THEN value END) AS p95
      FROM r GROUP BY day, event_type ORDER BY day, event_type""",
    // Streaming-HLL replay: q128's register arithmetic over the same
    // (day, event_type, user) groups the stream aggregates.
    "q136_streaming_hll" -> """
      WITH h AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events),
      b AS (SELECT day, event_type, h // 4503599627370496 AS bucket,
              h % 4503599627370496 AS w FROM h),
      r AS (SELECT day, event_type, bucket,
              max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS rho
            FROM b GROUP BY 1, 2, 3),
      g AS (SELECT day, event_type, count(*) AS nonzero,
              sum(CAST(1 AS BIGINT) << (53 - rho)) + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS s_num
            FROM r GROUP BY 1, 2),
      e AS (SELECT day, event_type, nonzero, s_num, 256 - nonzero AS zeros,
              0.7213 / (1 + 1.079 / 256) * 256 * 256 * power(2.0, 53) / CAST(s_num AS DOUBLE) AS raw
            FROM g)
      SELECT day, event_type, CAST(nonzero AS BIGINT) AS nonzero,
             CAST(s_num AS BIGINT) AS s_num,
             round(CASE WHEN zeros > 0 AND raw <= 640.0
                        THEN 256.0 * ln(256.0 / zeros) ELSE raw END, 4) AS est_r
      FROM e ORDER BY day, event_type""",
    "q93_streaming_enrich" -> """
      SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
             CAST(l_linenumber AS BIGINT) AS linenumber,
             o_orderstatus AS orderstatus,
             CAST(o_custkey AS BIGINT) AS custkey
      FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      ORDER BY orderkey, linenumber""",
    "q68_streaming_ingest" -> """
      SELECT CAST(l_orderkey AS BIGINT) AS orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS quantity,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS extendedprice,
             CAST(l_shipdate AS DATE) AS shipdate,
             l_returnflag AS returnflag,
             'stream' AS source_system
      FROM lineitem
      WHERE l_quantity IS NOT NULL
      ORDER BY orderkey, linenumber""",
    "q62_source_formats" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
             CAST(n_regionkey AS BIGINT) AS regionkey,
             n_name AS name, fmt
      FROM nation, (SELECT unnest(['avro', 'fixed', 'json', 'orc', 'xml']) AS fmt)
      ORDER BY fmt, nationkey""",
    "q58_dq_lineage" -> """
      WITH mapped AS (
        SELECT l_quantity AS quantity,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS ep
        FROM lineitem WHERE l_quantity IS NOT NULL),
      frac AS (SELECT avg(CASE WHEN ep >= 2000 THEN 1.0 ELSE 0.0 END) AS m FROM mapped)
      SELECT 'dq' AS kind, CAST(0 AS BIGINT) AS seq,
             'before_transform|warn|Completeness ''quantity'' >= 0.5' AS name,
             'Passed' AS outcome, 1.0 AS metric
      UNION ALL SELECT 'dq', 0,
             'before_transform|warn|ColumnValues ''returnflag'' in [''A'',''N'',''R'']',
             'Passed', 1.0
      UNION ALL SELECT 'dq', 0,
             'after_transform|quarantine|ColumnValues ''extendedprice'' >= 2000',
             CASE WHEN m = 1.0 THEN 'Passed' ELSE 'Failed' END, round(m, 6) FROM frac
      UNION ALL SELECT 'dq', 0,
             'after_transform|halt|(ColumnExists ''orderkey'') and (IsComplete ''orderkey'')',
             'Passed', 'NaN'::DOUBLE
      UNION ALL SELECT 'lineage', 1, 'read', '', 'NaN'::DOUBLE
      UNION ALL SELECT 'lineage', 2, 'numericaudit', '', 'NaN'::DOUBLE
      UNION ALL SELECT 'lineage', 3, 'mapping', '', 'NaN'::DOUBLE
      UNION ALL SELECT 'lineage', 4, 'numericaudit', '', 'NaN'::DOUBLE
      ORDER BY kind, seq, name""",
    "q40_consume_e2e" -> """
      SELECT o.o_orderkey, c.c_name, c.c_mktsegment,
             CASE WHEN o.o_totalprice > 200000 THEN 'large' ELSE 'small' END AS band,
             o.o_totalprice
      FROM orders o LEFT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_totalprice >= 30000
      ORDER BY o.o_orderkey""",
    "q37_pipeline_e2e" -> """
      SELECT CAST(l_orderkey AS BIGINT) AS orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS quantity,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS extendedprice,
             CAST(l_shipdate AS DATE) AS shipdate,
             l_returnflag AS returnflag,
             'bench' AS source_system, '2026' AS year
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) >= 2000
      ORDER BY orderkey, linenumber""",
  )
}
