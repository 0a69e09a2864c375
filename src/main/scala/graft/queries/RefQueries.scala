package graft.queries

import graft.config.Specs
import graft.config.Specs.NodeOps
import graft.functions.{ColumnTransforms => C, StructuredTransforms => G}
import graft.operators.{Lookup, WindowOps}
import graft.stores.TokenStore
import graft.transforms.{TransformContext, TransformRegistry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-operator query pack (SURVEY.md §2): one named query per operator
  * family, each with a DuckDB oracle in [[oracles]]. Column names are aligned
  * between the Spark plan and the oracle SQL (the driver sorts columns by name
  * before hashing).
  *
  * Float discipline: double columns are summed as decimal(18,2) then cast back
  * to double so Spark and DuckDB agree bit-for-bit regardless of summation
  * order; plain double arithmetic is written with the identical expression tree
  * on both sides.
  */
object RefQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P3 clean_column_names + P6 clean_nulltypes + §2.7 limit: messy incoming
    // headers (spaces, dots, parens, colons, mixed case) are normalized to
    // parquet/Athena-safe names, an untyped all-null column is made
    // writable, and the frame is cut to a deterministic top-50.
    "q69_clean_names_limit" -> ((s, d) => {
      val messy = Tables(s, d, "supplier").select(
          col("s_suppkey").as("Supp Key"),
          col("s_name").as("Supplier.Name (raw)"),
          col("s_acctbal").as("Acct:Bal"))
        .withColumn("Empty Col", lit(null)) // NullType — breaks parquet writes
      val (renamed, _) = graft.mapping.CustomMapping.cleanColumnNames(messy)
      graft.functions.ColumnTransforms.cleanNullTypes(renamed)
        .select(col("supp_key").cast(LongType).as("supp_key"),
          col("supplier_name_raw"), col("acct_bal"), col("empty_col"))
        .orderBy(col("supp_key"))
        .limit(50)
    }),

    // A1/A5 aggregate — TPC-H Q1 shape (sum/avg/count per flag+status).
    "q01_agg" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
          (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P4 transform_filterrows — raw SQL condition filter.
    "q02_filter" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .filter(expr("l_quantity < 5 AND l_discount > 0.05"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P1 custommapping — select+alias projection; unmapped columns dropped.
    "q03_mapping" -> ((s, d) => {
      graft.mapping.CustomMapping.applyMapping(
        Tables(s, d, "part"),
        Seq(
          graft.mapping.MappingRow("p_partkey", "part_id"),
          graft.mapping.MappingRow("p_name", "part_name"),
          graft.mapping.MappingRow("p_retailprice", "retail_price"),
          graft.mapping.MappingRow("p_size", "null")))
        .orderBy(col("part_id"))
    }),

    // P2 flatten_schema addressing (custom_mapping.py:13-33): mapping rows
    // target NESTED fields by dotted path — both the reference's backtick
    // dialect and bare dots — plus the two disambiguation corners: a literal
    // top-level column whose NAME contains a dot (must stay one column, not
    // become struct addressing), and the case-insensitive "Null" drop
    // sentinel on a nested path. The nested frame is built from customer so
    // the oracle can pin the flattened output exactly.
    "q74_flatten_mapping" -> ((s, d) => {
      val nested = Tables(s, d, "customer").select(
        col("c_custkey").as("CustKey"),
        struct(
          col("c_name").as("Name"),
          struct(col("c_nationkey").cast(LongType).as("Nation"),
                 col("c_acctbal").as("Balance")).as("Acct")).as("Insured"),
        col("c_mktsegment").as("Market.Segment"))
      graft.mapping.CustomMapping.applyMapping(nested, Seq(
          graft.mapping.MappingRow("`Insured`.`Name`", "insured_name"),
          graft.mapping.MappingRow("Insured.Acct.Nation", "nation_key"),
          graft.mapping.MappingRow("`Insured`.`Acct`.`Balance`", "Null"),
          graft.mapping.MappingRow("Market.Segment", "segment"),
          graft.mapping.MappingRow("CustKey", "cust_id")))
        .orderBy(col("cust_id"))
    }),

    // J1 lookup — broadcast value-substitution join (nation-name lookup).
    "q04_lookup" -> ((s, d) => {
      val lkp = Tables(s, d, "nation")
        .select(col("n_nationkey").as("orig_value"), col("n_name").as("new_value"))
      Lookup.lookup(Tables(s, d, "customer"), lkp, field = "nation_name",
          source = Some("c_nationkey"), noMatch = Some("unknown"))
        .select(col("c_custkey"), col("c_name"), col("nation_name"))
        .orderBy(col("c_custkey"))
    }),

    // J2 multilookup — composite-key broadcast join returning several attrs.
    "q05_multilookup" -> ((s, d) => {
      val lkp = Tables(s, d, "nation")
        .select(col("n_nationkey").cast(StringType).as("lookup_key"), col("n_name"), col("n_regionkey"))
      Lookup.multiLookup(Tables(s, d, "supplier"), lkp,
          matchColumns = Seq("s_nationkey"), keyCol = "lookup_key",
          returnAttributes = Seq("n_name", "n_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"), col("n_regionkey"))
        .orderBy(col("s_suppkey"))
    }),

    // J5 consume-layer SQL — multi-table LEFT OUTER join + CASE, via spark.sql
    // over temp views (the reference's cleanse-to-consume SQL stage).
    "q06_consume_sql" -> ((s, d) => {
      Tables(s, d, "orders").createOrReplaceTempView("orders")
      Tables(s, d, "customer").createOrReplaceTempView("customer")
      Tables(s, d, "nation").createOrReplaceTempView("nation")
      Tables(s, d, "region").createOrReplaceTempView("region")
      s.sql("""
        SELECT o.o_orderkey, c.c_name, n.n_name AS nation, r.r_name AS region,
               CASE WHEN o.o_totalprice > 200000 THEN 'large'
                    WHEN o.o_totalprice > 50000 THEN 'medium'
                    ELSE 'small' END AS order_band
        FROM orders o
        LEFT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT OUTER JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT OUTER JOIN region r ON n.n_regionkey = r.r_regionkey
        ORDER BY o.o_orderkey""")
    }),

    // W2 rownumber — top-3 most recent orders per customer.
    "q07_rownumber" -> ((s, d) => {
      WindowOps.rowNumber(Tables(s, d, "orders"), "rn",
          partition = Seq(col("o_custkey")),
          sort = Seq(col("o_orderdate").desc, col("o_orderkey")))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn").cast(LongType).as("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // W1 filldown — forward-fill nulls per user ordered by time.
    "q08_filldown" -> ((s, d) => {
      val ev = Tables(s, d, "events")
        .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      WindowOps.fillDown(ev, Seq("v"), sort = Seq(col("ts"), col("event_id")),
          partition = Seq(col("user_id")))
        .select(col("event_id"), col("user_id"), col("v").as("filled_value"))
        .orderBy(col("event_id"))
    }),

    // C12-C15 merge/addcolumns/multiplycolumns/flipsign — null-safe arithmetic.
    "q09_premium_calc" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
        .withColumn("disc_n", when(col("l_discount") === 0.0, lit(null)).otherwise(col("l_discount")))
      li.select(
          col("l_orderkey"), col("l_linenumber"),
          C.addColumns(Seq(col("l_tax"), col("disc_n"))).as("add_col"),
          C.multiplyColumns(Seq(col("l_quantity"), col("disc_n"))).as("mult_col"),
          C.flipSign(col("l_extendedprice")).as("flip_col"),
          C.mergeColumns(Seq(col("disc_n"), col("l_tax")), Some(lit(0.0))).as("merge_col"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // C1/C16/C17 date parse + enddate + policymonths.
    "q10_dates" -> ((s, d) => {
      val o = Tables(s, d, "orders").withColumn("odate", to_date(col("o_orderdate")))
      o.select(
          col("o_orderkey"),
          col("odate").as("order_date"),
          C.endDate(col("odate"), pmod(col("o_custkey"), lit(12)).cast(IntegerType)).as("end_date"),
          C.policyMonths(col("odate"), lit("1998-12-31").cast(DateType), normalized = true)
            .cast(LongType).as("months_to_end"))
        .orderBy(col("o_orderkey"))
    }),

    // C4 implieddecimal — trailing digits as implied fraction.
    "q11_implieddecimal" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
        .withColumn("cents", round(col("l_extendedprice") * 100).cast(LongType))
        .withColumn("raw", col("cents").cast(StringType))
      li.select(col("l_orderkey"), col("l_linenumber"),
          C.impliedDecimal(col("raw"), 2).cast(DoubleType).as("implied_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // C5 currency — strip US + euro formatting, cast decimal.
    "q12_currency" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
        .withColumn("cents", round(col("l_extendedprice") * 100).cast(LongType))
        .withColumn("usd", concat(lit("$"), (col("cents") / 100).cast(LongType).cast(StringType),
          lit("."), lpad(pmod(col("cents"), lit(100)).cast(StringType), 2, "0")))
        .withColumn("eur", translate(col("usd"), "$.", "€,"))
      li.select(col("l_orderkey"), col("l_linenumber"),
          C.currency(col("usd")).cast(DoubleType).as("usd_amount"),
          C.currency(col("eur"), euro = true).cast(DoubleType).as("eur_amount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // C18/C19/C10 hash/redact/literal — data-protection trio.
    "q13_protect" -> ((s, d) => {
      Tables(s, d, "customer")
        .select(
          col("c_custkey"),
          C.sha256Hash(col("c_name")).as("name_hash"),
          C.sha256Hash(when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_mktsegment")))
            .as("segment_hash"),
          C.redact("****").as("acctbal_redacted"),
          lit("graft").cast(StringType).as("source_system"))
        .orderBy(col("c_custkey"))
    }),

    // C11 combinecolumns — null→'' printf-merge, trimmed.
    "q14_combine" -> ((s, d) => {
      val c = Tables(s, d, "customer")
        .withColumn("seg_n", when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_mktsegment")))
      c.select(col("c_custkey"),
          C.combineColumns("%s-%s", Seq(col("c_name"), col("seg_n"))).as("combined"))
        .orderBy(col("c_custkey"))
    }),

    // G1 jsonexpandarray — explode with 1-based index.
    "q15_expandarray" -> ((s, d) => {
      val p = Tables(s, d, "part").withColumn("words", split(col("p_name"), " "))
        .select("p_partkey", "words")
      G.expandArray(p, "words", "word_index", "word")
        .withColumn("word_index", col("word_index").cast(LongType))
        .orderBy(col("p_partkey"), col("word_index"))
    }),

    // C2/C6/C8/C9/C20 via the config-driven TransformRegistry dialect:
    // timestamp parse (malformed → NULL), titlecase, regex extract/replace,
    // tokenize with a REAL token-store write — the store is read back and
    // joined on the hash so the oracle verifies the K6 round trip too.
    "q54_string_protect" -> ((s, d) => {
      val storePath = s"/tmp/graft_tokstore_q54/${math.abs(d.hashCode)}"
      val base = Tables(s, d, "customer")
        .withColumn("segment", lower(col("c_mktsegment")))
        .withColumn("phone", concat(lit("555-"), lpad(pmod(col("c_custkey"), lit(10000)), 4, "0")))
        .withColumn("ts_str",
          when(pmod(col("c_custkey"), lit(11)) === 0, lit("not-a-date"))
            .otherwise(concat(lit("2026-0"), pmod(col("c_custkey"), lit(9)) + 1,
              lit("-1"), pmod(col("c_custkey"), lit(9)),
              lit(" 07:3"), pmod(col("c_custkey"), lit(6)), lit(":15"))))
      val spec = Specs.parseJson("""{
          "titlecase": ["segment"],
          "columnfromcolumn": [{"field": "cust_num", "source": "c_name", "pattern": "Customer#0*(\\d+)"}],
          "columnreplace": [{"field": "name_short", "source": "c_name", "pattern": "Customer#", "replacement": "C-"}],
          "timestamp": [{"field": "ts_parsed", "source": "ts_str", "format": "yyyy-MM-dd HH:mm:ss"}],
          "tokenize": ["phone"]
        }""")
      val tokenStore = new TokenStore(storePath)
      val ctx = TransformContext(s, tokenStore = Some(tokenStore))
      val out = TransformRegistry.applyAll(base, spec.objFields, ctx)
      val store = tokenStore.read(s)
        .select(col("hash_key"), col("raw_data").as("detokenized"))
      out.join(store, col("phone") === col("hash_key"))
        .select(col("c_custkey"), col("segment"), col("cust_num"), col("name_short"),
          col("ts_parsed").cast("timestamp_ntz").as("ts_parsed"),
          col("phone").as("phone_token"), col("detokenized"))
        .orderBy(col("c_custkey"))
    }),

    // G5 json string→struct (schema inferred) → G3 one-level flatten →
    // G2 expandmap to (index, key, value) rows, chained.
    "q55_nested_structs" -> ((s, d) => {
      val n = Tables(s, d, "nation")
        .withColumn("payload", to_json(struct(
          col("n_nationkey").cast(LongType).as("key_a"),
          col("n_regionkey").cast(LongType).as("key_b"))))
        .select(col("n_nationkey"), col("n_name"), col("payload"))
      val parsed = G.jsonStringToStruct(n, "payload")
      val flat = G.flattenOneLevel(parsed, "payload", keepParent = true)
      val rows = G.expandMap(flat, "payload", "prop_index", "prop_key", "prop_value")
      rows.select(col("n_nationkey").cast(LongType).as("n_nationkey"), col("n_name"),
          col("payload_key_a"), col("payload_key_b"),
          col("prop_index").cast(LongType).as("prop_index"),
          col("prop_key"), col("prop_value"))
        .orderBy(col("n_nationkey"), col("prop_index"))
    }),

    // G6 expandpolicymonths + earnedpremium in BOTH modes (straight-line with
    // its outside-the-term NULL quirk, and by-day proration) — orders recast
    // as policies with a per-row month term.
    "q56_policy_expand" -> ((s, d) => {
      val pol = Tables(s, d, "orders").filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("eff"),
          add_months(to_date(col("o_orderdate")),
            (pmod(col("o_custkey"), lit(12)) + 1).cast(IntegerType)).as("exp"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("written_premium"))
      val expanded = G.expandPolicyMonths(pol, "eff", "exp")
      expanded.select(col("o_orderkey"),
          col("policy_month_index").cast(LongType).as("policy_month_index"),
          col("policy_month_start"), col("last_day_of_month"),
          C.earnedPremiumStraightLine(col("written_premium"), col("eff"), col("exp"),
            col("policy_month_start"), col("policy_month_start"))
            .cast(DoubleType).as("earned_sl"),
          C.earnedPremiumByDay(col("written_premium"), col("policy_month_start"),
            col("last_day_of_month"), col("eff"), col("exp"))
            .cast(DoubleType).as("earned_byday"))
        .orderBy(col("o_orderkey"), col("policy_month_index"))
    }),

    // J4/J6/K5 full entity-match job e2e (etl_consume_entity_match.py:286-459):
    // first run creates the primary table; second batch exercises exact match
    // (same keys), leveled fuzzy match (new key, same name, slice-markup
    // blocking), uuid-fill for new entities, and the MERGE upsert. The final
    // primary table state is oracle-checked; nondeterministic uuids are
    // masked to '[new]'.
    "q57_entity_match_e2e" -> ((s, d) => {
      val db = s"graftmatch${math.abs(d.hashCode)}"
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      s.sql(s"DROP TABLE IF EXISTS $db.entity_primary")
      val cust = Tables(s, d, "customer")
      val spec = graft.operators.EntityMatch.parseSpec(Specs.parseJson(
        s"""{
          "primary_entity_table": "$db.entity_primary",
          "global_id_field": "globalid",
          "primary_partition_by": ["nationkey"],
          "exact_match_fields": {"source_primary_key": "customerno",
                                 "source_system_key": "srcsystemid"},
          "levels": [{"id": "1", "blocks": ["name[12:18]"], "threshold": 0.999,
                      "fields": [{"fieldname": "name", "type": "string",
                                  "method": "jarowinkler", "weight": 1.0}]}]
        }"""))
      val initial = cust.select(
        col("c_custkey").as("customerno"), lit("A").as("srcsystemid"),
        col("c_name").as("name"), col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("segment"),
        concat(lit("g-"), col("c_custkey")).as("globalid"))
      graft.operators.EntityMatch.run(s, initial, spec, Seq("customerno"))
      val batch = cust.filter(pmod(col("c_custkey"), lit(4)) < 3).select(
        when(pmod(col("c_custkey"), lit(4)) === 0, col("c_custkey"))
          .otherwise(col("c_custkey") + 1000000).as("customerno"),
        lit("A").as("srcsystemid"),
        when(pmod(col("c_custkey"), lit(4)) === 2, concat(lit("Zz-"), col("c_custkey")))
          .otherwise(col("c_name")).as("name"),
        col("c_nationkey").as("nationkey"),
        lit("UPDATED").as("segment"))
      graft.operators.EntityMatch.run(s, batch, spec, Seq("customerno"))
      s.table(s"$db.entity_primary")
        .select(col("customerno"), col("name"), col("nationkey"), col("segment"),
          when(col("globalid").startsWith("g-"), col("globalid"))
            .otherwise(lit("[new]")).as("gid"))
        .orderBy(col("customerno"), col("name"))
    }),

    // W2 via the config dialect with DESCENDING sort ("field desc") — exceeds
    // the reference's ascending-only TODO (datatransform_misc.py:50,89).
    "q61_desc_window" -> ((s, d) => {
      val spec = Specs.parseJson("""{
        "rownumber": [{"field": "rn", "partition": ["user_id"],
                       "sort": ["ts desc", "event_id desc"]}]
      }""")
      TransformRegistry.applyAll(Tables(s, d, "events"), spec.objFields, TransformContext(s))
        .filter(col("rn") <= 2)
        .select(col("event_id"), col("user_id"), col("rn").cast(LongType).as("rn"))
        .orderBy(col("event_id"))
    }),

    // G4 xml string→struct: schema inferred from a sampled row via
    // schema_of_xml, then from_xml over the column (Spark 4 native).
    "q63_xml_struct" -> ((s, d) => {
      val n = Tables(s, d, "nation")
        .withColumn("payload", concat(
          lit("<rec><k>"), col("n_nationkey").cast(LongType),
          lit("</k><r>"), col("n_regionkey").cast(LongType),
          lit("</r><nm>"), col("n_name"), lit("</nm></rec>")))
        .select(col("n_nationkey"), col("payload"))
      val parsed = G.xmlStringToStruct(n, "payload")
      parsed.select(col("n_nationkey").cast(LongType).as("n_nationkey"),
          col("payload.k").cast(LongType).as("k"),
          col("payload.r").cast(LongType).as("r"),
          col("payload.nm").as("nm"))
        .orderBy(col("n_nationkey"))
    }),

    // G5-ish JSON string column — extract + aggregate.
    "q16_json_props" -> ((s, d) => {
      Tables(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }),

    // Streaming sessionization, batch form (same gap semantics as the
    // flatMapGroupsWithState event-time-timeout operator).
    "q33_sessions" -> ((s, d) => {
      graft.streaming.StreamingOps.sessionizeBatch(
          Tables(s, d, "events"), gapSecs = 1800, tieBreak = Seq("event_id"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Streaming-analog tumbling-window aggregation (batch form).
    "q17_hourly_events" -> ((s, d) => {
      Tables(s, d, "events")
        .withColumn("hour", date_trunc("hour", col("ts")))
        .groupBy(col("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // §2.11 DQ quarantine — row-level DQDL rules split pass/fail (the passed
    // side; the failed side is the quarantine table minus its timestamp).
    "q19_dq_quarantine" -> ((s, d) => {
      val res = new graft.dq.DqEngine().runQuarantine(Tables(s, d, "orders"), Seq(
        "ColumnValues 'o_orderstatus' in ['O','F']",
        "ColumnValues 'o_totalprice' >= 30000",
        "CustomSql 'SELECT o_orderkey FROM primary WHERE o_custkey IS NOT NULL'"))
      res.passed.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Snapshot diff (CDC): classify inserts/deletes/updates between two
    // deterministic variants of orders — the incremental-refresh feed when a
    // source only delivers full reloads.
    "q51_snapshot_diff" -> ((s, d) => {
      val orders = Tables(s, d, "orders")
      val oldSnap = orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
      val newSnap = orders.withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(7)) === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      graft.operators.SnapshotDiff.diff(oldSnap, newSnap, Seq("o_orderkey"),
          Seq("o_orderstatus", "o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Range join: error events located in their user's session interval via
    // the binned point-in-interval equi-join (cross-validates sessionization:
    // every event lands in exactly one of its user's sessions).
    "q48_range_join" -> ((s, d) => {
      val sessions = graft.streaming.StreamingOps.sessionizeBatch(
          Tables(s, d, "events"), gapSecs = 1800, tieBreak = Seq("event_id"))
        .select(col("user_id"), col("session_id"),
          unix_timestamp(col("session_start")).as("start_s"),
          unix_timestamp(col("session_end")).as("end_s"))
      val errors = Tables(s, d, "events")
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("ts_s"))
      graft.operators.RangeJoin.pointInInterval(errors, sessions,
          "ts_s", "start_s", "end_s", Seq("user_id"), binWidth = 3600)
        .select(col("event_id"), col("user_id"), col("session_id"))
        .orderBy(col("event_id"))
    }),

    // As-of join: each purchase event picks up the user's most recent prior
    // view timestamp — single keyed shuffle + running window, no range/cross
    // join; oracle via DuckDB's native ASOF JOIN.
    "q47_asof_join" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"))
      graft.operators.AsOfJoin.asof(purchases, views, Seq("user_id"),
          "ts", "vts", Seq("vts"))
        .select(col("event_id"), col("user_id"), col("vts").as("last_view_ts"))
        .orderBy(col("event_id"))
    }),

    // Semi/anti joins — the primitives behind the manual MERGE upsert (K5):
    // customers WITH orders (semi) and WITHOUT orders (anti), one frame.
    "q45_semi_anti" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders").select(col("o_custkey"))
      val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .withColumn("has_orders", lit(true))
      val withoutOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .withColumn("has_orders", lit(false))
      withOrders.unionByName(withoutOrders)
        .select(col("c_custkey"), col("has_orders"))
        .orderBy(col("c_custkey"))
    }),

    // Exact linear-interpolation percentiles of order totals per status.
    "q46_percentiles" -> ((s, d) => {
      Tables(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
        .orderBy(col("o_orderstatus"))
    }),

    // A5-class: ROLLUP grouping (subtotals + grand total), null group keys
    // coalesced for deterministic compare.
    "q43_rollup" -> ((s, d) => {
      Tables(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast(DoubleType).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy(col("status"), col("priority"))
    }),

    // Frame-based window: trailing 3-order moving sum per customer.
    "q44_moving_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      Tables(s, d, "orders")
        .withColumn("trailing_sum",
          sum(dec(col("o_totalprice"))).over(w).cast(DoubleType))
        .select(col("o_custkey"), col("o_orderkey"), col("trailing_sum"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // unionByName — recombine split frames (entity-match recombination shape).
    "q18_union" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val big = ev.filter(col("value") >= 50).withColumn("slice", lit("big"))
      val small = ev.filter(col("value") < 50).select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
        .withColumn("slice", lit("small"))
      big.unionByName(small)
        .select(col("event_id"), col("event_type"), col("slice"))
        .orderBy(col("event_id"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q69_clean_names_limit" -> """
      SELECT CAST(s_suppkey AS BIGINT) AS supp_key,
             s_name AS supplier_name_raw,
             s_acctbal AS acct_bal,
             CAST(NULL AS VARCHAR) AS empty_col
      FROM supplier ORDER BY supp_key LIMIT 50""",
    "q01_agg" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_filter" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
      WHERE l_quantity < 5 AND l_discount > 0.05 ORDER BY l_orderkey, l_linenumber""",
    "q03_mapping" -> """
      SELECT p_partkey AS part_id, p_name AS part_name, p_retailprice AS retail_price
      FROM part ORDER BY part_id""",
    "q74_flatten_mapping" -> """
      SELECT c_custkey AS cust_id, c_name AS insured_name,
             CAST(c_nationkey AS BIGINT) AS nation_key,
             c_mktsegment AS segment
      FROM customer ORDER BY cust_id""",
    "q04_lookup" -> """
      SELECT c_custkey, c_name, COALESCE(n.n_name, 'unknown') AS nation_name
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      ORDER BY c_custkey""",
    "q05_multilookup" -> """
      SELECT s_suppkey, s_name, n.n_name, n.n_regionkey
      FROM supplier s LEFT JOIN nation n ON CAST(s.s_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
      ORDER BY s_suppkey""",
    "q06_consume_sql" -> """
      SELECT o.o_orderkey, c.c_name, n.n_name AS nation, r.r_name AS region,
             CASE WHEN o.o_totalprice > 200000 THEN 'large'
                  WHEN o.o_totalprice > 50000 THEN 'medium'
                  ELSE 'small' END AS order_band
      FROM orders o
      LEFT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
      LEFT OUTER JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT OUTER JOIN region r ON n.n_regionkey = r.r_regionkey
      ORDER BY o.o_orderkey""",
    "q07_rownumber" -> """
      SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q08_filldown" -> """
      SELECT event_id, user_id,
             last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      FROM (SELECT event_id, user_id, ts,
              CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v FROM events)
      ORDER BY event_id""",
    "q09_premium_calc" -> """
      SELECT l_orderkey, l_linenumber,
             COALESCE(l_tax, 0) + COALESCE(disc_n, 0) AS add_col,
             COALESCE(l_quantity, 1.0) * COALESCE(disc_n, 1.0) AS mult_col,
             -l_extendedprice AS flip_col,
             COALESCE(disc_n, l_tax, 0.0) AS merge_col
      FROM (SELECT *, CASE WHEN l_discount = 0.0 THEN NULL ELSE l_discount END AS disc_n
            FROM lineitem)
      ORDER BY l_orderkey, l_linenumber""",
    "q10_dates" -> """
      SELECT o_orderkey, odate AS order_date,
             (odate + to_months(CAST(o_custkey % 12 AS INT)))::DATE AS end_date,
             CASE WHEN odate > DATE '1998-11-30'
                  THEN (1998 - year(odate)) * 12 + (12 - month(odate)) + 1
                  ELSE (1998 - year(odate)) * 12 + (11 - month(odate)) + 1 END AS months_to_end
      FROM (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS odate FROM orders)
      ORDER BY o_orderkey""",
    "q57_entity_match_e2e" -> """
      SELECT * FROM (
        SELECT c_custkey AS customerno, c_name AS name, c_nationkey AS nationkey,
               'UPDATED' AS segment, 'g-' || CAST(c_custkey AS VARCHAR) AS gid
        FROM customer WHERE c_custkey % 4 = 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_nationkey, 'UPDATED',
               'g-' || CAST(c_custkey AS VARCHAR)
        FROM customer WHERE c_custkey % 4 = 1
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               'g-' || CAST(c_custkey AS VARCHAR)
        FROM customer WHERE c_custkey % 4 = 2
        UNION ALL
        SELECT c_custkey + 1000000, 'Zz-' || CAST(c_custkey AS VARCHAR), c_nationkey,
               'UPDATED', '[new]'
        FROM customer WHERE c_custkey % 4 = 2
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               'g-' || CAST(c_custkey AS VARCHAR)
        FROM customer WHERE c_custkey % 4 = 3)
      ORDER BY customerno, name""",
    "q63_xml_struct" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
             CAST(n_nationkey AS BIGINT) AS k,
             CAST(n_regionkey AS BIGINT) AS r,
             n_name AS nm
      FROM nation ORDER BY n_nationkey""",
    "q61_desc_window" -> """
      SELECT event_id, user_id, rn FROM (
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn <= 2 ORDER BY event_id""",
    "q54_string_protect" -> """
      SELECT c_custkey,
             upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS segment,
             regexp_extract(c_name, 'Customer#0*(\d+)', 1) AS cust_num,
             regexp_replace(c_name, 'Customer#', 'C-', 'g') AS name_short,
             try_strptime(ts_str, '%Y-%m-%d %H:%M:%S') AS ts_parsed,
             sha256('555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) AS phone_token,
             '555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS detokenized
      FROM (SELECT *, CASE WHEN c_custkey % 11 = 0 THEN 'not-a-date'
                           ELSE '2026-0' || CAST(c_custkey % 9 + 1 AS VARCHAR)
                                || '-1' || CAST(c_custkey % 9 AS VARCHAR)
                                || ' 07:3' || CAST(c_custkey % 6 AS VARCHAR) || ':15' END AS ts_str
            FROM customer)
      ORDER BY c_custkey""",
    "q55_nested_structs" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
             CAST(n_nationkey AS BIGINT) AS payload_key_a,
             CAST(n_regionkey AS BIGINT) AS payload_key_b,
             CAST(i AS BIGINT) AS prop_index,
             CASE WHEN i = 1 THEN 'key_a' ELSE 'key_b' END AS prop_key,
             CAST(CASE WHEN i = 1 THEN n_nationkey ELSE n_regionkey END AS BIGINT) AS prop_value
      FROM nation, (SELECT unnest([1, 2]) AS i)
      ORDER BY n_nationkey, prop_index""",
    "q56_policy_expand" -> """
      WITH pol AS (
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS eff,
               (CAST(o_orderdate AS DATE) + to_months(CAST(o_custkey % 12 + 1 AS INT)))::DATE AS exp,
               CAST(round(o_totalprice * 100) AS BIGINT) AS premium_cents
        FROM orders WHERE o_orderkey % 20 = 0),
      m AS (
        SELECT pol.*,
               CASE WHEN (exp + to_months(-1))::DATE < eff THEN exp
                    ELSE (exp + to_months(-1))::DATE END AS prior
        FROM pol),
      mm AS (
        SELECT m.*, datediff('month', date_trunc('month', eff), date_trunc('month', prior)) + 1 AS n_months
        FROM m),
      exp_rows AS (
        SELECT mm.*, CAST(i + 1 AS BIGINT) AS policy_month_index,
               (date_trunc('month', eff) + to_months(CAST(i AS INT)))::DATE AS policy_month_start
        FROM mm, LATERAL (SELECT unnest(range(0,
               datediff('month', date_trunc('month', eff), date_trunc('month', exp)) + 1)) AS i)),
      calc AS (
        SELECT exp_rows.*, last_day(policy_month_start) AS last_day_of_month,
               greatest(policy_month_start, eff) AS cs,
               least(last_day(policy_month_start), exp) AS ce,
               datediff('day', eff, exp) + 1 AS total_days
        FROM exp_rows)
      SELECT o_orderkey, policy_month_index, policy_month_start, last_day_of_month,
             CASE WHEN policy_month_start < eff OR policy_month_start > date_trunc('month', exp)
                  THEN NULL
                  ELSE CAST((2 * premium_cents + n_months) // (2 * n_months) AS DOUBLE) / 100 END AS earned_sl,
             CAST((2 * premium_cents * (datediff('day', cs, ce) + 1) + total_days)
                  // (2 * total_days) AS DOUBLE) / 100 AS earned_byday
      FROM calc
      ORDER BY o_orderkey, policy_month_index""",
    "q11_implieddecimal" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DOUBLE) / 100 AS implied_price
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q12_currency" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(cents AS DOUBLE) / 100 AS usd_amount,
             CAST(cents AS DOUBLE) / 100 AS eur_amount
      FROM (SELECT l_orderkey, l_linenumber, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem)
      ORDER BY l_orderkey, l_linenumber""",
    "q13_protect" -> """
      SELECT c_custkey, sha256(c_name) AS name_hash,
             sha256(COALESCE(CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_mktsegment END, 'None')) AS segment_hash,
             '****' AS acctbal_redacted, 'graft' AS source_system
      FROM customer ORDER BY c_custkey""",
    "q14_combine" -> """
      SELECT c_custkey,
             trim(printf('%s-%s', COALESCE(c_name, ''),
               COALESCE(CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END, ''))) AS combined
      FROM customer ORDER BY c_custkey""",
    "q15_expandarray" -> """
      SELECT p_partkey,
             unnest(range(1, len(string_split(p_name, ' ')) + 1)) AS word_index,
             unnest(string_split(p_name, ' ')) AS word
      FROM part ORDER BY p_partkey, word_index""",
    "q16_json_props" -> """
      SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             count(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q33_sessions" -> """
      WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM marked)
      SELECT user_id, session_id, count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end
      FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""",
    "q17_hourly_events" -> """
      SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q51_snapshot_diff" -> """
      WITH oldsnap AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0),
      newsnap AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders)
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                  WHEN n.o_orderkey IS NULL THEN 'delete'
                  WHEN o.o_orderstatus <> n.o_orderstatus
                    OR o.o_totalprice <> n.o_totalprice THEN 'update'
                  ELSE 'unchanged' END AS change_type
      FROM oldsnap o FULL OUTER JOIN newsnap n ON o.o_orderkey = n.o_orderkey
      WHERE NOT (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                 AND o.o_orderstatus = n.o_orderstatus AND o.o_totalprice = n.o_totalprice)
      ORDER BY o_orderkey""",
    "q48_range_join" -> """
      WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM marked),
      sessions AS (
        SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end
        FROM sess GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, s.session_id
      FROM events e JOIN sessions s
        ON e.user_id = s.user_id AND e.ts BETWEEN s.session_start AND s.session_end
      WHERE e.event_type = 'error'
      ORDER BY e.event_id""",
    "q47_asof_join" -> """
      SELECT p.event_id, p.user_id, v.vts AS last_view_ts
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT user_id, ts AS vts FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND p.ts >= v.vts
      ORDER BY p.event_id""",
    "q45_semi_anti" -> """
      SELECT c_custkey,
             EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_orders
      FROM customer c ORDER BY c_custkey""",
    "q46_percentiles" -> """
      SELECT o_orderstatus,
             round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             round(quantile_cont(o_totalprice, 0.95), 4) AS p95
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q43_rollup" -> """
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""",
    "q44_moving_window" -> """
      SELECT o_custkey, o_orderkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_sum
      FROM orders ORDER BY o_custkey, o_orderkey""",
    "q18_union" -> """
      SELECT event_id, event_type, CASE WHEN value >= 50 THEN 'big' ELSE 'small' END AS slice
      FROM events ORDER BY event_id""",
    "q19_dq_quarantine" -> """
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderstatus IN ('O','F') AND o_totalprice >= 30000 AND o_custkey IS NOT NULL
      ORDER BY o_orderkey""",
  )
}
