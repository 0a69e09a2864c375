package graft

import graft.config.Specs
import graft.config.Specs.NodeOps
import graft.stores.LookupStore
import graft.transforms.{TransformContext, TransformRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drives the config-keyed dispatch itself (the reference's core surface):
  * every registry key at least once through a transform_spec JSON, with the
  * reference's exact spec-field names (all-transforms-example.json). */
class TransformRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def ctx = TransformContext(spark,
    filename = "program-20240115.csv",
    lookupStore = LookupStore.inMemory(
      values = Map("statecd" -> Map("CA" -> "California")),
      multis = Map("LOBCoverage" -> Seq(("gen-auto", "Auto", "General"))
        .toDF("lookup_item", "coveragenormalized", "lob"))))

  test("every scalar/window/lookup transform dispatches through its spec dialect") {
    val df = Seq(
      ("P1", "2/5/24", "2024-01-01 10:00:00", "123456", "$1,200.50", "1.234,56",
        "john smith", "CA", "gen", "auto", Some(10.0), Some(2.0), "a@b.com",
        "  x  ", "2024-01-01", 12, 100.0, "7")
    ).toDF("policy", "startdate", "gendate", "cents", "usd", "eur",
      "name", "state", "program", "coverage", "amt1", "amt2", "email",
      "padded", "effdate", "term", "premium", "numstr")

    val spec = Specs.datasetSpec(Specs.parseJson(
      """{
        "transform_spec": {
          "filename": [{"field": "valuationdate", "pattern": "\\S+-(\\d{8})\\.csv", "required": true}],
          "columnfromcolumn": [{"field": "username", "source": "email", "pattern": "(\\S+)@\\S+"}],
          "columnreplace": [{"field": "policy", "pattern": "^P", "replacement": "POL-"}],
          "date": [{"field": "startdate", "format": "M/d/yy"}],
          "date:2": [{"field": "effdate", "format": "yyyy-MM-dd"}],
          "timestamp": [{"field": "gendate", "format": "yyyy-MM-dd HH:mm:ss"}],
          "changetype": {"premium": "decimal(10,2)"},
          "implieddecimal": [{"field": "cents", "num_implied": "2", "format": "16,2"}],
          "currency": [{"field": "usd"}, {"field": "eurval", "source": "eur", "euro": true}],
          "titlecase": ["name"],
          "redact": {"state_raw": "****"},
          "hash": ["email"],
          "lookup": [{"field": "statename", "source": "state", "lookup": "statecd", "nomatch": "N/A"}],
          "multilookup": [{"lookup_group": "LOBCoverage",
            "match_columns": ["program", "coverage"],
            "return_attributes": ["coveragenormalized", "lob"], "nomatch": "N/A"}],
          "merge": [{"field": "merged_amt", "source_list": ["amt1", "amt2"], "default": "0"}],
          "literal": {"source_system": "unit"},
          "addcolumns": [{"field": "total", "source_columns": ["amt1", "amt2"]}],
          "multiplycolumns": [{"field": "product", "source_columns": ["amt1", "amt2"]}],
          "flipsign": [{"field": "neg_total", "source": "total"}],
          "enddate": [{"field": "calc_end", "start_date": "effdate", "num_months": "term"}],
          "policymonths": [{"field": "months", "policy_effective_date": "effdate",
            "policy_expiration_date": "calc_end", "normalized": true}],
          "earnedpremium": [{"field": "earned", "written_premium_list": ["premium"],
            "policy_effective_date": "effdate", "policy_expiration_date": "calc_end",
            "period_start_date": "effdate", "period_end_date": "effdate"}],
          "combinecolumns": [{"field": "rowkey", "format": "{}-{}",
            "source_columns": ["policy", "state"]}],
          "filterrows": [{"condition": "amt1 is not null"}]
        }
      }"""))

    // redact requires the column to exist
    val withRaw = df.withColumn("state_raw", col("state"))
    val out = TransformRegistry.applyAll(withRaw, spec.transformSpec, ctx)
    val row = out.head()

    assert(row.getAs[String]("valuationdate") == "20240115")
    assert(row.getAs[String]("username") == "a")
    assert(row.getAs[String]("policy") == "POL-1")
    assert(row.getAs[java.sql.Date]("startdate").toString == "2024-02-05")
    assert(row.getAs[java.sql.Timestamp]("gendate").toString.startsWith("2024-01-01 10:00"))
    assert(out.schema("premium").dataType == DecimalType(10, 2))
    assert(row.getAs[java.math.BigDecimal]("cents").toString == "1234.56")
    assert(row.getAs[java.math.BigDecimal]("usd").toString == "1200.50")
    assert(row.getAs[java.math.BigDecimal]("eurval").toString == "1234.56")
    assert(row.getAs[String]("name") == "John Smith")
    assert(row.getAs[String]("state_raw") == "****")
    assert(row.getAs[String]("email").length == 64) // sha256 hex
    assert(row.getAs[String]("statename") == "California")
    assert(row.getAs[String]("coveragenormalized") == "Auto")
    assert(row.getAs[String]("lob") == "General")
    assert(row.getAs[Double]("merged_amt") == 10.0)
    assert(row.getAs[String]("source_system") == "unit")
    assert(row.getAs[Double]("total") == 12.0)
    assert(row.getAs[Double]("product") == 20.0)
    assert(row.getAs[Double]("neg_total") == -12.0)
    assert(row.getAs[java.sql.Date]("calc_end").toString == "2025-01-01")
    assert(row.getAs[Int]("months") == 12)
    assert(row.getAs[java.math.BigDecimal]("earned").doubleValue() > 0)
    assert(row.getAs[String]("rowkey") == "POL-1-CA")
    assert(out.count() == 1)
  }

  test("generator transforms dispatch: expandarray/expandmap/flatten/json/expandpolicymonths") {
    val df = spark.sql(
      """SELECT 1 AS id,
               array('a','b') AS tags,
               named_struct('x', 10, 'y', 20) AS kv,
               named_struct('p', 1, 'q', 2) AS nest,
               '{"k": 5}' AS js,
               CAST('2024-01-01' AS DATE) AS eff,
               CAST('2024-02-15' AS DATE) AS exp""")
    val spec = Specs.datasetSpec(Specs.parseJson(
      """{
        "transform_spec": {
          "jsonexpandarray": [{"field": "tags", "index_field": "tag_idx"}],
          "jsonexpandmap": [{"field": "kv", "index_field": "kv_idx", "key_field": "kv_key"}],
          "flatten": [{"field": "nest"}],
          "json": [{"field": "js"}],
          "expandpolicymonths": {
            "policy_effective_date": "eff", "policy_expiration_date": "exp",
            "policy_month_start_field": "month_start",
            "policy_month_end_field": "month_end",
            "policy_month_index": "month_idx"}
        }
      }"""))
    val out = TransformRegistry.applyAll(df, spec.transformSpec, ctx)
    // 2 tags × 2 kv entries × 2 policy months = 8 rows
    assert(out.count() == 8)
    assert(out.columns.contains("tag_idx") && out.columns.contains("kv_key"))
    assert(out.columns.contains("nest_p") && out.columns.contains("nest_q"))
    assert(out.select(col("js.k")).distinct().as[Long].head() == 5L)
    assert(out.select(max(col("month_idx"))).as[Int].head() == 2)
    assert(out.select(max(col("month_end"))).as[java.sql.Date].head().toString == "2024-02-29")
  }

  test("user-supplied transforms dispatch by name and shadow built-ins") {
    val df = Seq(("p1", 2.0)).toDF("policy", "amt")
    val double_amt: TransformRegistry.Transform = (d, spec, _) =>
      d.withColumn(spec.str("field").get, col(spec.str("field").get) * 2)
    // a user transform can also shadow a built-in name ("literal")
    val literalUpper: TransformRegistry.Transform = (d, spec, _) =>
      d.withColumns(spec.objFields.map { case (c, v) => c -> lit(v.asText.toUpperCase) }.toMap)
    val spec = Specs.datasetSpec(Specs.parseJson(
      """{"transform_spec": {
           "double_amt": {"field": "amt"},
           "double_amt:2": {"field": "amt"},
           "literal": {"src": "unit"}
         }}"""))
    val out = TransformRegistry.applyAll(df, spec.transformSpec, ctx,
      extra = Map("double_amt" -> double_amt, "literal" -> literalUpper))
    val row = out.head()
    assert(row.getAs[Double]("amt") == 8.0) // applied twice via the :suffix reuse convention
    assert(row.getAs[String]("src") == "UNIT") // user version won over the built-in
    // without the extra map the same spec is an unknown-transform error
    val e = intercept[IllegalArgumentException] {
      TransformRegistry.applyAll(df, spec.transformSpec, ctx)
    }
    assert(e.getMessage.contains("no registered function"))
  }

  test("unknown transform key raises the reference's error message") {
    val spec = Specs.datasetSpec(Specs.parseJson("""{"transform_spec": {"bogus": []}}"""))
    val e = intercept[IllegalArgumentException] {
      TransformRegistry.applyAll(Seq(1).toDF("x"), spec.transformSpec, ctx)
    }
    assert(e.getMessage.contains("no registered function"))
  }

  test("droprepeatedlines scrubs via the config dialect, in place or to a target") {
    val df = Seq((1L, "h\nb\nh\nt")).toDF("id", "text")
    val spec = Specs.datasetSpec(Specs.parseJson(
      """{"transform_spec": {"droprepeatedlines": [{"field": "text", "target": "clean"}]}}"""))
    val out = TransformRegistry.applyAll(df, spec.transformSpec, ctx)
    assert(out.select("clean").as[String].head() == "h\nb\nt")
    assert(out.select("text").as[String].head() == "h\nb\nh\nt")
    val spec2 = Specs.datasetSpec(Specs.parseJson(
      """{"transform_spec": {"droprepeatedlines": [{"field": "text"}]}}"""))
    val out2 = TransformRegistry.applyAll(df, spec2.transformSpec, ctx)
    assert(out2.select("text").as[String].head() == "h\nb\nt")
  }

  test("filterrows + registered SQL kernels = config-driven quality filtering") {
    GraftExtensions.register(spark)
    val df = Seq(
      (1L, "good line\nother line"),          // no repeated lines -> kept
      (2L, "dup\ndup\ndup\ndup")            // 75% duplicate lines -> dropped
    ).toDF("id", "text")
    val spec = Specs.datasetSpec(Specs.parseJson(
      """{"transform_spec": {"filterrows": [{"condition":
           "(line_stats(text)[0] - line_stats(text)[1]) / CAST(line_stats(text)[0] AS DOUBLE) <= 0.3"}]}}"""))
    val out = TransformRegistry.applyAll(df, spec.transformSpec, ctx)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
  }
}
