package graft

import graft.config.Specs
import graft.pipeline.{JobArgs, PipelineRunner}
import graft.stores.LookupStore
import graft.transforms.TransformContext
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Dialect-parity proof: run the REFERENCE's own shipped config files —
  * transformation-spec JSON, mapping CSV (BOM + fuzzy row), sample data CSV —
  * through our pipeline verbatim (read at runtime from /root/reference,
  * nothing copied). The WrittenPolicyData spec chains a dozen transforms:
  * date/timestamp/changetype/redact/lookup×2/enddate/policymonths×2/
  * expandpolicymonths/earnedpremium×2/flipsign/combinecolumns/literal. */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  private val refSpec =
    "/root/reference/lib/glue_scripts/transformation-spec/SyntheticGeneralData-WrittenPolicyData.json"
  private val refMapping =
    "/root/reference/lib/glue_scripts/transformation-spec/SyntheticGeneralData-WrittenPolicyData.csv"
  private val refCsv = "/root/reference/resources/syntheticgeneral-writtenpolicies.csv"

  test("the reference's WrittenPolicyData spec + mapping run unmodified end to end") {
    assume(Files.exists(Paths.get(refSpec)), "reference repo not mounted")
    val spec = Specs.datasetSpec(Specs.readJsonFile(refSpec))
    val mapping = Specs.mappingCsv(Files.readString(Paths.get(refMapping)))
    val db = s"refparity${System.nanoTime()}"
    val args = JobArgs("SyntheticGeneralData", "writtenpolicydata", refCsv,
      "ref-parity", Map("year" -> "2026", "month" -> "08", "day" -> "12"), db,
      environment = "Dev")
    val ctx = TransformContext(spark, filename = "syntheticgeneral-writtenpolicies.csv",
      lookupStore = LookupStore.inMemory(Map(
        "LOB" -> Map("GL" -> "General Liability", "WC" -> "Workers Compensation"),
        "StateCd" -> Map("CA" -> "California", "NY" -> "New York", "TX" -> "Texas"))))

    val out = new PipelineRunner(spark).collectToCleanse(args, spec, mapping, Map.empty, ctx)

    val nRows = spark.read.option("header", "true").csv(refCsv).count()
    assert(out.select("policynumber").distinct().count() == nRows)
    // expandpolicymonths: one row per policy month → more rows than policies
    assert(out.count() > nRows)
    // fuzzy mapping row: NewRenewal →(ratio 90) NewOrRenewal column mapped
    assert(out.columns.map(_.toLowerCase).contains("neworrenewal"))
    // dropped column (ProducerProfitCenterID,Null) is gone
    assert(!out.columns.map(_.toLowerCase).contains("producerprofitcenterid"))
    val row = out.filter(col("policymonthindex") === 1).head()
    def get(name: String) = row.getAs[Any](row.schema.fieldNames.indexWhere(_.equalsIgnoreCase(name)))
    // redaction applied
    assert(get("InsuredEIN") == "****" && get("InsuredContactEmail") == "****")
    // typed conversions
    assert(out.schema.find(_.name.equalsIgnoreCase("writtenpremiumamount"))
      .get.dataType == DecimalType(10, 2))
    assert(out.schema.find(_.name.equalsIgnoreCase("effectivedate")).get.dataType == DateType)
    // derived premium math present and sane: byday earned premium ≤ written
    val sane = out.filter(col("earnedpremium").isNotNull)
      .filter(col("earnedpremium").cast("double") > col("writtenpremiumamount").cast("double") + 0.01)
    assert(sane.isEmpty)
    // combinecolumns rowkey "LOB-policy-date"
    assert(get("RowKey").toString.split("-").length >= 3)
    // literal
    assert(get("policyinforce").toString.toDouble == 1.0)
    // lookup with nomatch fill
    assert(out.select(col("lob")).distinct().count() >= 1)
  }
}
