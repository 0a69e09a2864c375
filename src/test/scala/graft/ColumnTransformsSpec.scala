package graft

import graft.functions.{ColumnTransforms => C}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Unit specs mirroring the reference's transform tests
  * (test/test_datatransform_typeconversion.py, _premium.py, _dataprotection.py,
  * _stringmanipulation.py, _misc.py). */
class ColumnTransformsSpec extends SparkSpec {
  import spark.implicits._

  test("parseDate / parseTimestamp honor source patterns") {
    val df = Seq(("2024/1/5", "12/31/2023 23:59:58")).toDF("d", "t")
    val out = df.select(
      C.parseDate($"d", "yyyy/M/d").as("d"),
      C.parseTimestamp($"t", "MM/dd/yyyy HH:mm:ss").as("t")).head()
    assert(out.getDate(0).toString == "2024-01-05")
    assert(out.getTimestamp(1).toString == "2023-12-31 23:59:58.0")
  }

  test("changeType casts to DDL type; json serializes") {
    val df = Seq((("a", 1), "12.345")).toDF("s", "n")
    val row = df.select(
      C.changeType($"n", "decimal(10,2)").as("dec"),
      C.changeType($"s", "json").as("j")).head()
    assert(row.getDecimal(0).toString == "12.35")
    assert(row.getString(1) == """{"_1":"a","_2":1}""")
  }

  test("impliedDecimal splits trailing digits incl. negatives") {
    val df = Seq("12345", "-9808", "7").toDF("v")
    val got = df.select(C.impliedDecimal($"v", 2).cast("string").as("d")).as[String].collect()
    assert(got.toSeq == Seq("123.45", "-98.08", null)) // "7" fails the regex → null
  }

  test("currency strips US and euro formats") {
    val df = Seq(("$1,234,567.89", "5.000.000,12"), ("  $88.10", "-1.234,50")).toDF("us", "eu")
    val got = df.select(
      C.currency($"us").cast("string").as("us"),
      C.currency($"eu", euro = true).cast("string").as("eu"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("1234567.89", "5000000.12"), ("88.10", "-1234.50")))
  }

  test("combineColumns: nulls become empty, result trimmed") {
    val df = Seq(("a", Some("b")), ("x", None)).toDF("c1", "c2")
    val got = df.select(C.combineColumns("%s-%s", Seq($"c1", $"c2")).as("c"))
      .as[String].collect().toSeq
    assert(got == Seq("a-b", "x-"))
  }

  test("mergeColumns coalesces with empty-string-as-null option") {
    val df = Seq((Some(""), Some("v1")), (None, Some("v2")), (Some("keep"), Some("v3")))
      .toDF("a", "b")
    val got = df.select(C.mergeColumns(Seq($"a", $"b"), Some(lit("dflt")),
      emptyStringIsNull = true).as("m")).as[String].collect().toSeq
    assert(got == Seq("v1", "v2", "keep"))
  }

  test("addColumns/multiplyColumns are null-safe; flipSign negates") {
    val df = Seq((Some(2.0), Some(3.0)), (None, Some(4.0))).toDF("a", "b")
    val got = df.select(
      C.addColumns(Seq($"a", $"b")).as("s"),
      C.multiplyColumns(Seq($"a", $"b")).as("p"),
      C.flipSign($"b").as("f")).as[(Double, Double, Double)].collect().toSeq
    assert(got == Seq((5.0, 6.0, -3.0), (4.0, 4.0, -4.0)))
  }

  test("endDate adds months; policyMonths normalized counts calendar months") {
    val df = Seq(("2024-01-31", "2024-03-01")).toDF("s", "e")
      .select($"s".cast("date").as("s"), $"e".cast("date").as("e"))
    val row = df.select(
      C.endDate($"s", lit(1)).as("end"),
      C.policyMonths($"s", $"e", normalized = true).as("norm"),
      C.policyMonths($"s", $"e").as("frac")).head()
    assert(row.getDate(0).toString == "2024-02-29") // month-end clamp
    assert(row.getInt(1) == 2)                      // floor-style: Jan, Feb
    assert(row.getDecimal(2).toString == "1.03")    // months_between fraction
  }

  test("sha256Hash hashes str(value) with null→'None' (reference parity)") {
    val df = Seq(Some("abc"), None).toDF("v")
    val got = df.select(C.sha256Hash($"v").as("h")).as[String].collect().toSeq
    val expAbc = java.security.MessageDigest.getInstance("SHA-256")
      .digest("abc".getBytes).map("%02x".format(_)).mkString
    val expNone = java.security.MessageDigest.getInstance("SHA-256")
      .digest("None".getBytes).map("%02x".format(_)).mkString
    assert(got == Seq(expAbc, expNone))
  }

  test("earnedPremium straight-line and by-day") {
    val df = Seq((1200.0, 12)).toDF("prem", "months")
      .withColumn("eff", lit("2024-01-01").cast("date"))
      .withColumn("exp", lit("2024-12-31").cast("date"))
      .withColumn("ps", lit("2024-01-01").cast("date"))
      .withColumn("pe", lit("2024-01-31").cast("date"))
    val row = df.select(
      C.earnedPremiumStraightLine($"prem", $"eff", $"exp", $"ps", $"pe").as("sl"),
      C.earnedPremiumByDay($"prem", $"ps", $"pe", $"eff", $"exp").as("bd"),
      C.earnedPremiumStraightLine($"prem", $"eff", $"exp", $"ps",
        org.apache.spark.sql.functions.lit("2026-06-30").cast("date")).as("outside")).head()
    // reference floor months: Jan1..Dec31 normalizes to 11 months
    assert(row.getDecimal(0).toString == "109.09")
    assert(row.getDecimal(1).toString == "101.64") // 31/366 * 1200
    assert(row.isNullAt(2)) // period beyond the policy term → NULL
  }

  test("cleanNullTypes casts NullType columns to string") {
    val df = spark.sql("SELECT 1 AS a, NULL AS n")
    val fixed = C.cleanNullTypes(df)
    assert(fixed.schema("n").dataType == org.apache.spark.sql.types.StringType)
  }
}
