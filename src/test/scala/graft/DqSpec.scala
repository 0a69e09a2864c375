package graft

import graft.dq.{Dqdl, DqEngine}
import org.apache.spark.sql.functions._

class DqdlParserSpec extends SparkSpec {

  test("parses every shipped reference rule") {
    val shipped = Seq(
      """ColumnValues 'StartDate' matches '\d{1,2}/\d{1,2}/\d\d'""",
      """ColumnDataType 'EffectiveDate' = 'DATE'""",
      """Completeness 'EarnedPremium' > 0.80""",
      """ColumnValues "WrittenPremiumAmount" >= 0""",
      """ColumnValues 'WrittenPremiumAmount' < 10000000""",
      """ColumnValues 'NewOrRenewal' in [ 'New', 'Renewal' ]""",
      """(ColumnExists 'StartDate') and (IsComplete 'StartDate')""",
      """CustomSql 'SELECT COUNT(*) FROM primary WHERE EffectiveDate > ExpirationDate' = 0""",
      """CustomSql 'SELECT PolicyNumber FROM primary WHERE amt <= lim OR amt is null'""",
    )
    shipped.foreach(r => Dqdl.parse(r)) // must not throw
  }

  test("parse shapes") {
    import Dqdl._
    assert(parse("ColumnValues 'x' between 1 and 5") ==
      Leaf(ColumnValues("x", Between(1, 5))))
    assert(parse("RowCount > 0") == Leaf(RowCount(">", 0)))
    assert(parse("(IsUnique 'a') or (IsComplete 'b')") ==
      Or(Leaf(IsUnique("a")), Leaf(IsComplete("b"))))
  }
}

class DqEngineSpec extends SparkSpec {
  import spark.implicits._
  private def engine = new DqEngine()

  private def df = Seq(
    (1, Some(100.0), "New", "2024-01-01"),
    (2, Some(-5.0), "Renewal", "2024-02-30"), // bad amount, bad date
    (3, None, "Other", "2024-03-01")          // null amount, bad category
  ).toDF("id", "amount", "kind", "d")

  test("dataset evaluation: completeness, values, datatype, exists") {
    val out = engine.evaluateDataset(df, Seq(
      "Completeness 'amount' > 0.5",
      "ColumnValues 'amount' >= 0",
      "ColumnValues 'kind' in ['New','Renewal']",
      "ColumnDataType 'd' = 'DATE'",
      "(ColumnExists 'id') and (IsComplete 'id')",
      "ColumnExists 'missing'",
      "RowCount > 2",
      "IsUnique 'id'"))
    val byRule = out.map(o => o.rule -> o.passed).toMap
    assert(byRule("Completeness 'amount' > 0.5"))        // 2/3 non-null
    assert(!byRule("ColumnValues 'amount' >= 0"))        // -5 and null fail
    assert(!byRule("ColumnValues 'kind' in ['New','Renewal']"))
    assert(!byRule("ColumnDataType 'd' = 'DATE'"))       // 2024-02-30 invalid
    assert(byRule("(ColumnExists 'id') and (IsComplete 'id')"))
    assert(!byRule("ColumnExists 'missing'"))
    assert(byRule("RowCount > 2"))
    assert(byRule("IsUnique 'id'"))
  }

  test("CustomSql scalar comparator") {
    val out = engine.evaluateDataset(df, Seq(
      "CustomSql 'SELECT COUNT(*) FROM primary WHERE amount < 0' = 0"))
    assert(!out.head.passed)
    assert(out.head.metric.contains(1.0))
  }

  test("quarantine splits rows and stamps quarantine_timestamp") {
    val res = engine.runQuarantine(df, Seq(
      "ColumnValues 'amount' >= 0",
      "ColumnValues 'kind' in ['New','Renewal']"))
    assert(res.passed.select("id").as[Int].collect().toSeq == Seq(1))
    assert(res.failed.select("id").as[Int].collect().sorted.toSeq == Seq(2, 3))
    assert(res.failed.columns.contains("quarantine_timestamp"))
  }

  test("quarantine CustomSql row-level keeps only returned keys") {
    val res = engine.runQuarantine(df, Seq(
      "CustomSql 'SELECT id FROM primary WHERE amount IS NOT NULL'"))
    assert(res.passed.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(res.failed.select("id").as[Int].collect().toSeq == Seq(3))
  }

  test("quarantine throws when all rows fail; halt throws on any failure") {
    intercept[RuntimeException] {
      engine.runQuarantine(df, Seq("ColumnValues 'id' > 100"))
    }
    intercept[RuntimeException] {
      engine.runHalt(df, Seq("IsComplete 'amount'"))
    }
  }

  test("runRuleset: warn does not filter, quarantine does, halt sees pre-quarantine frame") {
    // halt rule passes on the ORIGINAL frame (row id=2 has amount<0 but
    // completeness on the original is 2/3 > 0.5); quarantine then removes rows
    val out = engine.runRuleset(df, Map(
      "warn_rules" -> Seq("ColumnValues 'amount' >= 0"),
      "quarantine_rules" -> Seq("ColumnValues 'kind' in ['New','Renewal']"),
      "halt_rules" -> Seq("Completeness 'amount' > 0.5")))
    assert(out.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("empty frame: value rules pass vacuously") {
    val empty = df.filter(lit(false))
    val out = engine.evaluateDataset(empty, Seq("ColumnValues 'amount' >= 0"))
    assert(out.head.passed)
  }
}

class DqAggRulesSpec extends SparkSpec {
  import spark.implicits._
  private def engine = new graft.dq.DqEngine()

  private val df = Seq((1, 10.0, "ab"), (2, 20.0, "abcd"), (3, 30.0, "ab"))
    .toDF("id", "v", "s")

  test("Mean/Sum/StandardDeviation/DistinctValuesCount/Uniqueness rules") {
    val out = engine.evaluateDataset(df, Seq(
      "Mean 'v' = 20",
      "Sum 'v' >= 60",
      "StandardDeviation 'v' < 10",
      "DistinctValuesCount 's' = 2",
      "Uniqueness 'id' = 1",
      "Uniqueness 's' < 1"))
    val m = out.map(o => o.rule -> o.passed).toMap
    assert(m("Mean 'v' = 20") && m("Sum 'v' >= 60"))
    assert(m("StandardDeviation 'v' < 10")) // pop stddev = 8.165
    assert(m("DistinctValuesCount 's' = 2"))
    assert(m("Uniqueness 'id' = 1") && m("Uniqueness 's' < 1"))
  }

  test("ColumnLength is row-level quarantineable") {
    val res = engine.runQuarantine(df, Seq("ColumnLength 's' <= 3"))
    assert(res.passed.select("id").as[Int].collect().sorted.toSeq == Seq(1, 3))
    assert(res.failed.select("id").as[Int].collect().toSeq == Seq(2))
  }
}

class DqMultiCustomSqlSpec extends SparkSpec {
  import spark.implicits._

  test("two row-level CustomSql quarantine rules compose (intersection of keys)") {
    val df = Seq((1, 10.0, "x"), (2, -1.0, "x"), (3, 10.0, null.asInstanceOf[String]))
      .toDF("id", "amount", "tag")
    val res = new graft.dq.DqEngine().runQuarantine(df, Seq(
      "CustomSql 'SELECT id FROM primary WHERE amount >= 0'",
      "CustomSql 'SELECT id FROM primary WHERE tag IS NOT NULL'"))
    assert(res.passed.select("id").as[Int].collect().toSeq == Seq(1))
    assert(res.failed.select("id").as[Int].collect().sorted.toSeq == Seq(2, 3))
    assert(!res.passed.columns.exists(_.startsWith("__dq")))
  }
}

class DqResultsSpec extends SparkSpec {
  import spark.implicits._

  test("runRuleset records per-tier outcomes; writeResults persists them") {
    val df = Seq((1, 5.0), (2, -1.0)).toDF("id", "v")
    val engine = new graft.dq.DqEngine()
    engine.runRuleset(df, Map(
      "warn_rules" -> Seq("ColumnValues 'v' >= 0"),
      "quarantine_rules" -> Seq("ColumnValues 'v' >= 0")), "t1")
    val log = engine.resultsLog
    assert(log.map(_._2).toSet == Set("warn", "quarantine"))
    assert(log.forall(_._1 == "t1"))
    val out = java.nio.file.Files.createTempDirectory("dqres").toString + "/results"
    engine.writeResults(spark, out)
    val stored = spark.read.parquet(out)
    assert(stored.count() == 2)
    assert(stored.columns.contains("failure_reason"))
  }
}

class DqNullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("NULL predicate rows land in FAILED, never vanish from the split") {
    val df = Seq((1, Some(5.0)), (2, None), (3, Some(-1.0))).toDF("id", "amount")
    val res = new graft.dq.DqEngine().runQuarantine(df, Seq("ColumnValues 'amount' > 0"))
    assert(res.passed.select("id").as[Int].collect().toSeq == Seq(1))
    assert(res.failed.select("id").as[Int].collect().sorted.toSeq == Seq(2, 3))
    assert(res.passed.count() + res.failed.count() == 3) // nothing lost
  }

  test("all-NULL column reports 0% compliance, not a vacuous pass") {
    val df = Seq((1, Option.empty[String]), (2, Option.empty[String])).toDF("id", "v")
    val out = new graft.dq.DqEngine().evaluateDataset(df, Seq("ColumnValues 'v' matches '\\d+'"))
    assert(!out.head.passed)
    assert(out.head.metric.contains(0.0))
  }

  test("CustomSql comparator on empty result fails cleanly instead of throwing") {
    val df = Seq((1, 5.0)).toDF("id", "v")
    val out = new graft.dq.DqEngine().evaluateDataset(df, Seq(
      "CustomSql 'SELECT v FROM primary WHERE v > 100' >= 1"))
    assert(!out.head.passed)
  }

  test("BETWEEN keyword is case-insensitive") {
    graft.dq.Dqdl.parse("ColumnValues 'x' BETWEEN 1 AND 5")
    graft.dq.Dqdl.parse("ColumnValues 'x' Between 1 and 5")
  }
}
