package graft

import graft.config.Specs
import graft.config.Specs.NodeOps
import graft.functions.{SimilarityFunctions => S}
import graft.operators.{AsOfJoin, Dedup}
import graft.transforms.{TransformContext, TransformRegistry}
import org.apache.spark.sql.functions._

/** Round-2 additions: exact prefix-filter similarity join, deterministic
  * as-of tiebreak, descending sort dialect, events-reader memoization. */
class Round2OpsSpec extends SparkSpec with PropHelper {
  import spark.implicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  /** Deterministic corpus with many partial token overlaps across 2 blocks. */
  private def corpus = (1 to 40).map { i =>
    val lang = if (i % 2 == 0) "en" else "de"
    val n = 3 + i % 6
    val text = (0 until n).map(k => words((i * 3 + k * 7) % words.length)).mkString(" ")
    (i.toLong, lang, text)
  }.toDF("id", "lang", "text")

  test("jaccardSelfJoin equals the brute-force all-pairs join (100% recall)") {
    val toks = corpus.select($"lang", $"id",
      array_distinct(S.tokens($"text")).as("toks"))
    val a = toks.select($"lang", $"id".as("id_a"), $"toks".as("t_a"))
    val b = toks.select($"lang", $"id".as("id_b"), $"toks".as("t_b"))
    val brute = a.join(b, Seq("lang")).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", S.jaccard($"t_a", $"t_b").as("jaccard"))
      .filter($"jaccard" >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val fast = Dedup.jaccardSelfJoin(toks, "toks", "id", Seq("lang"), 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty, "test corpus should contain near-dup pairs")
    assert(fast == brute)
  }

  test("jaccardSelfJoin equals driver-side brute force on random corpora (property)") {
    import org.scalacheck.{Gen, Prop}
    val vocab = (1 to 30).map(i => s"w$i")
    val gen = for {
      n <- Gen.choose(15, 35)
      docs <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.oneOf(vocab)).map(_.distinct))
      t <- Gen.oneOf(0.3, 0.5, 0.56, 0.7, 0.85)
    } yield (docs, t)
    checkProp(Prop.forAll(gen) { case (docs, t) =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("id", "text")
        .select($"id", array_distinct(S.tokens($"text")).as("toks"))
      val got = Dedup.jaccardSelfJoin(df, "toks", "id", Seq.empty, t)
        .as[(Long, Long, Double)].collect().toSet
      val sets = docs.map(_.toSet).zipWithIndex
      val want = (for {
        (sa, ia) <- sets
        (sb, ib) <- sets if ia < ib
        inter = (sa & sb).size.toDouble
        uni = (sa ++ sb).size.toDouble
        j = if (uni == 0) 0.0 else inter / uni
        if j >= t
      } yield (ia.toLong, ib.toLong, j)).toSet
      got == want
    }, tests = 8)
  }

  test("jaccardSelfJoin recall survives FP-hostile thresholds (25*0.56 rounds above 14)") {
    // A has 25 tokens, B the last 14 of them in the canonical order:
    // J(A,B) = 14/25 = 0.56 exactly. A naive ceil(t*sz) computes
    // ceil(14.000000000000002) = 15 → prefix one token short → pair missed.
    val ts = (1 to 25).map(i => f"t$i%02d")
    val df = Seq(
      (1L, ts.mkString(" ")),
      (2L, ts.drop(11).mkString(" "))).toDF("id", "text")
      .select($"id", array_distinct(S.tokens($"text")).as("toks"))
    val pairs = Dedup.jaccardSelfJoin(df, "toks", "id", Seq.empty, 0.56)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 0.56)))
  }

  test("jaccardCrossJoin (decontamination) equals the brute-force cross join") {
    val toks = corpus.select($"lang", $"id", array_distinct(S.tokens($"text")).as("toks"))
    val l = toks.filter($"id" % 3 =!= 0)
    val r = toks.filter($"id" % 3 === 0)
    val brute = l.select($"lang", $"id".as("id_l"), $"toks".as("t_l"))
      .join(r.select($"lang", $"id".as("id_r"), $"toks".as("t_r")), Seq("lang"))
      .select($"id_l", $"id_r", S.jaccard($"t_l", $"t_r").as("jaccard"))
      .filter($"jaccard" >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val fast = Dedup.jaccardCrossJoin(l, r, "toks", "id", Seq("lang"), 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty, "test corpus should contain cross near-dups")
    assert(fast == brute)
  }

  test("jaccardSelfJoin never pairs across blocks") {
    val df = Seq((1L, "en", "alpha beta gamma"), (2L, "de", "alpha beta gamma"))
      .toDF("id", "lang", "text")
      .select($"lang", $"id", array_distinct(S.tokens($"text")).as("toks"))
    assert(Dedup.jaccardSelfJoin(df, "toks", "id", Seq("lang"), 0.5).isEmpty)
  }

  test("jaccardDedup drops the higher id of each near-dup pair") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different words entirely")).toDF("doc_id", "text")
    val kept = Dedup.jaccardDedup(df, "text", "doc_id", shingleN = 1, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("dedupPipeline exactVerify reports a 'jaccard' stage and matches the LSH recipe here") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, base),
      (2L, base),                    // exact dup
      (3L, "  " + base.toUpperCase), // fingerprint dup
      (4L, base + " extra"),         // near-dup
      (5L, "entirely different content about distributed query engines")
    ).toDF("doc_id", "text")
    val (survivors, report) = Dedup.dedupPipeline(df, "text", "doc_id",
      shingleN = 2, threshold = 0.5, exactVerify = true)
    assert(survivors.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
    assert(report.map(s => (s.stage, s.docsIn, s.docsOut)) ==
      Seq(("exact", 5L, 4L), ("fingerprint", 4L, 3L), ("jaccard", 3L, 2L)))
    survivors.unpersist()
  }

  test("asof join picks a deterministic winner among identical right timestamps") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    def run(rows: Seq[(Long, Long, String)], parts: Int): String = {
      val right = rows.toDF("k", "rt", "v").repartition(parts)
      AsOfJoin.asof(left, right, Seq("k"), "t", "rt", Seq("v"))
        .select("v").as[String].head()
    }
    val winners = Seq(
      run(Seq((1L, 5L, "x"), (1L, 5L, "y")), 1),
      run(Seq((1L, 5L, "y"), (1L, 5L, "x")), 1),
      run(Seq((1L, 5L, "x"), (1L, 5L, "y")), 3),
      run(Seq((1L, 5L, "y"), (1L, 5L, "x")), 4))
    assert(winners.distinct.size == 1, s"nondeterministic winners: $winners")
  }

  test("rownumber registry dialect accepts 'field desc'") {
    val df = Seq(("a", 1L), ("a", 3L), ("a", 2L), ("b", 9L)).toDF("g", "v")
    val spec = Specs.parseJson(
      """{"rownumber": [{"field": "rn", "partition": ["g"], "sort": ["v desc"]}]}""")
    val out = TransformRegistry.applyAll(df, spec.objFields, TransformContext(spark))
    val got = out.select("g", "v", "rn").as[(String, Long, Int)].collect().toSet
    assert(got == Set(("a", 3L, 1), ("a", 2L, 2), ("a", 1L, 3), ("b", 9L, 1)))
  }

  test("filldown registry dialect accepts 'field desc' (fills from the later row)") {
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("z")))
      .toDF("seq", "v")
    val spec = Specs.parseJson(
      """{"filldown": [{"field": "v", "sort": ["seq desc"]}]}""")
    val out = TransformRegistry.applyAll(df, spec.objFields, TransformContext(spark))
    val got = out.select("seq", "v").as[(Long, String)].collect().toMap
    // descending order: seq 2 takes the last non-null AT OR AFTER it → "z"
    assert(got == Map(1L -> "x", 2L -> "z", 3L -> "z"))
  }

  test("events reader memoizes per (session, dir) and restores the conf") {
    val dir = "/root/testdata/sf0.001"
    // getOption surfaces the registered DEFAULT ("false") for SQLConf entries
    val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    assert(!prior.contains("true"))
    val d1 = graft.queries.Tables(spark, dir, "events")
    val d2 = graft.queries.Tables(spark, dir, "events")
    assert(d1 eq d2) // memoized plan, no second conf flip
    assert(d1.count() > 0)
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") == prior)
  }
}
