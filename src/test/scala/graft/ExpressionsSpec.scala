package graft

/** The deterministic LCG behind the hyperplane/centroid family is the
  * CONTRACT every DuckDB replay oracle re-implements in SQL (q29, q30, q41,
  * q89, q90 — HUGEINT modular arithmetic). Any drift here silently breaks
  * all of those green rows at the next correctness run — pin exact values so
  * the failure happens HERE with a pointed message instead. */
class LcgPinSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.functions.expressions.HashExpressions.planeComponent
  test("planeComponent values are frozen (the replay oracles depend on them)") {
    val pinned = Seq(
      (0, 0) -> 0.061541183670951405,
      (7, 63) -> -0.024029225225165263,
      (100, 0) -> 2.3467313190032315,
      (115, 63) -> -0.7560238790663028,
      (200, 31) -> 0.6190397833918504)
    pinned.foreach { case ((p, d), v) =>
      assert(planeComponent(p, d) == v,
        s"planeComponent($p,$d) drifted — q29/q30/q41/q89/q90 DuckDB oracles replay " +
          "this LCG bit-for-bit; update them together or revert")
    }
  }
}

import graft.functions.{SimilarityFunctions => S}
import graft.functions.expressions.HashExpressions
import graft.operators.Ann
import org.apache.spark.sql.functions._

/** Cross-checks: each native Catalyst expression must produce EXACTLY the
  * values of its pure-built-in (HOF) formulation on real data. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = sf("documents").limit(100)
  private lazy val embs = sf("embeddings").limit(100)

  test("minhash signature expression == HOF formulation") {
    val cmp = docs.select(
      S.minHashSignature(S.wordShingles(col("text"), 2), 32).as("fast"),
      S.minHashSignatureHof(S.wordShingles(col("text"), 2), 32).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("simhash expression == HOF formulation") {
    val cmp = docs.select(
      S.simHash64(S.tokens(col("text"))).as("fast"),
      S.simHash64Hof(S.tokens(col("text"))).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("hyperplane bucket expression == HOF formulation") {
    val cmp = embs.select(
      Ann.hyperplaneBucket(col("embedding"), 64, 12).as("fast"),
      Ann.hyperplaneBucketHof(col("embedding"), 64, 12).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("dot product expression == HOF formulation, bit for bit") {
    val a = embs.select(col("vec_id"), col("embedding").as("e1"))
    val b = embs.select(col("vec_id"), col("embedding").as("e2"))
    val cmp = a.join(b, "vec_id")
      .select(S.dot(col("e1"), col("e2")).as("fast"), S.dotHof(col("e1"), col("e2")).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("dot product handles double arrays too") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    assert(df.select(S.dot(col("a"), col("b"))).as[Double].head() == 11.0)
  }

  test("jaccard expression == HOF formulation on token and hashed arrays") {
    val toks = docs.select(col("doc_id"), S.tokens(col("text")).as("t"))
    val pairs = toks.as("a").crossJoin(toks.limit(10).as("b"))
      .select(col("a.t").as("ta"), col("b.t").as("tb"))
    val cmp = pairs.select(S.jaccard(col("ta"), col("tb")).as("fast"),
      S.jaccardHof(col("ta"), col("tb")).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).isEmpty)
    // long arrays + edge cases: empty/empty → 0.0, duplicate elements, nulls
    val edge = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L, 1L, 2L), Seq(1L, 3L))).toDF("a", "b")
    val ecmp = edge.select(S.jaccard(col("a"), col("b")).as("fast"),
      S.jaccardHof(col("a"), col("b")).as("slow"))
    assert(ecmp.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("gram_hash_pairs == HOF gram construction, positionally") {
    import graft.functions.expressions.{HashExpressions => H}
    val n = 8
    // HOF reference: the zipped-shifted-slice grams the kernel replaced,
    // hashed with the same seed-42 xxhash64 (h1 must agree gram for gram)
    val ts = S.tokens(col("text"))
    val m = size(col("__ts")) - (n - 1)
    val shifted = (0 until n).map(k => slice(col("__ts"), lit(k + 1), m).as(s"t$k"))
    val gramArr = transform(arrays_zip(shifted: _*), s =>
      concat_ws(" ", (0 until n).map(k => s.getField(s"t$k")): _*))
    val slow = docs.select(col("doc_id"), ts.as("__ts"))
      .filter(size(col("__ts")) >= n)
      .select(col("doc_id"), posexplode(gramArr).as(Seq("p", "g")))
      .select(col("doc_id"), col("p"), xxhash64(col("g")).as("h1"))
    val fast = docs.select(col("doc_id"),
        posexplode(H.gram_hash_pairs(col("text"), n)).as(Seq("p", "gh")))
      .select(col("doc_id"), col("p"), col("gh.h1").as("h1"))
    assert(fast.count() == slow.count() && fast.count() > 0)
    assert(fast.join(slow, Seq("doc_id", "p", "h1"), "left_anti").isEmpty)
    // below n tokens → empty array; h2 differs from h1 (independent stream)
    val edge = Seq("one two three", "a b c d e f g h i").toDF("text")
      .select(H.gram_hash_pairs(col("text"), n).as("g"))
    assert(edge.select(size(col("g"))).as[Int].collect().toSeq == Seq(0, 2))
    assert(edge.filter(size(col("g")) > 0)
      .select(explode(col("g")).as("e"))
      .filter(col("e.h1") === col("e.h2")).isEmpty)
  }

  test("scrub_spans rebuild: overlap merge, empty starts, empty text, counts") {
    import graft.functions.expressions.{TextStatsExpressions => T}
    def run(text: String, starts: Seq[Int], n: Int) = {
      val out = Seq((text, starts)).toDF("text", "starts")
        .select(T.scrub_spans(col("text"), col("starts"), n).as("s"))
        .select(col("s.n_tokens"), col("s.n_removed"), col("s.scrubbed_text"))
        .head()
      (out.getLong(0), out.getLong(1), out.getString(2))
    }
    // overlapping starts (0 and 2, n=3) cover tokens 0..4 as one merged span
    assert(run("a b c d e f", Seq(0, 2), 3) == ((6L, 5L, "f")))
    // disjoint spans
    assert(run("a b c d e f", Seq(0, 4), 2) == ((6L, 4L, "c d")))
    // no hot starts → identity (lowercased, whitespace-normalized like tokens())
    assert(run("A  b\tC", Seq.empty, 3) == ((3L, 0L, "a b c")))
    // empty text
    assert(run("   ", Seq.empty, 3) == ((0L, 0L, "")))
    // span past the end masks through the last token only
    assert(run("a b c", Seq(2), 4) == ((3L, 1L, "a b")))
  }

  test("keep_chars expression == char-class regexp_replace") {
    import graft.functions.expressions.{HashExpressions => H}
    val vals = Seq("$1,234.56", "€1.234,56", "-9.99", "", "abc", "１２三 -1.5").toDF("v")
      .unionByName(docs.select(col("text").as("v")))
    val cmp = vals.select(
      H.keep_chars(col("v"), "0123456789.+-").as("fast"),
      regexp_replace(col("v"), "[^0-9.+-]", "").as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("rolling hashes expression == HOF formulation") {
    import graft.functions.{TextFunctions => T}
    val cmp = docs.select(
      T.rollingHashes(col("text"), 16).as("fast"),
      T.rollingHashesHof(col("text"), 16).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).isEmpty)
    // edge cases: shorter than k → empty; exactly k → one hash
    val edges = Seq("short", "exactly sixteen!", "").toDF("t")
      .select(T.rollingHashes(col("t"), 16).as("fast"),
        T.rollingHashesHof(col("t"), 16).as("slow"))
    assert(edges.filter(col("fast") =!= col("slow")).count() == 0)
    // null-in → null-out (Spark convention; the HOF's otherwise() returned
    // an empty array here, which array_min turns into the same null anyway)
    val nulls = Seq(Option.empty[String]).toDF("t")
    assert(nulls.select(T.rollingHashes(col("t"), 16)).head().isNullAt(0))
  }

  test("minhash expression null and empty semantics") {
    val df = Seq(Some(Seq("a", "b")), Some(Seq.empty[String]), None).toDF("sh")
    val got = df.select(HashExpressions.minhash_signature(col("sh"), 4).as("s")).collect()
    assert(got(1).getSeq[Long](0).forall(_ == HashExpressions.P31)) // empty → sentinel
    assert(got(2).isNullAt(0)) // null in → null out
  }

  test("kll_quantile kernel == HOF formulation, bit for bit (incl. null on empty)") {
    import graft.functions.expressions.{SketchAggregates => SK}
    val sk = docs.select(col("lang"), length(col("text")).cast("double").as("v"))
      .groupBy(col("lang")).agg(SK.kll_sketch(col("v"), 64).as("sk"))
    Seq(0.0, 0.1, 0.5, 0.9, 0.99, 1.0).foreach { q =>
      val cmp = sk.select(SK.kll_quantile(col("sk"), q).as("fast"),
        SK.kll_quantile_hof(col("sk"), q).as("slow"))
      assert(cmp.filter(not(col("fast") <=> col("slow"))).isEmpty, s"q=$q")
    }
    // empty sketch (all-null values) → null from both forms
    val empty = docs.select(lit(null).cast("double").as("v"))
      .agg(SK.kll_sketch(col("v"), 8).as("sk"))
    val r = empty.select(SK.kll_quantile(col("sk"), 0.5).as("fast"),
      SK.kll_quantile_hof(col("sk"), 0.5).as("slow")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("MultiDictCounter credits a term shared by two dictionaries to both") {
    import graft.functions.expressions.MultiDictCounter
    // "de" is a stopword in both German and Dutch lists — one automaton
    // pass must count it toward each owning dictionary, matching what two
    // independent regexp_count(text, '\bde\b') calls would return.
    val mc = new MultiDictCounter(Array(Array("de", "und"), Array("de", "het")))
    val got = mc.count("de trein und de auto het")
    assert(got.toSeq == Seq(2 + 1, 2 + 1)) // both dicts see "de" twice
    // A term repeated WITHIN one dictionary would double-count → rejected.
    intercept[IllegalArgumentException] {
      new MultiDictCounter(Array(Array("de", "de")))
    }
  }
}

/** SQL-surface registration of the native expressions. */
class ExtensionsSpec extends SparkSpec {
  test("registered SQL functions evaluate the native expressions") {
    GraftExtensions.register(spark)
    sf("documents").limit(20).createOrReplaceTempView("ext_docs")
    val row = spark.sql(
      """SELECT simhash64(split(lower(text), '\\s+')) AS sh,
               minhash_signature(hashed_shingles(text, 2), 16) AS mh,
               jaro_winkler('MARTHA', 'MARHTA') AS jw
         FROM ext_docs LIMIT 1""").head()
    assert(row.getLong(0) != 0L)
    assert(row.getSeq[Long](1).length == 16)
    assert(math.abs(row.getDouble(2) - 0.9611) < 1e-3)
    val rep = spark.sql(
      """SELECT line_stats('a\na\nb') AS ls,
               drop_repeated_lines('a\na\nb') AS dl,
               top_ngram('x y x y', 2) AS tg""").head()
    assert(rep.getSeq[Long](0) == Seq(3L, 2L, 3L, 2L))
    assert(rep.getString(1) == "a\nb")
    assert(rep.getStruct(2).getString(2) == "x y")
    val r7 = spark.sql(
      """SELECT unicode_normalize('café', 'NFC') AS nn,
               mask_terms('top secret stuff', array('top secret'), '[X]') AS mt,
               count_terms('a secret and a secret', array('secret')) AS ct""").head()
    assert(r7.getString(0) == "café")
    assert(r7.getString(1) == "[X] stuff")
    assert(r7.getInt(2) == 2)
    val r8 = spark.sql(
      """SELECT size(gram_hash_pairs('a b c d', 3)) AS ng,
               scrub_spans('a b c d', array(1), 2) AS sc""").head()
    assert(r8.getInt(0) == 2)
    assert(r8.getStruct(1).getString(2) == "a d")
    val r8b = spark.sql(
      """SELECT shingle_strings('A b a b', 2) AS sh,
               sorted_intersect_count(array(CAST(1 AS BIGINT), 3, 5),
                                      array(CAST(2 AS BIGINT), 3, 5, 7)) AS ic""").head()
    assert(r8b.getSeq[String](0) == Seq("a b", "b a"))
    assert(r8b.getInt(1) == 2)
  }

  test("SQL-exposed kernels reject wrong input types at analysis, not with garbage") {
    GraftExtensions.register(spark)
    // array<bigint> starts would be read getInt-wise (4 of each 8 bytes) —
    // must fail analysis instead
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT scrub_spans('a b c', array(CAST(1 AS BIGINT)), 2)").collect()
    }
    assert(e.getMessage.contains("array<int>"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT gram_hash_pairs(array('a'), 2)").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("string"))
  }

  test("sketch aggregates work from plain SQL GROUP BY") {
    GraftExtensions.register(spark)
    sf("documents").limit(100).createOrReplaceTempView("sk_docs")
    val rows = spark.sql(
      """SELECT lang,
               kmv_sketch(CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT), 8) AS kmv,
               cms_sketch(lang, 2, 16) AS cms,
               bloom_sketch(text, 1024, 3) AS bloom,
               bottom_k_struct(named_struct('n', -n_chars, 'id', doc_id), 3) AS topn
         FROM sk_docs GROUP BY lang""").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1).nonEmpty)           // kmv: some hashes
      assert(r.getSeq[Long](2).length == 2 * 16)   // cms: depth*width
      assert(r.getAs[Array[Byte]](3).length == 128) // bloom: 1024 bits
      assert(r.getSeq[org.apache.spark.sql.Row](4).length <= 3)
    }
  }

  test("extensions class wires into a session via spark.sql.extensions") {
    // verify the injector itself runs without error on a fresh builder-level
    // extensions object (full new-session wiring needs an isolated JVM)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("fix_mojibake: repairs cp1252 mojibake, unwinds double encoding, passes clean text through") {
    import spark.implicits._
    import java.nio.charset.{Charset, StandardCharsets}
    val cp1252 = Charset.forName("windows-1252")
    def garble(s: String) = new String(s.getBytes(StandardCharsets.UTF_8), cp1252)
    val truth = "café – it’s naïve…"
    val cases = Seq(
      garble(truth)         -> truth,  // single mojibake -> repaired
      garble(garble(truth)) -> truth,  // double encoding unwinds (2 rounds)
      truth                 -> truth,  // GENUINE UTF-8 text untouched (its
                                       // cp1252 bytes are not valid UTF-8)
      "plain ascii"         -> "plain ascii",
      "mixed Ω and Ã©"      -> "mixed Ω and Ã©", // Ω has no cp1252 byte ->
                                                 // whole string passes through
      // the round-6 review's confirmed corruption cases: "é–…" has cp1252
      // bytes E9 96 85 = valid UTF-8 for one CJK char, so an ungated round
      // trip would destroy it — as genuine text AND as round-1 output
      "é–…"                 -> "é–…",
      garble("é–…")         -> "é–…",
      // documented conservative limit: bare 3-byte CJK garble carries no
      // strong marker and is deliberately left untouched
      "æˆ¦"                 -> "æˆ¦")
    val got = cases.map(_._1).toDF("t")
      .select(graft.functions.TextFunctions.fixMojibake($"t")).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("sdc_sum kernel == unrolled element_at formulation, bit for bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.expressions.HashExpressions
    // the typedLit formulation this kernel replaced — kept here as the
    // semantic pin (and the exact arithmetic the q172 oracle unrolls)
    val m = 4; val kk = 5
    val rnd = new scala.util.Random(7)
    val flat = Array.fill(m * kk * kk)(rnd.nextDouble() * 10)
    val rows = (0 until 200).map { _ =>
      (Array.fill(m)(rnd.nextInt(kk)), Array.fill(m)(rnd.nextInt(kk)))
    }
    val df = rows.toDF("a", "b")
    val lit0 = typedLit(flat.toSeq)
    val unrolled = (0 until m).map(j =>
        element_at(lit0, lit(j * kk * kk)
          + element_at(col("a"), j + 1) * kk
          + element_at(col("b"), j + 1) + lit(1)))
      .reduce(_ + _)
    val both = df.select(
        HashExpressions.sdc_sum(col("a"), col("b"), flat, kk).as("k"),
        unrolled.as("u"))
      .as[(Double, Double)].collect()
    both.foreach { case (k, u) => assert(k == u) }
  }
}
