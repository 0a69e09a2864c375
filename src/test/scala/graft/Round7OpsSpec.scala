package graft

import graft.functions.{SimilarityFunctions => S}
import graft.operators.{Repetition, Retrieval, Sampling}
import org.apache.spark.sql.functions._

/** Round-7 operator pack: BM25 retrieval, Naive Bayes classification, DSIR
  * importance resampling, repeated-span scrubbing, epoch shuffle-sharding. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- BM25

  test("bm25: closed-form single-term scores, tf and length normalization") {
    val docs = Seq(
      (1L, "apple banana apple"),        // tf=2, dl=3
      (2L, "apple pear plum cherry"),    // tf=1, dl=4
      (3L, "pear plum")                  // no match
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq("q1" -> "apple"), k = 10)
      .orderBy(col("rank")).collect()
    // N=3, avgdl=3, df(apple)=2, idf=ln(1+1.5/2.5)=ln(1.6)
    val idf = math.log(1.6)
    val s1 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 3.0))
    val s2 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 4.0 / 3.0))
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // d3 absent
    assert(out(0).getDouble(2) == math.rint(s1 * 1e6) / 1e6 ||
      math.abs(out(0).getDouble(2) - s1) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - s2) < 1e-6)
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L))
  }

  test("bm25: multi-term queries sum per-term contributions; k caps rows") {
    val docs = Seq(
      (1L, "red blue red blue"),
      (2L, "red green"),
      (3L, "blue yellow"),
      (4L, "green yellow")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq("q1" -> "red blue", "q2" -> "yellow"), k = 2)
    val rows = out.collect()
    assert(rows.count(_.getString(0) == "q1") == 2) // k caps at 2 of 3 matches
    // doc 1 matches both query terms → must outrank single-term docs
    val q1Top = rows.filter(r => r.getString(0) == "q1" && r.getLong(3) == 1L)
    assert(q1Top.head.getLong(1) == 1L)
  }

  test("bm25 plan: query-term semi-join is a broadcast") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val p = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("q" -> "a"), 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  // ------------------------------------------------------- Naive Bayes

  test("naive bayes: separable corpus classifies the held-out half; unseen tokens smooth") {
    val docs = Seq(
      (0L, "sun sun moon", "astro"), (2L, "sun star moon", "astro"),
      (4L, "fish fish kelp", "ocean"), (6L, "fish wave kelp", "ocean"),
      (1L, "sun moon", "astro"), (3L, "star sun", "astro"),
      (5L, "fish kelp", "ocean"),
      (7L, "wave fish novelword", "ocean") // unseen token must not explode
    ).toDF("doc_id", "text", "label")
    val out = Retrieval.naiveBayes(docs, "text", "doc_id", "label",
      pmod(col("doc_id"), lit(2)) === 0)
    val preds = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(preds == Map(1L -> "astro", 3L -> "astro", 5L -> "ocean", 7L -> "ocean"))
  }

  test("naive bayes: exact score ties break on class name") {
    val docs = Seq(
      (0L, "t", "a"), (2L, "t", "b"), // symmetric training
      (1L, "t t", "b")                // equal scores under both classes
    ).toDF("doc_id", "text", "label")
    val out = Retrieval.naiveBayes(docs, "text", "doc_id", "label",
      pmod(col("doc_id"), lit(2)) === 0).collect()
    assert(out.length == 1 && out.head.getString(2) == "a")
  }

  // -------------------------------------------------------------- DSIR

  test("dsir: target-distribution docs outweigh source-only docs; deterministic") {
    val target = (0L until 6L).map(i => (i, "alpha beta gamma delta", "t"))
    val source = (6L until 12L).map(i => (i, "omega sigma theta zeta", "s"))
    val probe = Seq((100L, "alpha beta gamma delta", "s"),
      (101L, "omega sigma theta zeta", "s"))
    val docs = (target ++ source ++ probe).toDF("doc_id", "text", "lang")
    val out = Sampling.dsirSample(docs, "doc_id", "text",
      col("lang") === "t", nBuckets = 64, k = 100)
    val w = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(100L) > w(101L), s"target-like doc must outweigh source-like: $w")
    val again = Sampling.dsirSample(docs, "doc_id", "text",
      col("lang") === "t", nBuckets = 64, k = 100).collect()
    assert(out.collect().map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("dsir: k caps the selection and ranks are 1..k") {
    val docs = (0L until 50L).map(i => (i, s"tok$i common word", if (i < 10) "t" else "s"))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.dsirSample(docs, "doc_id", "text",
      col("lang") === "t", nBuckets = 32, k = 7).collect()
    assert(out.length == 7)
    assert(out.map(_.getLong(3)).sorted.toSeq == (1L to 7L))
  }

  // -------------------------------------------------------- span scrub

  test("span scrub: cross-doc 8-gram masked in every doc; within-doc repetition survives") {
    val banner = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"intro words here $banner"),
      (2L, s"$banner closing remarks"),
      // within-doc repetition only → distinct-doc count 1 → untouched
      (3L, "a b c d e f g h a b c d e f g h")
    ).toDF("doc_id", "text")
    val out = Repetition.scrubRepeatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((11L, 8L, "intro words here")))
    assert(out(2L) == ((10L, 8L, "closing remarks")))
    assert(out(3L)._2 == 0L && out(3L)._3 == "a b c d e f g h a b c d e f g h")
  }

  test("span scrub: overlapping hot grams merge coverage instead of double-counting") {
    val run9 = "w1 w2 w3 w4 w5 w6 w7 w8 w9" // two overlapping hot 8-grams
    val docs = Seq((1L, s"$run9 tailone"), (2L, s"lead $run9")).toDF("doc_id", "text")
    val out = Repetition.scrubRepeatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((9L, "tailone")))
    assert(out(2L) == ((9L, "lead")))
  }

  test("span scrub keepFirst: corpus-first occurrence survives, every later copy masked") {
    val banner = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"intro words here $banner"),
      (2L, s"$banner closing remarks"),
      (5L, s"also carries $banner")
    ).toDF("doc_id", "text")
    val out = Repetition.scrubRepeatedSpans(docs, "doc_id", "text",
        n = 8, minDocs = 2, keepFirst = true)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // first occurrence is (doc 1, pos 3) — doc 1 keeps the banner
    assert(out(1L) == ((0L, s"intro words here $banner")))
    assert(out(2L) == ((8L, "closing remarks")))
    assert(out(5L) == ((8L, "also carries")))
    // same corpus under remove-all: doc 1 loses it too
    val all = Repetition.scrubRepeatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .filter($"doc_id" === 1L).select("scrubbed_text").as[String].head()
    assert(all == "intro words here")
  }

  test("span scrub keepFirst: within one doc, only the first of repeated hot runs survives") {
    val run = "r1 r2 r3 r4 r5 r6 r7 r8"
    val docs = Seq(
      (1L, s"$run middle $run"), // first occurrence at pos 0; second copy scrubbed
      (2L, s"other $run text")
    ).toDF("doc_id", "text")
    val out = Repetition.scrubRepeatedSpans(docs, "doc_id", "text",
        n = 8, minDocs = 2, keepFirst = true)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((8L, s"$run middle")))
    assert(out(2L) == ((8L, "other text")))
  }

  test("span scrub: docs shorter than n and empty docs pass through") {
    val docs = Seq((1L, "just three tokens"), (2L, "")).toDF("doc_id", "text")
    val out = Repetition.scrubRepeatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 0L, "just three tokens")))
    assert(out(2L) == ((0L, 0L, "")))
  }

  // ------------------------------------------------- unicode normalization

  test("unicode normalize: NFC composes combining marks; already-normal text fast-paths; NFKC folds compatibility forms") {
    import graft.functions.{TextFunctions => T}
    val df = Seq(
      (1L, "café"),          // e + combining acute → é
      (2L, "Ångström"), // ring/diaeresis → Ångström
      (3L, "plain ascii"),          // fast path
      (4L, "ﬁle １２") // NFKC: ﬁ → fi, fullwidth digits → 12
    ).toDF("id", "s")
    val nfc = df.select(col("id"), T.unicodeNormalize(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfc(1L) == "café")
    assert(nfc(2L) == "Ångström")
    assert(nfc(3L) == "plain ascii")
    assert(nfc(4L) == "ﬁle １２") // NFC leaves compatibility forms
    val nfkc = df.select(col("id"), T.unicodeNormalize(col("s"), "NFKC").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfkc(4L) == "file 12")
    intercept[IllegalArgumentException] {
      graft.functions.expressions.HashExpressions.unicode_normalize(col("s"), "NFX")
    }
  }

  // ------------------------------------------------------- web-text pack

  test("pii scrub: ipv4 category masks last; email dotted domains protected; counts audit the original") {
    import graft.functions.{TextFunctions => T}
    val df = Seq(
      (1L, "reach a.b-c_d@sub.domain.org now"),
      (2L, "call 555-123-4567 or visit 192.168.0.1 twice 10.0.0.255"),
      (3L, "no pii here"),
      (4L, "ver 1.2 and 1.2.3 are not ips; 1.2.3.4 is")
    ).toDF("id", "s")
    val out = df.select(col("id"), T.piiScrub(col("s")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "reach [EMAIL] now")
    assert(out(2L) == "call [PHONE] or visit [IP] twice [IP]")
    assert(out(3L) == "no pii here")
    assert(out(4L) == "ver 1.2 and 1.2.3 are not ips; [IP] is")
    val counts = df.select(col("id"),
        T.piiCount(col("s"), "email").cast("long").as("e"),
        T.piiCount(col("s"), "phone").cast("long").as("p"),
        T.piiCount(col("s"), "ip").cast("long").as("i"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(counts(1L) == ((1L, 0L, 0L)))
    assert(counts(2L) == ((0L, 1L, 2L)))
    assert(counts(4L) == ((0L, 0L, 1L)))
  }

  test("html strip: tags first then one-level entity unescape, &amp; last; whitespace collapsed; escaped tags stay text") {
    import graft.functions.{TextFunctions => T}
    val df = Seq(
      (1L, "<p>a</p>  <b>b</b>"),
      (2L, "&amp;lt; is one level"),
      (3L, "&lt;script&gt;alert()&lt;/script&gt;"),
      (4L, "x &quot;y&quot; &#39;z&#39; &nbsp;w")
    ).toDF("id", "s")
    val out = df.select(col("id"), T.stripHtml(col("s")).as("r"), T.htmlTagCount(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("a b", 4L)))
    assert(out(2L) == (("&lt; is one level", 0L)))      // NOT "<", single unescape
    assert(out(3L) == (("<script>alert()</script>", 0L))) // escaped tag survives as text
    assert(out(4L) == (("x \"y\" 'z' w", 0L)))
  }

  test("gopher rules: each rule trips on its crafted violation and passes on clean prose") {
    import graft.functions.{TextFunctions => T}
    val clean = "the quick brown fox jumps over the lazy dog near the river bank today"
    val df = Seq(
      (1L, clean),
      (2L, "one two three"),                                  // < 5 words
      (3L, clean + " # # # # # # # # # #"),                   // symbol spam
      (4L, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\nj"), // 9/10 bullet lines ok, all-but-one
      (5L, clean + "\nend...\nalso...\nmore..."),             // 3/4 ellipsis lines
      (6L, "1 2 3 4 5 6 7 8 9 10 the of and")                 // digits: alpha ratio fails
    ).toDF("id", "s")
    val out = df.select((col("id") +: T.gopherFlags(col("s"))): _*).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Boolean = {
      val r = out(id); r.getBoolean(r.fieldIndex(name))
    }
    assert(flag(1L, "pass"))
    assert(!flag(2L, "ok_word_count") && !flag(2L, "pass"))
    assert(!flag(3L, "ok_symbol_ratio"))
    assert(flag(4L, "ok_bullet_ratio"))   // exactly 90% bullets — boundary holds
    assert(!flag(5L, "ok_ellipsis_ratio"))
    assert(!flag(6L, "ok_alpha_ratio") && flag(6L, "has_stopword"))
  }

  test("url canonicalize: lowercases scheme+host, strips www/utm/fragment/trailing slash, keeps path case and real params; non-urls empty") {
    import graft.functions.{TextFunctions => T}
    val df = Seq(
      (1L, "https://WWW.Ex.COM/A/b/?utm_source=x&id=7#f"),
      (2L, "http://ex.com/"),
      (3L, "https://www.ex.com"),
      (4L, "not a url"),
      (5L, "https://ex.com/p?utm_a=1&utm_b=2"),
      (6L, "HTTP://WWW.EX.COM/Q")   // uppercase scheme+host: path case kept
    ).toDF("id", "u")
    val out = df.select(col("id"), T.canonicalizeUrl(col("u")).as("c"), T.urlDomain(col("u")).as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L) == (("https://ex.com/A/b?id=7", "ex.com")))
    assert(out(2L) == (("http://ex.com", "ex.com")))
    assert(out(3L) == (("https://ex.com", "ex.com")))
    assert(out(4L) == (("", "")))
    assert(out(5L) == (("https://ex.com/p", "ex.com")))
    assert(out(6L) == (("http://ex.com/Q", "ex.com")))
  }

  // ------------------------------------------------------------- sketches

  test("kmv sketch: bottom-k of distinct hashes, ascending, partition-order independent; under-k set is exact") {
    import graft.functions.expressions.{SketchAggregates => SK}
    val words = (1 to 200).map(i => s"w$i") ++ (1 to 200).map(i => s"w$i") // dups collapse
    val expected = words.distinct.map(SK.md5Hash60).sorted.take(16)
    def sketch(parts: Int): Seq[Long] = {
      val df = words.toDF("w").repartition(parts)
        .select(conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
      df.agg(SK.kmv_sketch(col("h"), 16).as("sk")).collect()(0).getSeq[Long](0)
    }
    assert(sketch(1) == expected)
    assert(sketch(13) == expected) // merge path: many partial sketches
    val small = Seq("a", "b", "c").toDF("w")
      .select(conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
      .agg(SK.kmv_sketch(col("h"), 16)).collect()(0).getSeq[Long](0)
    assert(small == Seq("a", "b", "c").map(SK.md5Hash60).sorted) // n<k: whole set
  }

  test("cms sketch: row sums equal corpus size, estimates never undercount, merge path equals single partition") {
    import graft.functions.expressions.{SketchAggregates => SK}
    val toks = Seq.fill(50)("the") ++ Seq.fill(20)("cat") ++ (1 to 30).map(i => s"t$i")
    def sketch(parts: Int): Seq[Long] =
      toks.toDF("t").repartition(parts)
        .agg(SK.cms_sketch(col("t"), 4, 64)).collect()(0).getSeq[Long](0)
    val sk = sketch(1)
    assert(sk == sketch(7))
    (0 until 4).foreach { i =>
      assert(sk.slice(i * 64, (i + 1) * 64).sum == toks.size) // each row counts every token
    }
    def estimate(tok: String): Long =
      (0 until 4).map(i => sk((i * 64 + (SK.md5Hash60(s"$i|$tok") % 64)).toInt)).min
    assert(estimate("the") >= 50 && estimate("cat") >= 20)
    assert(estimate("absent-token") >= 0) // collision floor only
  }

  test("bloom sketch: no false negatives, merge path equals single partition, probe matches exact overlap") {
    import graft.functions.expressions.{SketchAggregates => SK, HashExpressions => HE}
    // build over 300 grams; probing an inserted gram ALWAYS hits
    val grams = (1 to 300).map(i => s"g$i gram body $i")
    def bits(parts: Int): Array[Byte] =
      grams.toDF("g").repartition(parts)
        .agg(SK.bloom_sketch(col("g"), 1 << 14, 5)).head().getAs[Array[Byte]](0)
    val b1 = bits(1)
    assert(java.util.Arrays.equals(b1, bits(11))) // OR-merge is partition-count independent
    val words = { val bb = java.nio.ByteBuffer.wrap(b1); Array.fill(b1.length / 8)(bb.getLong) }
    grams.foreach(g => assert(SK.bloomTest(words, 1 << 14, 5, g), s"false negative on $g"))
    // operator-level: bloom flags/counts equal the exact-join ground truth
    // (documents corpus, q80's bench convention) — zero FPs at this scale
    val docs = sf("documents")
    val bench = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
      .select(col("doc_id"),
        array_join(slice(S.tokens(col("text")), 3, 30), " ").as("text"))
    val bloom = graft.operators.Dedup.bloomDecontaminate(docs, bench, "text", "doc_id", n = 13)
    // exact ground truth under the SAME semantics: distinct doc grams vs the
    // UNION of bench grams (ngramOverlapJoin's per-bench-doc n_shared would
    // double-count a gram two bench docs both contain)
    val cg = docs.select(col("doc_id"),
      explode(HE.hashed_shingles(col("text"), 13)).as("g"))
    val bg = bench.select(explode(HE.hashed_shingles(col("text"), 13)).as("g")).distinct()
    val exact = cg.join(bg, Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits_exact"))
    val joined = bloom.join(exact, Seq("doc_id"), "left")
      .withColumn("n_hits_exact", coalesce(col("n_hits_exact"), lit(0L)))
    // superset by construction; equality because no FP fires here
    assert(joined.filter(col("n_hits") < col("n_hits_exact")).isEmpty)
    assert(joined.filter(col("n_hits") =!= col("n_hits_exact")).isEmpty)
    assert(bloom.filter(col("contaminated")).count() ==
      exact.filter(col("n_hits_exact") > 0).count())
    // an empty bench set flags nothing
    val none = graft.operators.Dedup.bloomDecontaminate(
      docs.limit(50), bench.limit(0), "text", "doc_id", n = 13)
    assert(none.filter(col("contaminated")).isEmpty)
    // probe expression under codegen: tiny adversarial filter (64 bits, k=1)
    // CAN false-positive but never false-negative
    val tiny = Seq("x y z").toDF("g").agg(SK.bloom_sketch(col("g"), 64, 1))
      .head().getAs[Array[Byte]](0)
    val hit = Seq("x y z a").toDF("text")
      .select(HE.bloom_gram_hits(col("text"), 3, 1, tiny).as("b"))
      .select(col("b.n_grams"), col("b.n_hits")).head()
    assert(hit.getLong(0) == 2 && hit.getLong(1) >= 1) // "x y z" must hit
  }

  test("bloom probe runs in a stream: drained probe of a file stream equals batch") {
    import graft.functions.expressions.{SketchAggregates => SK, HashExpressions => HE}
    import graft.streaming.StreamingOps
    import org.apache.spark.sql.streaming.OutputMode
    // the probe is a stateless codegen'd projection, so the SAME column
    // works under readStream — decontaminate-on-ingest with zero state
    val docs = sf("documents").select(col("doc_id"), col("text")).limit(200)
    val bench = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
      .select(array_join(slice(S.tokens(col("text")), 3, 30), " ").as("text"))
    val bits = bench
      .select(explode(S.wordShingles(col("text"), 13)).as("g"))
      .agg(SK.bloom_sketch(col("g"), 1 << 20, 5)).head().getAs[Array[Byte]](0)
    def probe(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), HE.bloom_gram_hits(col("text"), 13, 5, bits).as("b"))
        .select(col("doc_id"), col("b.n_hits").as("n_hits"))
    val dir = java.nio.file.Files.createTempDirectory("bloom_stream").toString
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val batch = probe(spark.read.parquet(dir)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val schema = spark.read.parquet(dir).schema
    val streamed = StreamingOps.drainToMemory(
        probe(spark.readStream.schema(schema).parquet(dir)),
        "bloom_stream_q", OutputMode.Append())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(batch.values.sum > 0) // the planted bench overlap actually fires
  }

  test("sketch aggregates run in streaming aggregation: drained complete-mode sketch equals batch") {
    import graft.functions.expressions.{SketchAggregates => SK}
    import graft.streaming.StreamingOps
    import org.apache.spark.sql.streaming.OutputMode
    val rows = (1 to 300).map(i => (s"g${i % 3}", s"tok${i % 40}"))
    val dir = java.nio.file.Files.createTempDirectory("sketch_stream").toString
    rows.toDF("g", "tok").coalesce(1).write.mode("overwrite").parquet(dir)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(
        SK.kmv_sketch(conv(substring(md5(col("tok")), 1, 15), 16, 10)
          .cast("long"), 8).as("kmv"),
        SK.cms_sketch(col("tok"), 2, 32).as("cms"))
    val batch = agg(spark.read.parquet(dir)).collect()
      .map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    val schema = spark.read.parquet(dir).schema
    val streamed = StreamingOps.drainToMemory(
        agg(spark.readStream.schema(schema).parquet(dir)),
        "sketch_stream_q", OutputMode.Complete())
      .collect().map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    assert(streamed == batch)
  }

  test("bottom-k struct aggregate: k smallest under field order, dedup'd ties, partition independent, under-k keeps all") {
    import graft.functions.expressions.{SketchAggregates => SK}
    val rows = Seq((5L, "e"), (1L, "a"), (3L, "c"), (1L, "a"), (2L, "b"), (4L, "d"))
    def run(parts: Int): Seq[(Long, String)] =
      rows.toDF("v", "s").repartition(parts)
        .agg(SK.bottom_k_struct(struct(col("v"), col("s")), 3).as("k"))
        .selectExpr("explode(k) as e").select(col("e.v"), col("e.s"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // duplicate (1,a) occupies ONE slot (set semantics) — (3,c) makes the cut
    val expected = Seq((1L, "a"), (2L, "b"), (3L, "c"))
    assert(run(1) == expected)
    assert(run(5) == expected)
    // under-k: both rows kept, ascending
    val all = Seq((9L, "z"), (7L, "y")).toDF("v", "s")
      .agg(SK.bottom_k_struct(struct(col("v"), col("s")), 10).as("k"))
      .selectExpr("explode(k) as e").select(col("e.v")).collect().map(_.getLong(0)).toSeq
    assert(all == Seq(7L, 9L))
  }

  // ------------------------------------------------------ term masking (AC)

  test("mask terms: leftmost-longest wins, non-overlapping sweep, phrases mask whole, counts agree") {
    import graft.functions.{TextFunctions => T}
    val dict = Seq("ab", "abc", "aaa", "internal use only")
    val df = Seq(
      (1L, "xabcx"),          // abc (longest at 0) not ab
      (2L, "aaaaa"),          // one aaa at 0; remaining "aa" no match
      (3L, "abab"),           // two adjacent ab
      (4L, "see internal use only here"),
      (5L, "clean row"),
      (6L, "")
    ).toDF("id", "s")
    val out = df.select(col("id"), T.maskTerms(col("s"), dict, "[T]").as("m"),
        T.maskTermCount(col("s"), dict).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("x[T]x", 1)))
    assert(out(2L) == (("[T]aa", 1)))
    assert(out(3L) == (("[T][T]", 2)))
    assert(out(4L) == (("see [T] here", 1)))
    assert(out(5L) == (("clean row", 0)))
    assert(out(6L) == (("", 0)))
  }

  test("mask terms: shared-prefix dict terms resolve through fail links (suffix term found inside longer miss)") {
    import graft.functions.{TextFunctions => T}
    // "she"/"he": scanning "xshe" must find BOTH; masking takes leftmost "she"
    val out = Seq((1L, "xshe he x")).toDF("id", "s")
      .select(T.maskTerms(col("s"), Seq("she", "he"), "[T]").as("m"),
        T.maskTermCount(col("s"), Seq("she", "he")).as("n"))
      .collect()(0)
    assert(out.getString(0) == "x[T] [T] x" && out.getInt(1) == 2)
  }

  // ---------------------------------------------------- temperature mixture

  test("temperature mixture: tau=1 keeps everything at rate 1; tau=0.5 rate is sqrt(min/tg) with the smallest group binding") {
    import graft.operators.Sampling
    val df = (1 to 400).map(i => (i.toLong, if (i <= 360) "big" else "small", 10L))
      .toDF("id", "g", "toks")
    val all = Sampling.temperatureMixtureSample(df, "id", "g", "toks", tau = 1.0)
    assert(all.count() == 400)
    assert(all.select(col("rate")).distinct().collect().map(_.getDouble(0)).toSeq == Seq(1.0))
    val flat = Sampling.temperatureMixtureSample(df, "id", "g", "toks", tau = 0.5)
      .groupBy(col("g")).agg(count(lit(1)).as("n"), first(col("rate")).as("r"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(flat("small")._2 == 1.0)          // binding group keeps 100%
    assert(flat("small")._1 == 40L)
    assert(flat("big")._2 == math.sqrt(400.0 / 3600.0)) // sqrt(min_tg/tg), exact
    // kept count tracks rate within hash-bucket noise
    assert(math.abs(flat("big")._1 - 360 * flat("big")._2) < 40)
  }

  // ------------------------------------------------------------- pagerank

  test("pagerank: hand-computed fixed-point values on a 3-node chain; repartition does not perturb") {
    import graft.operators.PageRank
    // 1 -> 2, 1 -> 3, 2 -> 3 (node 3 dangles: its mass drops, standard)
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    def run(parts: Int): Map[Long, Long] =
      PageRank.fixedPoint(edges.repartition(parts), "src", "dst",
          nodes, "id", iterations = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1 from r=1000000: c(2)=1000000 div 2=500000; c(3)=500000+1000000
    //   r1(1)=150000; r1(2)=150000+85*500000 div 100=575000
    //   r1(3)=150000+85*1500000 div 100=1425000
    // iter2: c(2)=150000 div 2=75000; c(3)=75000+575000=650000
    //   r2(1)=150000; r2(2)=150000+63750=213750; r2(3)=150000+552500=702500
    val expected = Map(1L -> 150000L, 2L -> 213750L, 3L -> 702500L)
    assert(run(1) == expected)
    assert(run(7) == expected) // integer arithmetic: partitioning can't perturb
  }

  // ------------------------------------------- stream-stream interval join

  test("interval join: streaming drain equals the batch interval join, window closed at both ends") {
    import graft.streaming.StreamingOps
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(mins: Long) = new java.sql.Timestamp(t0.getTime + mins * 60000L)
    val events = Seq(
      (1L, 100L, ts(0), "click"), (1L, 101L, ts(30), "purchase"),   // in window
      (1L, 102L, ts(61), "purchase"),                               // out (>60m)
      (2L, 200L, ts(0), "click"), (2L, 201L, ts(0), "purchase"),    // boundary: same instant counts
      (2L, 202L, ts(60), "purchase"),                               // boundary: exactly 60m counts
      (3L, 300L, ts(10), "purchase"), (3L, 301L, ts(20), "click")   // purchase BEFORE click: no pair
    ).toDF("user_id", "event_id", "ts", "event_type")
    def side(df: org.apache.spark.sql.DataFrame, t: String, idAs: String, tsAs: String) =
      df.filter(col("event_type") === t)
        .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
    val expected = StreamingOps.intervalJoin(
        side(events, "click", "click_id", "click_ts"),
        side(events, "purchase", "purchase_id", "purchase_ts"),
        "user_id", "click_ts", "purchase_ts", 3600L, "90 days")
      .select(col("click_id"), col("purchase_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected == Set((100L, 101L), (200L, 201L), (200L, 202L)))
    val dir = java.nio.file.Files.createTempDirectory("ij").toString
    events.coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    def sside(t: String, idAs: String, tsAs: String) =
      side(spark.readStream.schema(schema).parquet(dir), t, idAs, tsAs)
    val drained = StreamingOps.drainToMemory(
      StreamingOps.intervalJoin(sside("click", "click_id", "click_ts"),
        sside("purchase", "purchase_id", "purchase_ts"),
        "user_id", "click_ts", "purchase_ts", 3600L, "90 days"),
      "ij_spec")
    val got = drained.select(col("click_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  // -------------------------------------------------------- epoch shard

  test("epoch shard: every row lands in exactly one shard with contiguous 1-based positions") {
    val df = spark.range(0, 200).select(col("id").as("doc_id"))
    val out = Sampling.epochShuffleShard(df, "doc_id", "ep0", 8).collect()
    assert(out.length == 200)
    assert(out.map(_.getLong(1)).distinct.sorted.forall(s => s >= 0 && s < 8))
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length))
    }
  }

  test("epoch shard: same seed reproduces the order; different seed reshuffles") {
    val df = spark.range(0, 100).select(col("id").as("doc_id"))
    val e0 = Sampling.epochShuffleShard(df, "doc_id", "ep0", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val e0b = Sampling.epochShuffleShard(df, "doc_id", "ep0", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val e1 = Sampling.epochShuffleShard(df, "doc_id", "ep1", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(e0.toSeq == e0b.toSeq)
    assert(e0.toSeq != e1.toSeq)
  }
}
