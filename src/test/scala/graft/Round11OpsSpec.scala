package graft

import graft.operators.{Analytics, Ann, Privacy}
import org.apache.spark.sql.functions._

/** Round-11 additions: k-anonymity ladder, deterministic DP counts,
  * Luhn-validated card masking, calibration bins, streaming ANN ingest. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- k-anonymity

  private def people = Seq(
    // a dense exact group (passes level 0 at k=3)
    (1L, 10, "A", 5L), (2L, 10, "A", 5L), (3L, 10, "A", 5L),
    // three rows that only group once GENERALIZED (10,11,12 -> band 10/10=1... )
    (4L, 20, "B", 7L), (5L, 21, "B", 7L), (6L, 22, "B", 7L),
    // a loner that survives nothing
    (7L, 30, "C", 9L)
  ).toDF("id", "zip", "seg", "band")

  test("kAnonymize: ladder levels, group-size invariant, row preservation") {
    val out = Privacy.kAnonymize(people, Seq("zip", "seg", "band"),
      Map("zip" -> floor(col("zip") / 10)), k = 3)
    val rows = out.select("id", "zip", "seg", "band", "anonymity_level")
      .as[(Long, String, String, String, Int)].collect().sortBy(_._1)
    assert(rows.length == 7, "k-anonymization must preserve row count")
    // level 0: the dense exact group, original values
    rows.take(3).foreach { case (_, z, s, b, l) =>
      assert(l == 0 && z == "10" && s == "A" && b == "5")
    }
    // level 1: zips 20/21/22 generalize to floor/10 = 2
    rows.slice(3, 6).foreach { case (_, z, s, b, l) =>
      assert(l == 1 && z == "2" && s == "B" && b == "7")
    }
    // level 2: the loner is fully suppressed
    assert(rows(6) == ((7L, "*", "*", "*", 2)))
    // invariant: every non-suppressed (level, tuple) group has >= k rows
    val bad = out.filter(col("anonymity_level") < 2)
      .groupBy("anonymity_level", "zip", "seg", "band")
      .agg(count(lit(1)).as("n")).filter(col("n") < 3).count()
    assert(bad == 0, "an emitted quasi tuple below k would re-identify")
  }

  test("kAnonymize: rejects non-quasi generalize keys and k < 2") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(people, Seq("zip"), Map("seg" -> col("seg")), 3)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(people, Seq("zip"), Map.empty, 1)
    }
  }

  // ------------------------------------------------- DP counts

  test("dpCounts: deterministic, and noise scales exactly as 1/epsilon") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
    val a = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = "s1")
      .as[(String, Double)].collect().toMap
    val b = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = "s1")
      .as[(String, Double)].collect().toMap
    assert(a == b, "same seed must release the same numbers")
    val c = Privacy.dpCounts(df, Seq("g"), epsilon = 2.0, seed = "s1")
      .as[(String, Double)].collect().toMap
    // same uniform per group, so noise(eps=2) = noise(0.5)/4 exactly
    a.keys.foreach { g =>
      val n05 = a(g) - 25.0
      val n20 = c(g) - 25.0
      // both releases are 6-dp rounded, so the exact 4x relation holds to
      // half-ulp-of-rounding on each side: |err| <= 0.5e-6 + 4*0.5e-6
      assert(math.abs(n05 - 4 * n20) <= 2.5e-6, s"group $g: $n05 vs $n20")
      assert(n05 != 0.0, "a zero-noise release would be a broken uniform")
    }
    // a different seed moves the noise
    val d = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = "s2")
      .as[(String, Double)].collect().toMap
    assert(d != a)
  }

  test("dpCountsBounded: both contribution bounds bite — rows per group AND groups per user") {
    // 5 users x 10 rows in group A, plus one user with 500 rows in group B
    val df = (for { u <- 1 to 5; _ <- 1 to 10 } yield (u.toLong, "A"))
      .++(Seq.fill(500)((99L, "B"))).toDF("uid", "g")
    val out = Privacy.dpCountsBounded(df, "uid", Seq("g"),
        maxPerUser = 3, maxGroupsPerUser = 4, epsilon = 0.5, seed = "s")
      .as[(String, Double)].collect().toMap
    // capped true counts: A = 5 users x 3 = 15, B = 1 x 3 = 3; assert the
    // release sits within the noise envelope of the CAPPED count, far
    // from the raw count for B (500)
    assert(math.abs(out("A") - 15.0) < 400, out.toString) // Laplace(24) tail
    assert(math.abs(out("B") - 3.0) < 400 && out("B") < 200,
      s"B must reflect the capped 3, not the raw 500: ${out("B")}")
    // determinism
    val again = Privacy.dpCountsBounded(df, "uid", Seq("g"), 3, 4, 0.5, "s")
      .as[(String, Double)].collect().toMap
    assert(again == out)

    // group cap: a user spread over 4 groups contributes to exactly 2 of
    // them when maxGroupsPerUser = 2 — total capped mass 2, not 4 — and
    // WHICH two is deterministic (md5 rank, not partitioning)
    val spread = Seq("w", "x", "y", "z").flatMap(g => Seq.fill(5)((7L, g)))
      .toDF("uid", "g")
    def release() = Privacy.dpCountsBounded(spread, "uid", Seq("g"),
        maxPerUser = 1, maxGroupsPerUser = 2, epsilon = 1000.0, seed = "s2")
      .as[(String, Double)].collect().toMap
    val rel = release()
    // eps=1000 makes noise ~0: surviving groups release ~1, dropped
    // groups are ABSENT from the release entirely
    assert(rel.size == 2 && rel.values.forall(v => math.abs(v - 1.0) < 0.1),
      rel.toString)
    assert(release() == rel)
    assert(release() == Privacy.dpCountsBounded(spread.repartition(7), "uid",
      Seq("g"), 1, 2, 1000.0, "s2").as[(String, Double)].collect().toMap)
  }

  test("readCommitted: an orphaned (written, never committed) partition is invisible") {
    import graft.streaming.{BatchCommitLog, StreamingOps}
    val db = s"readcomm${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.state"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rc_ckpt").toString
    Seq((1L, 0L), (2L, 0L)).toDF("id", "batch_id")
      .write.partitionBy("batch_id").saveAsTable(t)
    BatchCommitLog.commit(spark, ckpt, 0L)
    // a crashed batch 1: partition written, marker never placed
    Seq((3L, 1L)).toDF("id", "batch_id")
      .write.mode("append").partitionBy("batch_id").saveAsTable(t)
    spark.sql(s"REFRESH TABLE $t")
    assert(spark.table(t).count() == 3, "raw read sees the orphan")
    val committed = StreamingOps.readCommitted(spark, t, ckpt)
      .select("id").as[Long].collect().toSet
    assert(committed == Set(1L, 2L), "committed read must exclude the orphan")
    BatchCommitLog.commit(spark, ckpt, 1L)
    assert(StreamingOps.readCommitted(spark, t, ckpt).count() == 3)
  }

  // ------------------------------------------------- Luhn card masking

  test("maskCardNumbers: Luhn-valid masked, checksum failures and short runs untouched") {
    import graft.functions.TextFunctions.maskCardNumbers
    val cases = Seq(
      // valid 16-digit (spaces) — classic test PAN
      "pay 4539 1488 0343 6467 now" -> "pay [CARD-6467] now",
      // valid 15-digit Amex with dashes
      "amex 3782-822463-10005 ok" -> "amex [CARD-0005] ok",
      // same digits, checksum broken by one digit: untouched
      "pay 4539 1488 0343 6468 now" -> "pay 4539 1488 0343 6468 now",
      // 12 digits: below the length floor even though Luhn-consistent
      "id 0000 0000 0000" -> "id 0000 0000 0000",
      // 20 digits: above the ceiling
      "n 45391488034364670000 x" -> "n 45391488034364670000 x",
      // unseparated valid PAN
      "4539148803436467" -> "[CARD-6467]",
      // two cards in one string
      "a 4539148803436467 b 378282246310005 c" -> "a [CARD-6467] b [CARD-0005] c",
      // double separator breaks the run (two sub-runs, both short)
      "x 4539  1488 0343 6467" -> "x 4539  1488 0343 6467",
      // trailing separator stays outside the candidate
      "4539 1488 0343 6467-" -> "[CARD-6467]-",
      "" -> "")
    val got = cases.map(_._1).toDF("t")
      .select(maskCardNumbers(col("t"))).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"input '$in'")
    }
  }

  // ------------------------------------------------- calibration bins

  test("calibrationBins: hand-computed bins, clamped top bin, decimal-exact means") {
    val df = Seq(
      (0.05, 0), (0.08, 1),            // bin 0
      (0.52, 1), (0.58, 0), (0.55, 1), // bin 5
      (0.97, 1), (1.0, 1)              // bin 9 (1.0 clamps in)
    ).toDF("score", "label")
    val out = Analytics.calibrationBins(df, "score", "label", bins = 10)
      .orderBy("bin")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 0.065, 0.5),
      (5L, 3L, 0.55, 2.0 / 3 match { case v => math.rint(v * 1e6) / 1e6 }),
      (9L, 2L, 0.985, 1.0)))
  }

  // ------------------------------------------------- label propagation

  test("labelPropagation: two cliques bridged by one edge resolve to two communities; partition-invariant") {
    import graft.operators.GraphOps
    // cliques {1,2,3,4} and {10,11,12,13}, bridge 4-10
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+
      (4L, 10L) :+ (20L, 21L)).toDF("src", "dst") // plus an isolated edge pair
    val nodes = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 20L, 21L) :+ 30L)
      .toDF("id") // 30 = fully isolated node
    def run(e: org.apache.spark.sql.DataFrame) =
      GraphOps.labelPropagation(e, "src", "dst", nodes, "id", iters = 4)
        .as[(Long, Long)].collect().toMap
    val got = run(edges)
    assert(Set(1L, 2L, 3L, 4L).map(got).size == 1, s"clique A must agree: $got")
    assert(Set(10L, 11L, 12L, 13L).map(got).size == 1, s"clique B must agree: $got")
    assert(got(1L) != got(10L), "the bridge must not merge the cliques")
    assert(got(30L) == 30L, "an isolated node keeps its own label")
    // synchronous + total tiebreak => partitioning cannot change the answer
    assert(run(edges.repartition(7)) == got)
  }

  // ------------------------------------------------- co-occurrence PMI

  test("cooccurrencePmi: hand-computed supports and PMI; maxTokens excludes the mega-doc") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta"),
      (3L, "alpha beta delta"),
      (4L, "gamma delta"),
      // a doc over the maxTokens bound must not contribute any pairs
      (5L, (1 to 50).map(i => s"w$i").mkString("alpha beta ", " ", ""))
    ).toDF("doc_id", "text")
    val out = CorpusStats.cooccurrencePmi(docs, "text", "doc_id",
        minSupport = 2, maxTokens = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // alpha+beta co-occur in docs 1,2,3 (doc 5 excluded); N=4, df both 3
    val ab = out(("alpha", "beta"))
    assert(ab._3 == 3 && ab._4 == 3 && ab._5 == 3)
    assert(math.abs(ab._6 - math.rint(math.log(3.0 * 4 / 9) * 1e6) / 1e6) < 1e-9)
    assert(!out.contains(("alpha", "w1")), "mega-doc pairs must be excluded")
    assert(!out.contains(("alpha", "gamma")), "support 1 < minSupport")
  }

  // ------------------------------------------------- JL projection

  test("jlProject: deterministic matrix, distance preservation in expectation, top-k recall floor") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.tabulate(120)(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val m1 = Ann.jlMatrix(64, 16, "s")
    assert(m1.map(_.toSeq).toSeq == Ann.jlMatrix(64, 16, "s").map(_.toSeq).toSeq)
    assert(m1.flatten.forall(v => math.abs(math.abs(v) - 0.25) < 1e-12))
    // projected pairwise squared distances ≈ original on average (JL is an
    // unbiased estimator for Rademacher projections)
    val proj = Ann.jlProject(df, "embedding", 16, "s", 64)
      .select(col("vec_id"), col("proj"))
      .as[(Long, Seq[Double])].collect().toMap
    val raw = vecs.toMap.view.mapValues(_.map(_.toDouble)).toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- 0L until 40L; j = i + 40
    } yield d2(proj(i), proj(j)) / d2(raw(i).toSeq, raw(j).toSeq)
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio > 0.75 && meanRatio < 1.25,
      s"JL must preserve distances in expectation, mean ratio $meanRatio")
    // top-10 recall of the projected space vs exact, over 5 query vectors
    val queries = df.filter(col("vec_id") < 5)
      .select(col("vec_id").as("__qid"), col("embedding"))
    val exact = Ann.bruteForceTopK(df, queries, "embedding", "vec_id", "__qid", 10)
      .select(col("__qid"), col("vec_id")).as[(Long, Long)].collect().toSet
    val pdf = Ann.jlProject(df, "embedding", 16, "s", 64)
      .select(col("vec_id"), col("proj").as("embedding"))
    val pq = pdf.filter(col("vec_id") < 5)
      .select(col("vec_id").as("__qid"), col("embedding"))
    val approx = Ann.bruteForceTopK(pdf, pq, "embedding", "vec_id", "__qid", 10)
      .select(col("__qid"), col("vec_id")).as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"projected top-10 recall collapsed: $recall")
  }

  // ------------------------------------------------- streaming DQ gate

  test("ingestDqGate: streamed split equals the batch splitByRules; restart replays nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val db = s"dqgate${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val (ct, qt) = (s"$db.cleansed", s"$db.quarantine")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dqgate_ckpt").toString
    val rules = Seq("ColumnValues 'v' >= 10",
      "CustomSql 'SELECT id FROM primary WHERE cat IS NOT NULL'")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Integer, String)]
    val q = graft.streaming.StreamingOps.ingestDqGate(
      mem.toDF().toDF("id", "v", "cat"), rules, ct, qt, ckpt)
    val rows = Seq[(Long, Integer, String)](
      (1L, 50, "a"), (2L, 5, "a"), (3L, 50, null), (4L, null, "b"), (5L, 11, "b"))
    mem.addData(rows.take(3): _*); q.processAllAvailable()
    mem.addData(rows.drop(3): _*); q.processAllAvailable()
    q.stop()
    spark.sql(s"REFRESH TABLE $ct"); spark.sql(s"REFRESH TABLE $qt")
    def ids(t: String) = spark.table(t).select("id").as[Long].collect().toSet
    val (gotPass, gotFail) = (ids(ct), ids(qt))
    // batch-mode replay of the same rules over the union
    val all = rows.toDF("id", "v", "cat")
    val (bp, bf) = new graft.dq.DqEngine().splitByRules(all, rules)
    assert(gotPass == bp.select("id").as[Long].collect().toSet)
    assert(gotFail == bf.select("id").as[Long].collect().toSet)
    assert(gotPass == Set(1L, 5L) && gotFail == Set(2L, 3L, 4L))
    // restart over the same checkpoint: nothing reprocessed
    val q2 = graft.streaming.StreamingOps.ingestDqGate(
      mem.toDF().toDF("id", "v", "cat"), rules, ct, qt, ckpt)
    q2.processAllAvailable(); q2.stop()
    spark.sql(s"REFRESH TABLE $ct"); spark.sql(s"REFRESH TABLE $qt")
    assert(spark.table(ct).count() + spark.table(qt).count() == 5)
  }

  test("splitByRules == runQuarantine's split (same compiler, no timestamp/sink/halt)") {
    val df = Seq((1L, 40000.0, "O"), (2L, 10.0, "F"), (3L, 50000.0, "X"))
      .toDF("k", "price", "status")
    val rules = Seq("ColumnValues 'status' in ['O','F']",
      "ColumnValues 'price' >= 30000")
    val (p1, f1) = new graft.dq.DqEngine().splitByRules(df, rules)
    val res = new graft.dq.DqEngine().runQuarantine(df, rules)
    assert(p1.select("k").as[Long].collect().toSet ==
      res.passed.select("k").as[Long].collect().toSet)
    assert(f1.select("k").as[Long].collect().toSet ==
      res.failed.select("k").as[Long].collect().toSet)
    assert(!f1.columns.contains("quarantine_timestamp"),
      "the gate split must stay deterministic (no wall-clock column)")
  }

  // ------------------------------------------------- delete propagation

  test("deleteRows: only affected partitions rewrite, emptied partitions clear, second run is a no-op") {
    import graft.catalog.{Compaction, Retention}
    val db = s"retdel${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.ev"
    Seq((1L, 100L, 1.0), (2L, 101L, 2.0), (3L, 102L, 3.0),
        (4L, 103L, 4.0), (5L, 100L, 5.0), (6L, 104L, 6.0))
      .toDF("id", "uid", "v")
      .withColumn("p", (col("uid") % 3).cast("int"))
      .write.partitionBy("p").saveAsTable(t)
    def fileSet(rel: String): Set[String] = {
      val (root, _) = Compaction.listManifests(spark, t)
      val dir = new org.apache.hadoop.fs.Path(root, rel)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(dir)) Set.empty
      else fs.listStatus(dir).map(s => s.getPath.getName + ":" + s.getModificationTime)
        .toSet
    }
    val untouchedBefore = fileSet("p=2") // uid 101, 104 — no deletes land here
    // delete uid 100 (both rows of p=1... 100%3=1) and uid 102 (sole row of p=0)
    val keys = Seq(100L, 102L, 999L).toDF("uid") // 999 matches nothing
    val r = Retention.deleteRows(spark, t, "uid", keys)
    assert(r.rowsDeleted == 3 && r.partitionsRewritten == 2 && r.partitionsSeen == 3)
    spark.sql(s"REFRESH TABLE $t")
    assert(spark.table(t).select("id").as[Long].collect().toSet == Set(2L, 4L, 6L))
    // p=0 held only uid 102 -> emptied, must not resurrect under dynamic-skip
    assert(spark.table(t).filter(col("p") === 0).count() == 0)
    // the untouched partition's files are bit-identical (same names+mtimes)
    assert(fileSet("p=2") == untouchedBefore,
      "an unaffected partition must not be rewritten")
    // idempotence: same request again touches nothing
    val r2 = Retention.deleteRows(spark, t, "uid", keys)
    assert(r2.rowsDeleted == 0 && r2.partitionsRewritten == 0)
    assert(spark.table(t).count() == 3)
  }

  test("deleteRows: unpartitioned table rewrites wholesale; no-match is a no-op") {
    import graft.catalog.Retention
    val db = s"retdel2${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.flat"
    Seq((1L, 10L), (2L, 11L), (3L, 10L)).toDF("id", "uid")
      .write.saveAsTable(t)
    val r = Retention.deleteRows(spark, t, "uid", Seq(10L).toDF("uid"))
    assert(r.rowsDeleted == 2 && r.partitionsRewritten == 1)
    spark.sql(s"REFRESH TABLE $t")
    assert(spark.table(t).select("id").as[Long].collect().toSeq == Seq(2L))
    val r2 = Retention.deleteRows(spark, t, "uid", Seq(77L).toDF("uid"))
    assert(r2.rowsDeleted == 0 && r2.partitionsRewritten == 0)
  }

  test("deleteRows: date-partitioned table (quoted partition literals)") {
    import graft.catalog.Retention
    val db = s"retdel3${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.dated"
    Seq((1L, 10L, "2024-01-01"), (2L, 11L, "2024-01-01"), (3L, 10L, "2024-01-02"))
      .toDF("id", "uid", "ds")
      .withColumn("dt", col("ds").cast("date")).drop("ds")
      .write.partitionBy("dt").saveAsTable(t)
    val r = Retention.deleteRows(spark, t, "uid", Seq(10L).toDF("uid"))
    assert(r.rowsDeleted == 2 && r.partitionsRewritten == 2 && r.partitionsSeen == 2)
    spark.sql(s"REFRESH TABLE $t")
    assert(spark.table(t).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("dpCounts: NULL and delimiter-bearing group values get DISTINCT noise draws") {
    // (NULL,'en') vs ('en',NULL) and ('a|b','c') vs ('a','b|c') would share
    // a concat_ws key; shared noise leaks the exact count difference
    val df = (Seq.fill(30)((null: String, "en")) ++ Seq.fill(40)(("en", null: String)) ++
      Seq.fill(50)(("a|b", "c")) ++ Seq.fill(60)(("a", "b|c")))
      .toDF("g1", "g2")
    val out = Privacy.dpCounts(df, Seq("g1", "g2"), epsilon = 0.5, seed = "s")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getDouble(2))
      .toMap
    assert(out.size == 4)
    val nEn = out((None, Some("en"))) - 30.0
    val enN = out((Some("en"), None)) - 40.0
    assert(nEn != enN, "NULL-position-swapped groups must not share a noise draw")
    val ab = out((Some("a|b"), Some("c"))) - 50.0
    val ab2 = out((Some("a"), Some("b|c"))) - 60.0
    assert(ab != ab2, "delimiter injection must not alias the noise key")
  }

  test("mat_vec: dimension mismatch fails loudly, never reads out of bounds") {
    import graft.functions.expressions.HashExpressions
    val m = Ann.jlMatrix(64, 16, "s")
    val short = Seq((1L, Array.fill(32)(1.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      short.select(HashExpressions.mat_vec(col("v"), m)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("matrix expects 64")), s"got $e")
  }

  // ------------------------------------------------- batch consolidation

  test("consolidateBatches: folds committed history, untouched tail partition stays byte-identical, crash re-run converges") {
    import graft.catalog.Compaction
    val db = s"consol${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val t = s"$db.corpus"
    (0 to 4).foreach { b =>
      Seq.tabulate(10)(i => (b * 100L + i, s"doc $b $i"))
        .toDF("doc_id", "text").withColumn("batch_id", lit(b.toLong))
        .write.mode(if (b == 0) "overwrite" else "append")
        .partitionBy("batch_id").saveAsTable(t)
    }
    val before = spark.table(t).select("doc_id").as[Long].collect().toSet
    def files(rel: String): Set[String] = {
      val (root, _) = Compaction.listManifests(spark, t)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val d = new org.apache.hadoop.fs.Path(root, rel)
      if (!fs.exists(d)) Set.empty
      else fs.listStatus(d).map(s => s.getPath.getName + ":" + s.getModificationTime).toSet
    }
    val tail = files("batch_id=4")
    val folded = Compaction.consolidateBatches(spark, t, upTo = 3L, Seq("doc_id"))
    assert(folded == 3) // partitions 0,1,2 folded into 3
    spark.sql(s"REFRESH TABLE $t")
    assert(spark.table(t).select("doc_id").as[Long].collect().toSet == before,
      "consolidation must be content-invariant")
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).toSet
    assert(parts == Set("batch_id=3", "batch_id=4"), parts.toString)
    assert(files("batch_id=4") == tail, "the uncommitted tail must stay untouched")
    // a reader with the gate's predicate sees the same stored set
    assert(spark.table(t).filter(col("batch_id") < 5).count() == 50)
    // no-op re-run
    assert(Compaction.consolidateBatches(spark, t, 3L, Seq("doc_id")) == 0)

    // crash-between-steps simulation: step 1 ran (target holds the full
    // union) but the source drops did not — duplicates exist; the re-run
    // must converge to the exact set
    val dup = spark.table(t).filter(col("batch_id") <= 4)
      .select("doc_id", "text").localCheckpoint(true)
    dup.createOrReplaceTempView("consol_dup")
    spark.sql(s"INSERT OVERWRITE TABLE $t PARTITION (batch_id=4) " +
      "SELECT doc_id, text FROM consol_dup")
    // partition 4 now holds the full 50-row union while partition 3 still
    // holds its 40 rows — 90 total, the duplicated mid-crash state
    assert(spark.table(t).count() == 90, "simulated crash leaves duplicates")
    assert(Compaction.consolidateBatches(spark, t, 4L, Seq("doc_id")) == 1)
    spark.sql(s"REFRESH TABLE $t")
    assert(spark.table(t).select("doc_id").as[Long].collect().toSet == before)
    assert(spark.table(t).count() == 50)
  }

  test("gate maintain hook: in-loop consolidation preserves the dedup fixpoint, partitions bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    def run(consolidate: Boolean): (Set[(Long, String)], Long) = {
      val db = s"gmaint${System.nanoTime()}"
      spark.sql(s"CREATE DATABASE $db")
      val (ct, rt) = (s"$db.corpus", s"$db.report")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_gm_ckpt").toString
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String, String)]
      val q = StreamingOps.ingestDedupGate(
        mem.toDF().toDF("doc_id", "blk", "text"),
        "text", "doc_id", Seq("blk"), 0.7, ct, rt, ckpt,
        maintainEvery = if (consolidate) 2 else 0,
        maintain = (ss, id) => {
          // fold corpus history below the committed watermark (the hook
          // runs after commit, so the watermark IS id)
          graft.catalog.Compaction.consolidateBatches(ss, ct, id, Seq("doc_id"))
          ()
        })
      (0 until 6).foreach { b =>
        mem.addData((1 to 3).map(i =>
          ((b * 10 + i).toLong, "k", s"doc text $b $i unique words")): _*)
        q.processAllAvailable()
      }
      q.stop()
      spark.sql(s"REFRESH TABLE $ct")
      (spark.table(ct).select("doc_id", "blk").as[(Long, String)].collect().toSet,
        spark.sql(s"SHOW PARTITIONS $ct").count())
    }
    val (plain, plainParts) = run(consolidate = false)
    val (folded, foldedParts) = run(consolidate = true)
    assert(folded == plain, "in-loop consolidation must not change the corpus")
    assert(plainParts == 6 && foldedParts < plainParts,
      s"consolidation must bound partition sprawl: $foldedParts vs $plainParts")
  }

  // ------------------------------------------------- LSH planner

  test("lshPlan: budget-exact splits, monotone midpoint, closed-form spot check") {
    import graft.operators.Dedup
    val rows = Dedup.lshPlan(spark, 0.7, 64)
      .orderBy("bands")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.map(r => r._1 * r._2).forall(_ == 64))
    // midpoint strictly decreasing in bands: more bands = looser threshold
    assert(rows.map(_._4).sliding(2).forall(p => p(1) < p(0)))
    val r16 = rows.find(_._1 == 16).get
    assert(math.abs(r16._3 - (1 - math.pow(1 - math.pow(0.7, 4), 16))) < 1e-6)
    assert(r16._4 == 0.5) // (1/16)^(1/4)
  }

  // ------------------------------------------------- Poisson bootstrap

  test("poissonBootstrap: deterministic, unbiased resample sizes, means bracket the truth") {
    import graft.operators.Sampling
    val df = Seq.tabulate(2000)(i => (i.toLong, (i % 100).toLong)).toDF("id", "x")
    val truth = (0 until 100).sum / 100.0 // 49.5
    val a = Sampling.poissonBootstrap(df, "id", "x", replicates = 20, seed = "b1")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(a.length == 20)
    val b = Sampling.poissonBootstrap(df, "id", "x", replicates = 20, seed = "b1")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "same seed must reproduce the resamples")
    // E[n_eff] = n; Poisson(1) spread over 2000 rows is ±~45 (1 sd) — 5 sd band
    a.foreach { case (_, nEff, _) =>
      assert(math.abs(nEff - 2000L) < 250, s"n_eff $nEff implausible for Poisson(1)")
    }
    // replicate means must cluster around the truth (se ≈ sd/sqrt(n) ≈ 0.65)
    val means = a.map(_._3)
    assert(means.forall(m => math.abs(m - truth) < 4.0), means.take(5).toSeq.toString)
    assert(means.distinct.length > 1, "replicates must actually differ")
    val grand = means.sum / means.length
    assert(math.abs(grand - truth) < 1.0)
  }

  // ------------------------------------------------- streaming ANN ingest

  test("ingestAnnGate: streamed index equals the one-shot build; replay adds nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.expressions.HashExpressions.fixedCentroids
    val db = s"anngate${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db")
    val it = s"$db.idx"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_anngate_ckpt").toString
    val cs = fixedCentroids(100, 4, 8)
    val fc = fixedCentroids(200, 8, 4)
    val cb = Array.tabulate(2)(j => fc.slice(j * 4, j * 4 + 4))
    val vecs = Seq.tabulate(40)(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11).toFloat)))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.StreamingOps.ingestAnnGate(
      mem.toDF().toDF("vec_id", "embedding"), "embedding", "vec_id",
      cs, cb, it, ckpt)
    mem.addData(vecs.take(25): _*); q.processAllAvailable()
    mem.addData(vecs.drop(25): _*); q.processAllAvailable()
    q.stop()
    spark.sql(s"REFRESH TABLE $it")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("__list"), col("code"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    val oneShot = Ann.ivfPqIndex(
      vecs.toDF("vec_id", "embedding"), "embedding", "vec_id", cs, cb)
    assert(key(spark.table(it)) == key(oneShot),
      "batch boundaries must not change a row-wise encode")
    // restart over the same checkpoint: nothing reprocessed
    val q2 = graft.streaming.StreamingOps.ingestAnnGate(
      mem.toDF().toDF("vec_id", "embedding"), "embedding", "vec_id",
      cs, cb, it, ckpt)
    q2.processAllAvailable(); q2.stop()
    spark.sql(s"REFRESH TABLE $it")
    assert(spark.table(it).count() == 40)

    // maintenance composition: fold the committed batch history into one
    // partition — the search over the consolidated index is identical
    val queries = vecs.take(3).toDF("vec_id", "embedding")
      .select(col("vec_id").as("query_id"), col("embedding"))
    def search() = Ann.ivfPqSearch(
        spark.table(it).select(col("vec_id"), col("__list"), col("code")),
        queries, "embedding", "vec_id", "query_id", cs, cb, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val before = search()
    val wm = graft.streaming.BatchCommitLog.committed(spark, ckpt).get
    assert(graft.catalog.Compaction.consolidateBatches(
      spark, it, wm, Seq("vec_id")) == 1)
    spark.sql(s"REFRESH TABLE $it")
    assert(spark.sql(s"SHOW PARTITIONS $it").count() == 1)
    assert(search() == before,
      "consolidating index history must not change a single search result")
  }
}
