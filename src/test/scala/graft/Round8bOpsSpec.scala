package graft

import graft.functions.expressions.{SketchAggregates => SK}
import graft.functions.{SimilarityFunctions => S}
import graft.operators.{ConnectedComponents, CorpusStats, Layout, WindowOps}
import org.apache.spark.sql.functions._

/** Round-8 additions, second wave: KMV set operations, cluster
  * canonicalization, Z-order layout, batch sessionization, token-distribution
  * divergence. */
class Round8bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- batch sessionize

  test("sessionize: gap over threshold opens a new session, per user") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    val events = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(10)), (3L, 1L, ts(10 + 3601)),
      (4L, 2L, ts(5))
    ).toDF("event_id", "user_id", "ts")
    val out = WindowOps.sessionize(events, "user_id", "ts", gapSeconds = 3600,
        tieBreak = Seq(col("event_id")))
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("sessionize: exact-boundary gap does NOT split (strictly greater opens)") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (1L, 1L, t0),
      (2L, 1L, new java.sql.Timestamp(t0.getTime + 3600 * 1000L))
    ).toDF("event_id", "user_id", "ts")
    val out = WindowOps.sessionize(events, "user_id", "ts", 3600,
        Seq(col("event_id")))
      .select("session_idx").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  // ------------------------------------------------- morton / z-order

  test("mortonCode interleaves bits round-robin, dim 0 least significant") {
    // x=3 (011), y=5 (101), 3 bits: x bits at positions 0,2,4; y at 1,3,5
    // x: b0=1->pos0, b1=1->pos2, b2=0; y: b0=1->pos1, b1=0, b2=1->pos5
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.mortonCode(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].head()
    assert(out == (1L | 2L | 4L | 32L))
  }

  test("mortonCode truncates to the low `bits` bits") {
    val out = Seq((256L + 3L, 0L)).toDF("x", "y")
      .select(Layout.mortonCode(Seq(col("x"), col("y")), 8).as("z"))
      .as[Long].head()
    val base = Seq((3L, 0L)).toDF("x", "y")
      .select(Layout.mortonCode(Seq(col("x"), col("y")), 8).as("z"))
      .as[Long].head()
    assert(out == base)
  }

  test("zorderBy: partitions are internally sorted and range-disjoint") {
    val df = spark.range(0, 2000).select(
      (col("id") * 7919 % 256).as("x"), (col("id") * 104729 % 256).as("y"))
    val parts = Layout.zorderBy(df, Seq(col("x"), col("y")), 8, numPartitions = 4)
      .select("zval").as[Long].rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val v = it.toVector
        Iterator.single((pid, v == v.sorted, v.headOption, v.lastOption))
      }.collect().sortBy(_._1)
    assert(parts.forall(_._2), "each partition sorted by zval")
    val nonEmpty = parts.filter(_._3.isDefined)
    nonEmpty.sliding(2).foreach {
      case Array((_, _, _, Some(hi)), (_, _, Some(lo), _)) =>
        assert(hi <= lo, s"range partitions overlap: $hi > $lo")
      case _ =>
    }
  }

  // ------------------------------------------------- KMV set operations

  test("kmv set ops: small-set regime is exact") {
    // two sides with known distinct hash sets, both under k
    val rows = ((1 to 20).map(i => (0, i.toLong * 10)) ++
      (11 to 30).map(i => (1, i.toLong * 10))).toDF("half", "h")
    val k = 64
    val sks = rows.groupBy(col("half")).agg(SK.kmv_sketch(col("h"), k).as("sk"))
    val a = sks.filter(col("half") === 0).select(col("sk").as("ska"))
    val b = sks.filter(col("half") === 1).select(col("sk").as("skb"))
    val out = a.crossJoin(b).select(
      SK.kmv_estimate(col("ska"), k).as("ea"),
      SK.kmv_estimate(SK.kmv_union(col("ska"), col("skb"), k), k).as("eu"),
      SK.kmv_jaccard(col("ska"), col("skb"), k).as("j"),
      SK.kmv_intersect_estimate(col("ska"), col("skb"), k).as("ei"))
      .as[(Double, Double, Double, Double)].head()
    assert(out._1 == 20.0)            // |A| exact
    assert(out._2 == 30.0)            // |A u B| exact
    assert(out._3 == 10.0 / 30.0)     // true Jaccard
    assert(math.abs(out._4 - 10.0) < 1e-9) // intersection exact
  }

  test("kmv set ops: full-sketch regime matches the hand-computed estimator") {
    val k = 8
    // deterministic "hashes": i * 2^52 spreads values over the 60-bit domain
    def h(i: Int): Long = i.toLong << 52
    val rows = ((1 to 100).map(i => (0, h(i))) ++
      (51 to 150).map(i => (1, h(i)))).toDF("half", "h")
    val sks = rows.groupBy(col("half")).agg(SK.kmv_sketch(col("h"), k).as("sk"))
    val a = sks.filter(col("half") === 0).select(col("sk").as("ska"))
    val b = sks.filter(col("half") === 1).select(col("sk").as("skb"))
    val out = a.crossJoin(b).select(
      SK.kmv_estimate(col("ska"), k).as("ea"),
      SK.kmv_jaccard(col("ska"), col("skb"), k).as("j"))
      .as[(Double, Double)].head()
    // A's bottom-8 = h(1..8); estimator (k-1)*2^60 / h(8)
    assert(out._1 == 7.0 * math.pow(2, 60) / h(8).toDouble)
    // union bottom-8 = h(1..8) (A side only; B starts at 51) -> no common
    assert(out._2 == 0.0)
  }

  // ------------------------------------------------- bottom-k regression

  test("bottom_k_struct survives partial serialization with FIXED-width rows" +
    " (shared-buffer aliasing regression)") {
    // md5-hex keys are constant-width: before the fix, serialize re-projected
    // every entry through one shared buffer and getBytes aliased it — each
    // partition's partial collapsed to ONE row (output size == #partitions)
    for (parts <- Seq(1, 8)) {
      val out = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "id")
        .repartition(parts)
        .select(col("g"), col("id"),
          md5(concat(lit("x|"), col("id").cast("string"))).as("h"))
        .groupBy(col("g"))
        .agg(SK.bottom_k_struct(struct(col("h"), col("id")), 25).as("s"))
        .select(size(col("s"))).as[Int].head()
      assert(out == 25, s"parts=$parts got $out")
    }
  }

  test("groupSample: every group capped at k, deterministic across runs") {
    val docs = sf("documents").select(col("doc_id"), col("source"))
    val a = graft.operators.Sampling.groupSample(docs, "doc_id", "source", 5, "s1")
    val sizes = a.groupBy(col("source")).count().select("count").as[Long].collect()
    assert(sizes.forall(_ <= 5))
    val b = graft.operators.Sampling.groupSample(docs, "doc_id", "source", 5, "s1")
    assert(a.collect().toSet == b.collect().toSet)
    // a different seed draws a different sample
    val c = graft.operators.Sampling.groupSample(docs, "doc_id", "source", 5, "s2")
    assert(a.select("doc_id").as[Long].collect().toSet !=
      c.select("doc_id").as[Long].collect().toSet)
  }

  test("qualityQuota keeps exactly ceil(frac*n) per group, best first") {
    val rows = (1 to 10).map(i => (i.toLong, "g", i.toLong * 10)).toDF("id", "g", "score")
    val out = graft.operators.Sampling.qualityQuota(rows, "id", "g", "score", 3, 10)
      .select("id").as[Long].collect().toSet
    // ceil(0.3*10)=3 best scores = ids 10,9,8
    assert(out == Set(10L, 9L, 8L))
  }

  // ------------------------------------------------- canonicalization

  test("canonicalize keeps argmax score with min-id ties; singletons self") {
    val rows = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L)).toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = ConnectedComponents.canonicalize(rows, pairs, "id", "score")
      .select("component", "canonical_id", "score", "n_members")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 9L, 3L), (4L, 4L, 1L, 1L)))
  }

  // ------------------------------------------------- divergence

  test("tokenDivergence: identical slices give zero KL and chi2") {
    val docs = Seq(
      ("en", 0, Seq("a", "a", "b")), ("en", 1, Seq("a", "a", "b"))
    ).toDF("lang", "side", "toks")
    val out = CorpusStats.tokenDivergence(docs, "toks", "lang", "side")
      .select("v", "na", "nb", "kl_ab", "kl_ba", "chi2")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(out == ((2L, 3L, 3L, 0.0, 0.0, 0.0)))
  }

  test("tokenDivergence: shifted slice gives positive divergence both ways") {
    val docs = Seq(
      ("en", 0, Seq("a", "a", "a", "b")), ("en", 1, Seq("a", "b", "b", "b"))
    ).toDF("lang", "side", "toks")
    val out = CorpusStats.tokenDivergence(docs, "toks", "lang", "side")
      .select("kl_ab", "kl_ba", "chi2")
      .as[(Double, Double, Double)].head()
    assert(out._1 > 0 && out._2 > 0)
    // chi2 = (3-1)^2/4 + (1-3)^2/4 = 2
    assert(math.abs(out._3 - 2.0) < 1e-12)
  }

  // ------------------------------------------------- shingle kernel parity

  test("shingle_strings kernel matches the HOF formula on edge cases") {
    import graft.functions.expressions.HashExpressions.shingle_strings
    val cases = Seq(
      "the quick brown fox", "  leading and trailing  ", "one",
      "a a a a", "tabs\tand\nnewlines mixed   spaces", "", "   ",
      "UPPER Case MiXeD", "x y x y x y")
    val df = cases.zipWithIndex.map(_.swap).toDF("i", "t")
    for (n <- Seq(1, 2, 3)) {
      // reference: the old interpreted HOF formula
      val ts = S.tokens(col("t"))
      val grams = transform(sequence(lit(0), size(ts) - n), i =>
        array_join(slice(ts, i + 1, lit(n)), " "))
      val ref = when(size(ts) >= n, array_distinct(grams))
        .otherwise(array().cast("array<string>"))
      val rows = df.select(col("i"), shingle_strings(col("t"), n).as("k"), ref.as("r"))
        .collect()
      rows.foreach { row =>
        assert(row.getSeq[String](1) == row.getSeq[String](2),
          s"n=$n case=${cases(row.getInt(0))}: ${row.getSeq[String](1)} != ${row.getSeq[String](2)}")
      }
    }
  }

  test("sorted_intersect_count equals array_intersect size on random long arrays") {
    import graft.functions.expressions.HashExpressions.sorted_intersect_count
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
        sorted_intersect_count(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("r"))
      .filter(col("k") =!= col("r")).count()
    assert(bad == 0)
  }

  // ------------------------------------------------- hilbert curve

  test("hilbertIndex: consecutive indices are ALWAYS grid-adjacent (the property Z-order lacks)") {
    import graft.functions.expressions.Kernels
    val bits = 4 // full 16x16 grid = 256 cells
    val cells = for { x <- 0L until 16L; y <- 0L until 16L }
      yield (Kernels.hilbertIndex(x, y, bits), (x, y))
    val byD = cells.sortBy(_._1)
    // bijection onto [0, 256)
    assert(byD.map(_._1) == (0L until 256L))
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
    // Morton, by contrast, jumps at the first quadrant seam
    val mByD = (for { x <- 0L until 16L; y <- 0L until 16L } yield {
      var z = 0L
      for (j <- 0 until bits) z |= (((x >> j) & 1) << (2 * j)) | (((y >> j) & 1) << (2 * j + 1))
      (z, (x, y))
    }).sortBy(_._1)
    val jumps = mByD.sliding(2).count { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(jumps > 0, "morton should have seam jumps on this grid")
  }

  test("hilbertBy layout: one range exchange, partitions sorted by hval") {
    val df = spark.range(0, 1000).select(
      pmod(col("id") * 7, lit(64L)).as("x"), pmod(col("id") * 11, lit(64L)).as("y"))
    val out = graft.operators.Layout.hilbertBy(df, col("x"), col("y"), 6, 4)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning(hval"), p)
    assert("Exchange".r.findAllIn(p).length == 1, p)
    val parts = out.select("hval").as[Long].rdd
      .mapPartitions(it => Iterator.single { val v = it.toVector; v == v.sorted })
      .collect()
    assert(parts.forall(identity))
  }

  // ------------------------------------------------- eval analytics

  test("classifierEval: hand-checked confusion metrics, incl. never-predicted class") {
    val scored = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),   // a: tp=2, fn=1
      ("b", "a"), ("b", "b"),               // b: tp=1, fp from a's side
      ("c", "a")                            // c never predicted
    ).toDF("label", "pred")
    val m = graft.operators.Retrieval.classifierEval(scored, "label", "pred")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // a: support 3, predicted 4, tp 2 -> p=0.5 r=2/3
    assert(m("a") == ((3L, 4L, 2L, 0.5, 0.666667)))
    // b: support 2, predicted 2, tp 1 -> p=r=0.5
    assert(m("b") == ((2L, 2L, 1L, 0.5, 0.5)))
    // c: support 1, predicted 0, tp 0 -> p=0 r=0 f1=0
    assert(m("c") == ((1L, 0L, 0L, 0.0, 0.0)))
  }

  test("ngramDiversity: closed-form ratios on a two-doc group") {
    val docs = Seq(("g", "a b a b"), ("g", "a b c")).toDF("src", "text")
    val r = graft.operators.CorpusStats.ngramDiversity(docs, "text", "src", Seq(1, 2))
      .head()
    // n1: total 7 tokens, distinct {a,b,c}=3; n2: total 5 grams, distinct {a b, b a, b c}=3
    assert((r.getLong(1), r.getLong(2)) == ((7L, 3L)))
    assert((r.getLong(4), r.getLong(5)) == ((5L, 3L)))
    assert(r.getDouble(6) == 0.6)
  }

  // ------------------------------------------------- augmentation

  test("tokenDropout: deterministic, rate near p, never empties a doc") {
    val docs = (1 to 50).map(i => (i.toLong, Seq.fill(40)("w").zipWithIndex
      .map { case (w, j) => s"$w$j" }.mkString(" "))).toDF("id", "text")
    val a = graft.operators.Augment.tokenDropout(docs, "id", "text", "s1", 300)
    val b = graft.operators.Augment.tokenDropout(docs, "id", "text", "s1", 300)
    assert(a.collect().toSeq == b.collect().toSeq)
    val kept = a.agg(sum("n_kept"), sum("n_tokens")).as[(Long, Long)].head()
    val rate = 1.0 - kept._1.toDouble / kept._2
    assert(rate > 0.2 && rate < 0.4, s"drop rate $rate should be near 0.30")
    assert(a.filter(col("n_kept") === 0).count() == 0)
    // p=999 keeps ONLY position 0
    val ext = graft.operators.Augment.tokenDropout(docs, "id", "text", "s1", 999)
    assert(ext.select("n_kept").as[Long].collect().forall(_ >= 1))
  }

  test("winnowing: shared substring >= w+k-1 chars guarantees a match; disjoint docs never pair") {
    val planted = "the quick brown fox jumps over it" // 33 chars >> w+k-1 = 15
    val docs = Seq(
      (1L, s"aaaa bbbb cccc dddd $planted eeee ffff"),
      (2L, s"gggg hhhh $planted iiii jjjj kkkk llll"),
      (3L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq"),
      (4L, "mmmm nnnn oooo pppp 1111 2222 3333 4444 5555 6666")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.winnowMatches(docs, "text", "doc_id",
        k = 8, w = 8, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "winnowing guarantee: planted overlap must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // fingerprint density lands near the 2/(w+1) theory on long docs
    val longDoc = Seq((9L, (1 to 400).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val fp = graft.operators.Dedup.winnowFingerprints(longDoc, "text", "doc_id", 8, 8)
    val nChars = longDoc.select(length(col("text"))).as[Int].head()
    val density = fp.count().toDouble / (nChars - 8 + 1)
    assert(density > 0.1 && density < 0.4, s"density $density should be near 2/9")
    // positions point at real k-grams: every fp equals the rolling hash there
    val txt = longDoc.select("text").as[String].head()
    val cps = txt.codePoints().toArray
    def refHash(p: Int): Long = {
      var h = 0L; var j = 0
      while (j < 8) { h = (h * 257 + cps(p + j)) % 2147483647L; j += 1 }
      h
    }
    fp.select("pos", "fp").as[(Int, Long)].collect().foreach { case (p, f) =>
      assert(refHash(p) == f, s"fingerprint at $p mismatches the k-gram hash")
    }
  }

  test("spanCorrupt: sentinel round-trip reconstructs the original; invariants hold") {
    val docs = (1 to 40).map(i => (i.toLong,
      (0 until 30).map(j => s"tok${i}_$j").mkString(" "))) :+ ((99L, "  "))
    val df = docs.toDF("doc_id", "text")
    val out = graft.operators.Augment.spanCorrupt(df, "doc_id", "text", "sp", 120, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(!out.exists(_._1 == 99L)) // token-less doc emits no row
    assert(out.length == 40)
    assert(out.exists(_._3 > 0), "at 12% anchor rate something must corrupt")
    val sent = "<extra_id_(\\d+)>".r
    out.foreach { case (id, nTok, nCorr, nSpans, inputs, targets) =>
      // sentinels numbered 0..n_spans-1, in order, same ids in both strings
      val inpKs = sent.findAllMatchIn(inputs).map(_.group(1).toInt).toSeq
      val tgtKs = sent.findAllMatchIn(targets).map(_.group(1).toInt).toSeq
      assert(inpKs == (0 until nSpans.toInt) && tgtKs == inpKs, s"doc $id sentinels")
      // token accounting: kept + corrupted == total
      val inpToks = if (inputs.isEmpty) 0 else inputs.split(" ").length
      assert(inpToks - nSpans + nCorr == nTok, s"doc $id counts")
      // ROUND-TRIP: substituting each sentinel's target span back into the
      // inputs must reproduce the original tokenization exactly
      val spans = sent.split(targets).map(_.trim).filter(_.nonEmpty) // span k at index k-? split leads with ""
      val spanByK = tgtKs.zip(sent.split(targets).drop(1).map(_.trim)).toMap
      val rebuilt = inputs.split(" ").flatMap { t =>
        sent.findFirstMatchIn(t) match {
          case Some(m) => spanByK(m.group(1).toInt).split(" ").toSeq
          case None => Seq(t)
        }
      }.mkString(" ")
      val original = docs.find(_._1 == id).get._2.toLowerCase.trim.split("\\s+").mkString(" ")
      assert(rebuilt == original, s"doc $id round-trip")
      assert(spans.length == nSpans)
    }
    // deterministic
    val again = graft.operators.Augment.spanCorrupt(df, "doc_id", "text", "sp", 120, 3)
      .collect().map(_.toString).sorted.toSeq
    assert(again == out.map(r => org.apache.spark.sql.Row(
      r._1, r._2, r._3, r._4, r._5, r._6).toString).sorted.toSeq)
  }

  test("upsampleByFactor: copy counts follow the factor, ids stable and distinct") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "lang")
    val out = graft.operators.Augment.upsampleByFactor(
      docs, "id", col("id"), maxRepeats = 4)
    val counts = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    val ids = out.select("aug_id").as[Long].collect()
    assert(ids.distinct.length == ids.length)
    // factor above the cap clamps
    val capped = graft.operators.Augment.upsampleByFactor(
      docs, "id", lit(99L), maxRepeats = 4)
    assert(capped.count() == 12)
  }

  // ------------------------------------------------- dict-scores kernel

  test("dict_scores equals per-word regexp_count on boundary edge cases") {
    import graft.functions.expressions.HashExpressions.dict_scores
    val dicts = Seq(Seq("the", "and"), Seq("der"), Seq("\u7684"))
    val texts = Seq(
      "the theater and band the", // 'the' at ends, inside 'theater'/'and' inside 'band'
      "The AND the",              // case folding
      "x\u7684y\u7684",         // CJK substring counting, no boundaries
      "andand the_and and-the",   // underscore is a word char; dash is not
      "", "der die derder")
    val df = texts.zipWithIndex.map(_.swap).toDF("i", "t")
    val got = df.select(col("i"), dict_scores(col("t"), dicts).as("s"))
      .orderBy("i").collect().map(_.getSeq[Int](1))
    def rx(t: String, w: String) = {
      val p = java.util.regex.Pattern.compile(
        if (w.matches("^\\w+$") || w.forall(_.isLetterOrDigit) && w.forall(_ < 128))
          "\\b" + java.util.regex.Pattern.quote(w) + "\\b"
        else java.util.regex.Pattern.quote(w))
      val m = p.matcher(t.toLowerCase); var c = 0; while (m.find()) c += 1; c
    }
    texts.zipWithIndex.foreach { case (t, i) =>
      val expect = dicts.map(_.map(w => rx(t, w)).sum)
      assert(got(i).toSeq == expect, s"text '$t': ${got(i)} != $expect")
    }
  }

  test("mergeHllStates: merge == union sketch; disjoint keys pass through; commutative") {
    def sk(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("g")).agg(SK.hll_sketch(col("v").cast("string"), 8).as("regs"))
    val a = sk((1 to 300).map(i => ("x", i)).toDF("g", "v"))
    val b = sk(((200 to 500).map(i => ("x", i)) ++ (1 to 50).map(i => ("y", i))).toDF("g", "v"))
    val full = sk(((1 to 500).map(i => ("x", i)) ++ (1 to 50).map(i => ("y", i))).toDF("g", "v"))
    def est(df: org.apache.spark.sql.DataFrame) = df
      .select(col("g"), SK.hll_estimate(col("regs"), 8).as("e"))
      .as[(String, Double)].collect().toMap
    val ab = est(graft.operators.CorpusStats.mergeHllStates(a, b, Seq("g"), "regs"))
    val ba = est(graft.operators.CorpusStats.mergeHllStates(b, a, Seq("g"), "regs"))
    assert(ab == est(full))
    assert(ab == ba)
    assert(ab.contains("y")) // key only on one side passes through
  }

  test("keySkewReport: closed-form Gini for uniform and one-hot distributions") {
    // uniform: gini exactly 0
    val uni = (1 to 100).map(i => ("k" + (i % 4)).toString).toDF("k")
    val g0 = graft.operators.CorpusStats.keySkewReport(uni, "k", 2)
      .select("gini_r").as[Double].head()
    assert(g0 == 0.0)
    // extreme: one key has 97 of 100 rows -> gini = 2*(1*1+2*1+3*1+4*97)/(4*100) - 5/4
    val hot = ((1 to 97).map(_ => "hot") ++ Seq("a", "b", "c")).toDF("k")
    val r = graft.operators.CorpusStats.keySkewReport(hot, "k", 1).head()
    assert(r.getAs[Long]("n_keys") == 4 && r.getAs[Long]("max_count") == 97)
    assert(r.getAs[String]("top1_key") == "hot" && r.getAs[Long]("top1_n") == 97)
    val expected = 2.0 * (1 + 2 + 3 + 4 * 97) / (4 * 100) - 5.0 / 4
    assert(math.abs(r.getAs[Double]("gini_r") - expected) < 1e-6)
  }

  test("cms_join_estimate: never underestimates; exact when width clears all collisions") {
    val a = (1 to 500).map(i => ("k" + (i % 40)).toString).toDF("k")
    val b = (1 to 300).map(i => ("k" + (i % 25)).toString).toDF("k")
    val truth = a.join(b, Seq("k")).count()
    def est(w: Int) = a.agg(SK.cms_sketch(col("k"), 4, w).as("sa")).crossJoin(
        b.agg(SK.cms_sketch(col("k"), 4, w).as("sb")))
      .select(SK.cms_join_estimate(col("sa"), col("sb"), 4, w)).as[Long].head()
    assert(est(8) >= truth, "narrow sketch must overestimate, never under")
    // 4096 buckets for 40 distinct keys: collision-free with overwhelming
    // probability under the salted md5 -> inner product is EXACT
    assert(est(4096) == truth)
  }
}
