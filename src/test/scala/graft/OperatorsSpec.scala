package graft

import graft.functions.{SimilarityFunctions => S, StructuredTransforms => G, TextFunctions => T}
import graft.mapping.{CustomMapping, FuzzyScorers, MappingRow}
import graft.operators.{Ann, Dedup, Lookup, WindowOps}
import org.apache.spark.sql.functions._

class LookupSpec extends SparkSpec {
  import spark.implicits._
  private val lkp = Seq(("S", "Smoker"), ("N", "NonSmoker")).toDF("orig_value", "new_value")

  test("lookup replaces in place; nomatch fills default") {
    val df = Seq(("p1", "S"), ("p2", "N"), ("p3", "X")).toDF("id", "smokingclass")
    val got = Lookup.lookup(df, lkp, "smokingclass", noMatch = Some("N/A"))
      .orderBy("id").select("smokingclass").as[String].collect().toSeq
    assert(got == Seq("Smoker", "NonSmoker", "N/A"))
  }

  test("lookup derives new column when source given; unmatched stays null") {
    val df = Seq(("p1", "S"), ("p3", "X")).toDF("id", "sc")
    val out = Lookup.lookup(df, lkp, "sc_desc", source = Some("sc")).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "sc", "sc_desc"))
    assert(out.select("sc_desc").as[Option[String]].collect().toSeq == Seq(Some("Smoker"), None))
  }

  test("multilookup joins composite key and fills nomatch attributes") {
    val lookupDf = Seq(("a-1", "east", 10), ("b-2", "west", 20))
      .toDF("lookup_item", "region", "zone")
    val df = Seq(("r1", "a", 1), ("r2", "b", 2), ("r3", "c", 3)).toDF("id", "k1", "k2")
    val got = Lookup.multiLookup(df, lookupDf, Seq("k1", "k2"), "lookup_item",
        Seq("region", "zone"), noMatch = Map("region" -> "none", "zone" -> -1))
      .orderBy("id").select("region", "zone").as[(String, Int)].collect().toSeq
    assert(got == Seq(("east", 10), ("west", 20), ("none", -1)))
  }
}

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fillDown forward-fills within partition by sort order") {
    val df = Seq((1, 1, Some("a")), (1, 2, None), (1, 3, None), (2, 1, None), (2, 2, Some("z")))
      .toDF("grp", "seq", "v")
    val got = WindowOps.fillDown(df, Seq("v"), Seq($"seq"), Seq($"grp"))
      .orderBy("grp", "seq").select("v").as[Option[String]].collect().toSeq
    assert(got == Seq(Some("a"), Some("a"), Some("a"), None, Some("z")))
  }

  test("rowNumber defaults to lit(1) partition/sort") {
    val df = Seq("a", "b", "c").toDF("v")
    val got = WindowOps.rowNumber(df, "rn").select("rn").as[Int].collect().toSeq.sorted
    assert(got == Seq(1, 2, 3))
  }

  test("topKPerGroup bounds each group to k rows") {
    val df = Seq((1, 10), (1, 20), (1, 30), (2, 5)).toDF("g", "v")
    val got = WindowOps.topKPerGroup(df, Seq($"g"), Seq($"v".desc), 2)
    assert(got.count() == 3)
    assert(got.filter($"g" === 1).agg(max("v")).as[Int].head() == 30)
  }
}

class StructuredSpec extends SparkSpec {
  import spark.implicits._

  test("expandArray explodes with 1-based index, keeps null rows (outer)") {
    val df = Seq((1, Seq("x", "y")), (2, null)).toDF("id", "arr")
    val got = G.expandArray(df, "arr", "idx", "v").orderBy("id", "idx")
      .select("id", "idx", "v").as[(Int, Option[Int], Option[String])].collect().toSeq
    assert(got == Seq((1, Some(1), Some("x")), (1, Some(2), Some("y")), (2, None, None)))
  }

  test("expandMap converts struct→map and explodes (index,key,value)") {
    val df = spark.sql("SELECT 1 AS id, named_struct('a', 10, 'b', 20) AS st")
    val got = G.expandMap(df, "st", "idx", "k", "v").orderBy("idx")
      .select("idx", "k", "v").as[(Int, String, Int)].collect().toSeq
    assert(got == Seq((1, "a", 10), (2, "b", 20)))
  }

  test("flattenOneLevel prefixes child fields; flattenSchema recurses") {
    val df = spark.sql(
      "SELECT 1 AS id, named_struct('x', 1, 'y', named_struct('z', 2)) AS s")
    val one = G.flattenOneLevel(df, "s")
    assert(one.columns.toSeq == Seq("id", "s_x", "s_y"))
    val full = G.flattenSchema(df)
    assert(full.columns.toSeq == Seq("id", "s_x", "s_y_z"))
    assert(full.select("s_y_z").as[Int].head() == 2)
  }

  test("jsonStringToStruct infers schema from the column") {
    val df = Seq("""{"a":1,"b":"x"}""", """{"a":2,"b":"y"}""").toDF("j")
    val got = G.jsonStringToStruct(df, "j")
    assert(got.select($"j.a").as[Long].collect().toSeq.sorted == Seq(1L, 2L))
  }

  test("expandPolicyMonths: one row per calendar month, index + last day") {
    val df = Seq(("2024-01-15", "2024-03-10")).toDF("eff", "exp")
      .select($"eff".cast("date").as("eff"), $"exp".cast("date").as("exp"))
    val got = G.expandPolicyMonths(df, "eff", "exp")
    assert(got.count() == 3)
    val last = got.orderBy($"policy_month_index".desc).head()
    assert(last.getAs[Int]("policy_month_index") == 3)
    assert(last.getAs[java.sql.Date]("last_day_of_month").toString == "2024-03-31")
  }
}

class MappingSpec extends SparkSpec {
  import spark.implicits._

  test("applyMapping renames, drops destname=null, discards unmapped") {
    val df = Seq((1, "a", 2.0, true)).toDF("keep", "rename", "drop", "unmapped")
    val out = CustomMapping.applyMapping(df, Seq(
      MappingRow("keep", "kept"), MappingRow("rename", "renamed"), MappingRow("drop", "null")))
    assert(out.columns.toSeq == Seq("kept", "renamed"))
  }

  test("applyMapping fuzzy row matches leftover source column by scorer") {
    val df = Seq((1, "x")).toDF("policyid", "insured_company_nam") // typo'd source
    val out = CustomMapping.applyMapping(df, Seq(
      MappingRow("policyid", "policy_id"),
      MappingRow("insured company name", "company", Some(80.0), Some("token_sort_ratio"))))
    assert(out.columns.toSeq == Seq("policy_id", "company"))
  }

  test("applyMapping addresses nested fields via the reference backtick-path dialect") {
    val df = spark.sql("SELECT named_struct('b', named_struct('c', 7)) AS a")
    val out = CustomMapping.applyMapping(df, Seq(MappingRow("`a`.`b`.`c`", "leaf")))
    assert(out.select("leaf").as[Int].head() == 7)
  }

  test("applyMapping can map a whole sub-struct to one column and drop its parent") {
    val df = spark.sql("SELECT 1 AS id, named_struct('addr', named_struct('city', 'x'), 'n', 5) AS ins")
    val out = CustomMapping.applyMapping(df, Seq(
      MappingRow("id", "id"), MappingRow("ins", "null"),
      MappingRow("`ins`.`addr`", "addresses"), MappingRow("`ins`.`n`", "n_employees")))
    assert(out.columns.toSeq == Seq("id", "addresses", "n_employees"))
    assert(out.select("addresses.city").as[String].head() == "x")
  }

  test("cleanName sanitizes to parquet/athena-safe form") {
    assert(CustomMapping.cleanName("  My Col; (USD) ") == "my_col_usd")
    assert(CustomMapping.cleanName("a.b:c d") == "a_b_c_d")
  }

  test("FuzzyScorers known values") {
    assert(FuzzyScorers.ratio("abcd", "abcd") == 100.0)
    assert(math.abs(FuzzyScorers.ratio("kitten", "sitting") - 61.538) < 0.01)
    assert(FuzzyScorers.tokenSortRatio("world hello", "hello world") == 100.0)
    assert(FuzzyScorers.partialRatio("abc", "xxabcxx") == 100.0)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("jaroWinkler matches published values") {
    assert(math.abs(S.jaroWinkler("MARTHA", "MARHTA") - 0.9611) < 1e-3)
    assert(math.abs(S.jaroWinkler("DIXON", "DICKSONX") - 0.8133) < 1e-3)
    assert(S.jaroWinkler("same", "same") == 1.0)
    assert(S.jaroWinkler("", "x") == 0.0)
  }

  test("minhash estimate approximates true jaccard") {
    val df = Seq(
      ("a b c d e f g h i j", "a b c d e f g h i x"),
      ("a b c d e", "v w x y z")).toDF("t1", "t2")
    val got = df.select(
      S.minhashJaccardEstimate(
        S.minHashSignature(S.wordShingles($"t1", 1), 128),
        S.minHashSignature(S.wordShingles($"t2", 1), 128)).as("est"),
      S.jaccard(S.wordShingles($"t1", 1), S.wordShingles($"t2", 1)).as("true"))
      .as[(Double, Double)].collect()
    got.foreach { case (est, truth) => assert(math.abs(est - truth) < 0.15) }
  }

  test("simhash: identical texts collide, disjoint texts differ") {
    val df = Seq(("x y z", "x y z", "p q r s t u v w")).toDF("a", "b", "c")
    val row = df.select(
      S.simHash64(S.tokens($"a")).as("ha"),
      S.simHash64(S.tokens($"b")).as("hb"),
      S.simHash64(S.tokens($"c")).as("hc"))
    val r = row.head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("cosine: parallel=1, orthogonal=0") {
    val df = Seq((Seq(1f, 0f), Seq(2f, 0f), Seq(0f, 3f))).toDF("a", "b", "c")
    val r = df.select(S.cosine($"a", $"b").as("p"), S.cosine($"a", $"c").as("o")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && math.abs(r.getDouble(1)) < 1e-12)
  }
}

class DedupAnnSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps min id per key with dup_count") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "k")
    val got = Dedup.exact(df, Seq("k"), "id").orderBy("k")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("x", 1L, 2L), ("y", 3L, 1L)))
  }

  test("minhashPairs finds a near-duplicate pair and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, "completely different content about spark query engines at scale")).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(df, "text", "doc_id", shingleN = 2,
      bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("hot-bucket guard: identical-doc flood chains linearly, dedups to one survivor") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val flood = (0L until 200L).map(i => (i, base))
    val others = Seq((900L, "completely different content about spark query engines at scale"),
      (901L, "a third unrelated document mentioning neither foxes nor dogs here"))
    val df = (flood ++ others).toDF("doc_id", "text")
    // cap far below the flood size: every band bucket goes through the chain
    val pairs = Dedup.minhashPairs(df, "text", "doc_id", shingleN = 2,
      bands = 16, rowsPerBand = 4, threshold = 0.5, maxBucketSize = 20)
    val n = pairs.count()
    // chained, not pairwise: O(B) pairs, nowhere near 200*199/2 = 19900
    assert(n >= 199 && n < 1000, s"expected ~199 chain pairs, got $n")
    // connectivity preserved: the whole flood still collapses to one survivor
    val survivors = Dedup.minhashDedup(df, "text", "doc_id", shingleN = 2,
      bands = 16, rowsPerBand = 4, threshold = 0.5, maxBucketSize = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(0L, 900L, 901L))
    // guard off (cap above bucket size): values identical pair-set superset,
    // same survivors
    val unguarded = Dedup.minhashDedup(df, "text", "doc_id", shingleN = 2,
      bands = 16, rowsPerBand = 4, threshold = 0.5, maxBucketSize = 100000)
      .select("doc_id").as[Long].collect().toSet
    assert(unguarded == survivors)
  }

  test("lshTopK bucket cap keeps top-k usable under an identical-vector flood") {
    val vec = Array(1.0f, 0.0f, 0.5f, 0.25f)
    val corpus = ((0L until 100L).map(i => (i, vec)) :+ (500L, Array(-1.0f, 0.2f, -0.3f, 0.9f)))
      .toDF("id", "emb")
    val queries = Seq((1000L, vec)).toDF("qid", "emb")
    val got = Ann.lshTopK(corpus, queries, "emb", "id", "qid",
      dim = 4, k = 5, planes = 6, probe1 = true, maxBucketSize = 10)
    val rows = got.collect()
    assert(rows.length == 5)               // k results survive the cap
    assert(rows.forall(_.getDouble(2) > 0.99)) // all from the flood, cosine ~1
  }

  test("simhashDupes: keep-first pairs per exact group, immune to near-variant floods") {
    // three-member duplicate group (order-insensitive) buried among
    // one-token-edit variants that share band keys — the regime where the
    // old banded-chain formulation lost non-adjacent true pairs
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = (Seq(
      (10L, base), (500L, base.split(" ").reverse.mkString(" ")), (900L, base)) ++
      (100L to 300L).map(i => (i, base.replace("w30", s"v$i")))).toDF("doc_id", "text")
    val got = Dedup.simhashDupes(docs, "text", "doc_id")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((10L, 500L, 0), (10L, 900L, 0))) // keep-first shape
  }

  test("simhashPairs: whitespace-dup docs collide at hamming 0") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha  beta gamma  delta"),
      (3L, "unrelated totally other words")).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("bruteForceTopK rank-1 of a query over itself is itself") {
    val emb = sf("embeddings")
    val q = emb.filter($"vec_id" === 7).select($"vec_id".as("qid"), $"embedding")
    val top = Ann.bruteForceTopK(emb, q, "embedding", "vec_id", "qid", 3)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(top.head == 7L)
  }

  test("lshTopK self-match survives bucketing") {
    val emb = sf("embeddings")
    val q = emb.filter($"vec_id" === 7).select($"vec_id".as("qid"), $"embedding")
    val top = Ann.lshTopK(emb, q, "embedding", "vec_id", "qid", dim = 64, k = 3, planes = 8)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(top.head == 7L)
  }
}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and bpeishTokenCount") {
    val df = Seq(("hello world  foo", ""), ("a,b 42", " ")).toDF("t", "e")
    val got = df.select(T.tokenCount($"t").as("n"), T.tokenCount($"e").as("z"),
      T.bpeishTokenCount($"t").as("b")).collect()
    assert(got(0).getInt(0) == 3 && got(0).getInt(1) == 0)
    assert(got(1).getInt(0) == 2)
    assert(got(1).getInt(2) == 4) // "a" "," "b" " 42"
  }

  test("langId picks stopword-richest language; und when none") {
    val df = Seq("the cat and the dog is in a house",
      "der hund ist nicht ein katze und", "zzz qqq").toDF("t")
    val got = df.select(T.langId($"t").as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "und"))
  }

  test("fingerprint is whitespace/case invariant") {
    val df = Seq(("Hello  World", "hello world")).toDF("a", "b")
    val r = df.select(T.fingerprint($"a").as("fa"), T.fingerprint($"b").as("fb")).head()
    assert(r.getString(0) == r.getString(1))
  }

  test("rollingHashes: k-gram count and shared grams across overlapping texts") {
    val df = Seq(("abcdef", "xabcdey")).toDF("a", "b")
    val r = df.select(T.rollingHashes($"a", 3).as("ha"), T.rollingHashes($"b", 3).as("hb")).head()
    val ha = r.getSeq[Long](0); val hb = r.getSeq[Long](1)
    assert(ha.length == 4 && hb.length == 5)
    assert(ha.toSet.intersect(hb.toSet).nonEmpty) // shared "abc","bcd","cde"
  }
}

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.SkewOps

  private val df = Seq(
    ("hot", 1.0), ("hot", 2.0), ("hot", 3.0), ("hot", 4.0),
    ("cold", 10.0), ("cool", 20.0)).toDF("k", "v")

  test("saltedAggregate equals direct aggregation") {
    val direct = df.groupBy("k").agg(
      sum($"v").as("sum_v"), max($"v").as("max_v"), count(lit(1)).as("count_v"))
      .orderBy("k").collect().toSeq
    val salted = SkewOps.saltedAggregate(df, Seq("k"),
      Map("v" -> "sum"), saltBuckets = 3)
      .orderBy("k").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getDouble(1))) ==
      direct.map(r => (r.getString(0), r.getDouble(1))))
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "H"), ("cold", "C"), ("cool", "L")).toDF("k", "label")
    val plain = df.join(dim, Seq("k")).orderBy("k", "v")
      .select("k", "v", "label").collect().toSeq
    val salted = SkewOps.saltedJoin(df, dim, Seq("k"), saltBuckets = 4)
      .orderBy("k", "v").select("k", "v", "label").collect().toSeq
    assert(salted == plain)
  }
}

class LineageSpec extends SparkSpec {
  import spark.implicits._

  test("numericAudit sums every numeric column in one pass; log sequences monotonically") {
    val lineage = new graft.lineage.Lineage("exec-lineage")
    val df = Seq((1.0, BigDecimal("2.50"), "x"), (3.0, BigDecimal("4.25"), "y"))
      .toDF("d", "m", "s")
    val metrics = lineage.numericAudit(df, "before")
    assert(metrics("rowcount") == 2.0)
    assert(metrics("d") == 4.0)
    assert(math.abs(metrics("m") - 6.75) < 1e-9)
    lineage.update(df, "mapping")
    val seqs = lineage.log.map(l => "\"seq\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toInt)
    assert(seqs == Seq(1, 2))
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Ann

  test("IVF: centroid training is deterministic; self-match survives probing") {
    val emb = sf("embeddings")
    val c1 = Ann.trainIvfCentroids(emb, "embedding", nlist = 8)
    val c2 = Ann.trainIvfCentroids(emb, "embedding", nlist = 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.length == 8 && c1.head.length == 64)

    val q = emb.filter($"vec_id" === 11).select($"vec_id".as("qid"), $"embedding")
    val top = Ann.ivfTopK(emb, q, "embedding", "vec_id", "qid", c1, k = 3, nprobe = 2)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(top.head == 11L) // own list is always probed first
  }

  test("kmeansFit: deterministic, recovers planted direction clusters, step counts conserve rows") {
    // three tight direction-groups in 8-dim space: members of a group must
    // land in one cluster after a full-corpus fit
    val base = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 0f, 0f, 1f, 0f))
    val rows = for {
      (b, g) <- base.zipWithIndex; j <- 0 until 20
    } yield (g * 100L + j, b.zipWithIndex.map { case (x, i) =>
      x + 0.01f * (((g * 100 + j) * 31 + i) % 7) }.toSeq)
    val df = rows.toDF("vec_id", "embedding")
    val c1 = graft.operators.Ann.kmeansFit(df, "embedding", k = 3, iters = 4,
      sampleSize = 64)
    val c2 = graft.operators.Ann.kmeansFit(df, "embedding", k = 3, iters = 4,
      sampleSize = 64)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // deterministic
    val assigned = df.select(col("vec_id"),
        graft.functions.expressions.HashExpressions
          .nearest_centroid(col("embedding"), c1).as("c"))
      .as[(Long, Int)].collect()
    val byGroup = assigned.groupBy(_._1 / 100).view.mapValues(_.map(_._2).distinct).toMap
    byGroup.foreach { case (g, cs) =>
      assert(cs.size == 1, s"group $g split across clusters $cs")
    }
    assert(byGroup.values.flatten.toSet.size == 3) // groups in distinct clusters
    val step = graft.operators.Ann.kmeansStep(df, "embedding", c1)
    assert(step.agg(sum(col("n"))).head().getLong(0) == rows.size) // rows conserved
  }

  test("semanticDedup: within-cluster keep-first; cross-cluster twins untouched") {
    import graft.operators.Dedup
    // centroids on two orthogonal directions; ids pick cluster membership
    val cents = Array(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0))
    val rows = Seq(
      (1L, Seq(1.0f, 0.01f, 0f, 0f)),   // cluster 0
      (2L, Seq(1.0f, 0.02f, 0f, 0f)),   // near-dup of 1, same cluster -> dropped
      (3L, Seq(0f, 0f, 1.0f, 0.01f)),   // cluster 1
      (4L, Seq(0f, 0f, 1.0f, 0.02f)),   // near-dup of 3 -> dropped
      (5L, Seq(0.2f, 0f, 1.0f, 0f))     // cluster 1, but cosine vs 3/4 < 0.995
    ).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(rows, "embedding", "vec_id", cents, threshold = 0.995)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
    val pairs = Dedup.semanticDedupPairs(rows, "embedding", "vec_id", cents, 0.995)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("IVF recall vs brute force at nprobe=4 is substantial") {
    val emb = sf("embeddings")
    val q = emb.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"embedding")
    val cs = Ann.trainIvfCentroids(emb, "embedding", nlist = 8)
    val exact = Ann.bruteForceTopK(emb, q, "embedding", "vec_id", "qid", 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(emb, q, "embedding", "vec_id", "qid", cs, k = 5, nprobe = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }
}

class StrictMappingSpec extends SparkSpec {
  import spark.implicits._
  import graft.mapping.{CustomMapping, MappingRow}

  test("strict mapping raises on a missing source column; lenient drops it") {
    val df = Seq((1, "a")).toDF("id", "name")
    val rows = Seq(MappingRow("id", "policy_id"), MappingRow("missing_col", "x"))
    val lenient = CustomMapping.applyMapping(df, rows)
    assert(lenient.columns.toSeq == Seq("policy_id"))
    val e = intercept[IllegalArgumentException] {
      CustomMapping.applyMapping(df, rows, strict = true)
    }
    assert(e.getMessage.contains("missing_col"))
    // a drop row (destname null) for a missing column is fine even in strict
    CustomMapping.applyMapping(df,
      Seq(MappingRow("id", "policy_id"), MappingRow("gone", "null")), strict = true)
  }
}

class DedupPipelineSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Dedup

  test("composed dedup: exact, then fingerprint, then minhash, with a stage report") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, base),
      (2L, base),                    // exact dup of 1
      (3L, "  " + base.toUpperCase), // fingerprint dup of 1
      (4L, base + " extra"),         // minhash near-dup of 1
      (5L, "entirely different content about distributed query engines")
    ).toDF("doc_id", "text")
    val (survivors, report) = Dedup.dedupPipeline(df, "text", "doc_id",
      shingleN = 2, threshold = 0.5)
    assert(survivors.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
    assert(report.map(s => (s.stage, s.docsIn, s.docsOut)) ==
      Seq(("exact", 5L, 4L), ("fingerprint", 4L, 3L), ("minhash", 3L, 2L)))
    survivors.unpersist() // caller-owns-unpersist contract
  }
}

class TfidfSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Tfidf

  test("unigramNll: rare-token docs score higher; values match the closed form") {
    val docs = Seq(
      (1L, "a a a a"),        // only common tokens
      (2L, "a a zqx"),        // one rare token
      (3L, "   ")).toDF("doc_id", "text") // token-less → no row
    val out = Tfidf.unigramNll(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!out.contains(3L))
    // corpus: a×6, zqx×1, total 7
    val pA = 6.0 / 7.0; val pZ = 1.0 / 7.0
    assert(math.abs(out(1L)._2 - (-math.log(pA))) < 1e-12)
    assert(math.abs(out(2L)._2 - (-(2 * math.log(pA) + math.log(pZ)) / 3.0)) < 1e-12)
    assert(out(2L)._2 > out(1L)._2)
    assert(out(1L)._1 == 4 && out(2L)._1 == 3)
  }

  test("bigramNll: smoothed conditional values match closed form; short docs emit nothing") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: ab, ba, ab
      (2L, "a c"),       // unseen-ish continuation c
      (3L, "solo")).toDF("doc_id", "text")
    val out = Tfidf.bigramNll(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!out.contains(3L)) // <2 tokens → no bigrams
    // corpus bigrams: ab×2, ba×1, ac×1; prefix counts: a×3, b×1; V=4 (a,b,c,solo)
    val pAB = 3.0 / 7.0; val pBA = 2.0 / 5.0; val pAC = 2.0 / 7.0
    assert(math.abs(out(1L)._2 -
      (-(2 * math.log(pAB) + math.log(pBA)) / 3.0)) < 1e-12)
    assert(math.abs(out(2L)._2 - (-math.log(pAC))) < 1e-12)
    assert(out(1L)._1 == 3 && out(2L)._1 == 1)
    assert(out(2L)._2 > out(1L)._2) // rarer continuation scores higher
  }

  test("knBigramPpl: all four unseen-event branches match the closed form") {
    val train = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // model: bi types (a,b):2 (b,a):1 (a,c):1 → T=3; left a:(c1=3,nf=2)
    // b:(c1=1,nf=1); cont nl(a)=nl(b)=nl(c)=1; V=3 → p_cont = (nl+1)/7
    val score = Seq(
      (1L, "a b a b"), // all seen
      (2L, "a d"),     // seen context, unseen bigram AND continuation
      (3L, "d b"),     // unseen context, seen continuation
      (4L, "d e"),     // everything unseen
      (5L, "solo")).toDF("doc_id", "text")
    val out = Tfidf.knBigramPpl(train, score, "text", "doc_id")
      .select("doc_id", "n_bigrams", "nll", "ppl")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(!out.contains(5L)) // <2 tokens → no bigrams
    val pAB = 1.25 / 3.0 + 0.75 * 2.0 / 3.0 * (2.0 / 7.0)
    val pBA = 0.25 + 0.75 * (2.0 / 7.0)
    val nll1 = -(2 * math.log(pAB) + math.log(pBA)) / 3.0
    assert(math.abs(out(1L)._2 - nll1) < 1e-12)
    assert(math.abs(out(2L)._2 - -math.log(0.75 * 2.0 / 3.0 / 7.0)) < 1e-12)
    assert(math.abs(out(3L)._2 - -math.log(2.0 / 7.0)) < 1e-12)
    assert(math.abs(out(4L)._2 - -math.log(1.0 / 7.0)) < 1e-12)
    out.values.foreach { case (_, nll, ppl) =>
      assert(java.lang.Double.isFinite(nll) && math.abs(ppl - math.exp(nll)) < 1e-9)
    }
    // the fully-out-of-distribution doc scores strictly worse than in-corpus
    assert(out(4L)._2 > out(1L)._2)
  }

  test("knTrigramPpl: recursive backoff matches an independent reference implementation on every branch") {
    val trainDocs = Seq("a b c a b d", "x y z")
    val scoreDocs = Seq(
      (1L, "a b c q"),  // seen trigram; then unseen trigram w/ seen history
      (2L, "q q a b"),  // unseen history AND unseen middle; then backoff w/ seen middle
      (3L, "x y z"),    // fully in-model
      (4L, "m n"))      // <3 tokens → no row
    // independent reference: plain-Scala KN over token sequences
    val D = 0.75
    val tr = trainDocs.map(_.split(" ").toSeq)
    val tris = tr.flatMap(t => t.sliding(3).filter(_.size == 3).map { s => (s(0), s(1), s(2)) })
    val bis = tr.flatMap(t => t.sliding(2).filter(_.size == 2).map { s => (s(0), s(1)) })
    val c3 = tris.groupBy(identity).view.mapValues(_.size).toMap
    val triTypes = c3.keySet
    val c12 = tris.groupBy(t => (t._1, t._2)).view.mapValues(_.size).toMap
    val nf12 = triTypes.groupBy(t => (t._1, t._2)).view.mapValues(_.size).toMap
    val n1p23 = triTypes.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    val n1pw2 = triTypes.groupBy(_._2).view.mapValues(_.size).toMap
    val biTypes = bis.distinct
    val nfw2 = biTypes.groupBy(_._1).view.mapValues(_.size).toMap
    val nl3 = biTypes.groupBy(_._2).view.mapValues(_.size).toMap
    val t2 = biTypes.size.toDouble
    val v = tr.flatten.distinct.size.toDouble
    def pOf(w1: String, w2: String, w3: String): Double = {
      val pcont = (nl3.getOrElse(w3, 0) + 1.0) / (t2 + v + 1.0)
      val plow = n1pw2.get(w2) match {
        case Some(nw) => math.max(n1p23.getOrElse((w2, w3), 0) - D, 0.0) / nw +
          D * nfw2.getOrElse(w2, 0) / nw * pcont
        case None => pcont
      }
      c12.get((w1, w2)) match {
        case Some(c) => math.max(c3.getOrElse((w1, w2, w3), 0) - D, 0.0) / c +
          D * nf12((w1, w2)) / c * plow
        case None => plow
      }
    }
    val expected = scoreDocs.collect { case (id, txt) if txt.split(" ").length >= 3 =>
      val ws = txt.split(" ").toSeq
      val ps = ws.sliding(3).map { s => pOf(s(0), s(1), s(2)) }.toSeq
      id -> (ps.size.toLong, ps.map(p => -math.log(p)).sum / ps.size)
    }.toMap

    val out = Tfidf.knTrigramPpl(
        trainDocs.zipWithIndex.map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text"),
        scoreDocs.toDF("doc_id", "text"), "text", "doc_id")
      .select("doc_id", "n_trigrams", "nll")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!out.contains(4L))
    assert(out.keySet == expected.keySet)
    expected.foreach { case (id, (n, nll)) =>
      assert(out(id)._1 == n)
      assert(math.abs(out(id)._2 - nll) < 1e-12, s"doc $id: ${out(id)._2} vs $nll")
    }
    // in-model text scores better than out-of-distribution text
    assert(out(3L)._2 < out(2L)._2)
  }

  test("knBigramPpl groupCols: per-group LMs are isolated; unseen group scores pure smoothed mass") {
    val langA = Seq((1L, "en", "a b a b"), (2L, "en", "a c"))
    val langB = Seq((10L, "de", "x y x y"), (11L, "de", "x z x z x y"))
    val both = (langA ++ langB).toDF("doc_id", "lang", "text")
    val onlyA = langA.toDF("doc_id", "lang", "text")
    def scoresOf(train: org.apache.spark.sql.DataFrame) =
      Tfidf.knBigramPpl(train, both, "text", "doc_id", groupCols = Seq("lang"))
        .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    val full = scoresOf(both)
    val aOnly = scoresOf(onlyA)
    // adding lang-B training data must not move lang-A scores AT ALL
    assert(full(1L) == aOnly(1L) && full(2L) == aOnly(2L))
    // lang-B docs scored against an ABSENT model take the pure-smoothing
    // branch: every bigram gets p_cont = (0+1)/(0+0+1) = 1 → nll 0
    assert(aOnly(10L) == 0.0 && aOnly(11L) == 0.0)
    // with its own model present, lang B scores are real and finite
    assert(full(10L) > 0.0 && java.lang.Double.isFinite(full(11L)))
  }

  test("mooreLewisScore: one-plan formulation equals two separate LM fits; selection discriminates") {
    val sf = this.sf("documents").select(col("doc_id"), col("lang"), col("text"))
    val train = sf.filter(col("doc_id") % 10 =!= 0)
    val inDom = train.filter(col("lang") === "en")
    val one = Tfidf.mooreLewisScore(inDom, train, sf, "text", "doc_id")
      .select("doc_id", "n_bigrams", "nll_in", "nll_gen", "ce_diff")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // the single-plan groupCols formulation must equal two independent fits
    val sepIn = Tfidf.knBigramPpl(inDom, sf, "text", "doc_id")
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    val sepGen = Tfidf.knBigramPpl(train, sf, "text", "doc_id")
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    assert(one.keySet == sepIn.keySet)
    one.foreach { case (id, (_, _, nIn, nGen, diff)) =>
      assert(math.abs(nIn - sepIn(id)) < 1e-12, s"doc $id in-LM")
      assert(math.abs(nGen - sepGen(id)) < 1e-12, s"doc $id gen-LM")
      assert(math.abs(diff - (nIn - nGen)) == 0.0)
    }
    // the signal points the right way: English docs average a lower
    // cross-entropy difference than the rest of the pool
    val byLang = sf.select("doc_id", "lang").as[(Long, String)].collect().toMap
    def meanDiff(p: String => Boolean) = {
      val v = one.collect { case (id, r) if p(byLang(id)) => r._5 }
      v.sum / v.size
    }
    assert(meanDiff(_ == "en") < meanDiff(_ != "en"),
      "in-domain docs must score closer to the in-domain LM")
    // select ≡ score + rounded-threshold filter, and it actually selects
    val thr = -0.05
    val sel = Tfidf.mooreLewisSelect(inDom, train, sf, "text", "doc_id", thr)
      .select("doc_id").as[Long].collect().toSet
    val expect = one.collect {
      case (id, r) if BigDecimal(r._5).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble <= thr => id
    }.toSet
    assert(sel == expect && sel.nonEmpty && sel.size < one.size)
  }

  test("perplexityBuckets: per-group terciles are balanced and rank-ordered") {
    val docs = (1 to 30).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      // doc i repeats a common phrase i times plus i distinct rare tokens —
      // higher i → more rare mass → higher perplexity rank variation
      val text = (Seq.fill(3)("the cat sat") ++ (1 to i).map(j => s"rare${i}_$j")).mkString(" ")
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text")
    val out = Tfidf.perplexityBuckets(docs, "text", "doc_id", Seq("lang"))
      .select("doc_id", "lang", "ppl_r", "bucket")
      .as[(Long, String, Double, Long)].collect()
    assert(out.length == 30)
    out.groupBy(_._2).foreach { case (_, rows) =>
      // 15 docs per lang → terciles of exactly 5
      assert(rows.groupBy(_._4).view.mapValues(_.length).toMap ==
        Map(1L -> 5, 2L -> 5, 3L -> 5))
      // buckets respect the (ppl_r, doc_id) order
      val sorted = rows.sortBy(r => (r._3, r._1)).map(_._4)
      assert(sorted.sameElements(sorted.sorted))
    }
  }

  test("tfidf: corpus-wide terms weigh zero, rare terms weigh high") {
    val docs = Seq(
      (1L, "common rare1 common"),
      (2L, "common rare2"),
      (3L, "common other")).toDF("doc_id", "text")
    val out = Tfidf.tfidf(docs, "text", "doc_id")
    val byToken = out.select("doc_id", "token", "tfidf")
      .as[(Long, String, Double)].collect()
      .groupBy(_._2).view.mapValues(_.head._3).toMap
    assert(byToken("common") == 0.0) // in every doc → ln(3/3)=0
    assert(math.abs(byToken("rare1") - math.log(3.0)) < 1e-12)
    val tf2 = out.filter($"doc_id" === 1 && $"token" === "common")
      .select("tf").as[Long].head()
    assert(tf2 == 2) // term frequency counts repeats
  }

  test("topTerms returns k deterministic highest-weight tokens per doc") {
    val docs = Seq((1L, "aa bb bb cc"), (2L, "aa dd")).toDF("doc_id", "text")
    val top = Tfidf.topTerms(docs, "text", "doc_id", k = 2)
    assert(top.filter($"doc_id" === 1).count() == 2)
    val first = top.filter($"doc_id" === 1 && $"term_rank" === 1)
      .select("token").as[String].head()
    assert(first == "bb") // tf=2 of a doc-unique token dominates
  }
}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.AsOfJoin

  test("asof attaches the latest right state at or before each left time") {
    val quotes = Seq(
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("B", 3L, 20.0)
    ).toDF("sym", "qts", "px").select($"sym", $"qts", $"px".as("quote_px"), $"qts".as("quote_ts"))
    val trades = Seq(
      ("A", 0L), ("A", 1L), ("A", 4L), ("A", 7L), ("B", 2L), ("B", 9L)
    ).toDF("sym", "tts")
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "tts", "qts",
        Seq("quote_px", "quote_ts"))
      .orderBy("sym", "tts")
      .select("sym", "tts", "quote_px", "quote_ts")
      .as[(String, Long, Option[Double], Option[Long])].collect().toSeq
    assert(out == Seq(
      ("A", 0L, None, None),             // before any quote
      ("A", 1L, Some(10.0), Some(1L)),   // inclusive at equal time
      ("A", 4L, Some(10.0), Some(1L)),
      ("A", 7L, Some(11.0), Some(5L)),
      ("B", 2L, None, None),
      ("B", 9L, Some(20.0), Some(3L))))
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.RangeJoin

  test("binned point-in-interval join equals the naive BETWEEN join") {
    val points = Seq((1L, 5L), (2L, 15L), (3L, 25L), (4L, 99L)).toDF("pid", "ts")
    val intervals = Seq((10L, 0L, 9L), (20L, 10L, 30L), (30L, 20L, 26L))
      .toDF("iid", "start", "end")
    val binned = RangeJoin.pointInInterval(points, intervals, "ts", "start", "end",
        Seq.empty, binWidth = 7)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, $"ts".between($"start", $"end"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(binned == Set((1L, 10L), (2L, 20L), (3L, 20L), (3L, 30L)))
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Sampling

  test("splitByHash is deterministic, exhaustive, and ~respects weights") {
    val df = spark.range(10000).toDF("id")
    val s1 = Sampling.splitByHash(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val s2 = Sampling.splitByHash(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s1.collect().toSet == s2.collect().toSet) // reproducible
    val counts = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 8000) < 300)
    assert(math.abs(counts("val") - 1000) < 150)
    // growing the corpus never moves existing rows between splits
    val bigger = Sampling.splitByHash(spark.range(20000).toDF("id"), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val joined = s1.withColumnRenamed("split", "s1")
      .join(bigger.withColumnRenamed("split", "s2"), "id")
    assert(joined.filter($"s1" =!= $"s2").isEmpty)
  }
}

class StratifiedSampleSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Sampling

  test("stratified sample keeps ~per-stratum fractions, deterministically") {
    val df = spark.range(6000).toDF("id")
      .withColumn("grp", (org.apache.spark.sql.functions.col("id") % 3).cast("string"))
    val s = Sampling.stratifiedSample(df, "id", "grp",
      Map("0" -> 0.5, "1" -> 0.1), defaultFraction = 0.0)
    val counts = s.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("0") - 1000) < 150) // 2000 * 0.5
    assert(math.abs(counts("1") - 200) < 80)   // 2000 * 0.1
    assert(!counts.contains("2"))              // default 0
    val s2 = Sampling.stratifiedSample(df, "id", "grp",
      Map("0" -> 0.5, "1" -> 0.1), defaultFraction = 0.0)
    assert(s.collect().toSet == s2.collect().toSet)
  }
}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{TextFunctions => T}

  test("chunkTokens: overlapping windows cover the doc; short docs get one chunk") {
    val df = Seq(((1 to 10).map(i => s"w$i").mkString(" ")), "a b").toDF("text")
    val out = df.select(explode(T.chunkTokens($"text", chunkTokens = 4, overlap = 1)).as("c"))
      .select($"c.chunk_id", $"c.chunk").as[(Int, String)].collect().toSeq
    // doc1: stride 3 → ceil((10-1)/3)=3 chunks: [w1..w4],[w4..w7],[w7..w10]
    val doc1 = out.filter(_._2.startsWith("w"))
    assert(doc1 == Seq((0, "w1 w2 w3 w4"), (1, "w4 w5 w6 w7"), (2, "w7 w8 w9 w10")))
    // doc2 shorter than a window → single chunk with everything
    assert(out.contains((0, "a b")))
    // consecutive chunks overlap by exactly `overlap` tokens
    assert(doc1(0)._2.split(" ").last == doc1(1)._2.split(" ").head)
  }
}

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.SnapshotDiff

  test("diff classifies insert/delete/update and can keep unchanged rows") {
    val oldS = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "s", "v")
    val newS = Seq((1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0)).toDF("k", "s", "v")
    val out = SnapshotDiff.diff(oldS, newS, Seq("k"), Seq("s", "v"))
      .select("k", "change_type").as[(Int, String)].collect().toMap
    assert(out == Map(2 -> "update", 3 -> "delete", 4 -> "insert"))
    val all = SnapshotDiff.diff(oldS, newS, Seq("k"), Seq("s", "v"), includeUnchanged = true)
    assert(all.count() == 4)
    // null-safe compare: null is distinct from any real value (incl. blank)
    val o2 = Seq((1, Option.empty[String]), (2, Option.empty[String])).toDF("k", "s")
    val n2 = Seq((1, Some(" ")), (2, Option.empty[String])).toDF("k", "s")
    val ct = SnapshotDiff.diff(o2, n2, Seq("k"), Seq("s"), includeUnchanged = true)
      .select("k", "change_type").as[(Int, String)].collect().toMap
    assert(ct == Map(1 -> "update", 2 -> "unchanged"))
  }
}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.ConnectedComponents

  test("min-label propagation finds components of chains, cliques, singletons") {
    // chain 1-2-3-4, clique 10-11-12, pair 20-21
    val edges = Seq((2L,1L),(2L,3L),(3L,4L),(10L,11L),(11L,12L),(10L,12L),(20L,21L))
      .toDF("src", "dst")
    val comp = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L,2L,3L,4L).forall(comp(_) == 1L))
    assert(Seq(10L,11L,12L).forall(comp(_) == 10L))
    assert(comp(20L) == 20L && comp(21L) == 20L)
  }

  test("dedupByComponents keeps one rep per cluster plus unpaired ids") {
    val ids = Seq(1L,2L,3L,4L,5L,6L).toDF("doc_id")
    val pairs = Seq((1L,2L),(2L,3L),(5L,6L)).toDF("id_a","id_b")
    val kept = ConnectedComponents.dedupByComponents(ids, pairs, "doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L)) // {1,2,3}→1, 4 unpaired, {5,6}→5
  }

  test("local union-find cutover is value-identical to the distributed loop") {
    // randomized-ish graph shape: chains, cliques, cross-links, singeltons
    val edges = Seq(
      (2L,1L),(2L,3L),(3L,4L),(4L,9L),(9L,2L),          // cycle+chain
      (10L,11L),(11L,12L),(10L,12L),(12L,13L),           // clique + tail
      (20L,21L),(30L,31L),(31L,32L),(21L,30L),           // merged via 21-30
      (40L,40L),                                         // self loop
      (50L,51L)).toDF("src", "dst")
    val local = ConnectedComponents.run(edges)                       // cutover
      .as[(Long, Long)].collect().toMap
    val dist = ConnectedComponents.run(edges, localEdgeThreshold = 0) // forced loop
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    // and the same equivalence for string ids (different ordering rules)
    val sEdges = Seq(("b","a"),("b","c"),("x","y")).toDF("src","dst")
    val sLocal = ConnectedComponents.run(sEdges).as[(String, String)].collect().toMap
    val sDist = ConnectedComponents.run(sEdges, localEdgeThreshold = 0)
      .as[(String, String)].collect().toMap
    assert(sLocal == sDist && sLocal("c") == "a" && sLocal("y") == "x")
  }

  test("cutover falls back to the distributed loop on inputs it can't solve exactly") {
    // mismatched src/dst types: boxed equality would split what coercion joins
    val mixed = Seq((5, 7L), (7, 9L)).toDF("src", "dst")
      .select(col("src").cast("int").as("src"), col("dst"))
    val comp = ConnectedComponents.run(mixed).as[(Long, Long)].collect().toMap
    assert(comp == Map(5L -> 5L, 7L -> 5L, 9L -> 5L))
    // null ids: the loop's joins/min ignore them instead of NPEing
    val withNull = Seq((Some(1L), Some(2L)), (None, Some(3L))).toDF("src", "dst")
    ConnectedComponents.run(withNull).collect() // must not throw
    // case-insensitive column resolution, same as the distributed path
    val cased = Seq((1L, 2L)).toDF("id_a", "id_b")
    val c2 = ConnectedComponents.run(cased, "ID_A", "ID_B")
      .as[(Long, Long)].collect().toMap
    assert(c2 == Map(1L -> 1L, 2L -> 1L))
  }
}

class RepetitionSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Repetition

  test("line repetition metrics: duplicate-line and duplicate-char fractions") {
    val df = Seq(
      (1L, "aaa\nbbb\naaa\nccc"),   // 4 lines, 3 distinct; dup chars 6 of 12
      (2L, "xx\nyy"),               // no repetition
      (3L, "")                      // single empty line
    ).toDF("doc_id", "text")
    val got = Repetition.lineRepetition(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got(0) == ((1L, 4L, 3L, 0.25, 0.5)))
    assert(got(1) == ((2L, 2L, 2L, 0.0, 0.0)))
    // empty text: one zero-length line, zero chars -> zero fractions, no /0
    assert(got(2) == ((3L, 1L, 1L, 0.0, 0.0)))
  }

  test("repetition aggregation collapses a boilerplate flood map-side (counts stay exact)") {
    val flood = (1 to 500).map(_ => "same line").mkString("\n")
    val df = Seq((9L, flood)).toDF("doc_id", "text")
    val r = Repetition.lineRepetition(df, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r == ((9L, 500L, 1L, 499.0 / 500.0, 1.0)))
  }
}

class NgramSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Dedup, Repetition}

  test("13-gram overlap join flags docs sharing an exact n-gram, with counts") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),   // 16 tokens
      (2L, "x y z totally different tokens here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "b c d e f g h i j k l m n o")).toDF("doc_id", "text") // 14 tokens
    val got = Dedup.ngramOverlapJoin(corpus, bench, "text", "doc_id", n = 13)
      .as[(Long, Long, Long)].collect().toSeq
    // bench has 2 distinct 13-grams, both inside doc 1's window set
    assert(got == Seq((1L, 100L, 2L)))
  }

  test("ngramNovelty: exact copy scores 0, fresh text 1, partial overlap in between; short docs excluded") {
    val train = Seq(
      (1L, "a b c d e f"),
      (2L, "p q r s")
    ).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b c d e f"),         // exact copy: all 4 trigrams seen -> 0
      (11L, "x y z w v"),           // fresh: 3 novel trigrams -> 1
      (12L, "a b c x y z"),         // "a b c" seen, 3 others novel -> 3/4
      (13L, "a b c a b c"),         // DISTINCT grams {abc, bca, cab}: abc seen -> 2/3
      (14L, "one two")              // < 3 tokens: excluded
    ).toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(train, score, "text", "doc_id", n = 3)
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(14L) && got.size == 4)
    assert(got(10L) == ((10L, 4L, 0L, 0.0)))
    assert(got(11L) == ((11L, 3L, 3L, 1.0)))
    assert(got(12L) == ((12L, 4L, 3L, 0.75)))
    assert(got(13L) == ((13L, 3L, 2L, 2.0 / 3)))
  }

  test("vocabCoverage: rank by count then token, cumulative shares, topK truncation") {
    val df = Seq((1L, "b b b a a c"), (2L, "a d")).toDF("doc_id", "text")
    // freqs: a=3, b=3, c=1, d=1; total 8; ties break by token
    val got = graft.operators.CorpusStats.vocabCoverage(df, "text", topK = 3)
      .select("rank", "token", "cnt", "coverage")
      .as[(Long, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "a", 3L, 3.0 / 8), (2L, "b", 3L, 6.0 / 8), (3L, "c", 1L, 7.0 / 8)))
  }

  test("top bigram coverage: counts, deterministic struct-max tie-break, short docs") {
    val df = Seq(
      (1L, "go go go go"),            // "go go" x3, chars 11 -> 3*5/11
      (2L, "one token"),              // single bigram
      (3L, "solo")                    // < 2 tokens -> ('', 0, 0.0)
    ).toDF("doc_id", "text")
    val got = Repetition.topNgramCharFrac(df, "doc_id", "text", n = 2)
      .orderBy("doc_id").as[(Long, String, Long, Double)].collect().toSeq
    assert(got(0) == ((1L, "go go", 3L, 15.0 / 11.0)))
    assert(got(1) == ((2L, "one token", 1L, 1.0)))
    assert(got(2) == ((3L, "", 0L, 0.0)))
  }
}

class DropRepeatedLinesSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Repetition

  test("keeps first occurrence of each line in original order") {
    val df = Seq(
      (1L, "header\nbody a\nheader\nbody b\nbody a\ntail"),
      (2L, "only\nlines")
    ).toDF("doc_id", "text")
    val got = Repetition.dropRepeatedLines(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got(0) == ((1L, "header\nbody a\nbody b\ntail")))
    assert(got(1) == ((2L, "only\nlines")))
  }
}

class RepetitionKernelCrossCheckSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Repetition

  private val docs = Seq(
    (1L, "aaa\nbbb\naaa\nccc"),
    (2L, "  Mixed CASE tokens  with   runs\nmixed case tokens with runs"),
    (3L, ""),
    (4L, "solo"),
    (5L, "x y x y x y z\nx y"),
    (6L, "tab\tsep and\nnewlines\n\n\ndup\ndup")
  ).toDF("doc_id", "text")

  test("native line_stats kernel == explode+groupBy reference") {
    val a = Repetition.lineRepetition(docs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val b = Repetition.lineRepetitionViaExplode(docs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(a == b)
  }

  test("native top_ngram kernel == explode+struct-max reference (incl. tie-breaks)") {
    for (n <- Seq(2, 3)) {
      val a = Repetition.topNgramCharFrac(docs, "doc_id", "text", n).orderBy("doc_id")
        .as[(Long, String, Long, Double)].collect().toSeq
      val b = Repetition.topNgramViaExplode(docs, "doc_id", "text", n).orderBy("doc_id")
        .as[(Long, String, Long, Double)].collect().toSeq
      assert(a == b, s"n=$n")
    }
  }

  test("kernels run under real codegen on the documents corpus (no shuffle in plan)") {
    val real = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val a = Repetition.lineRepetition(real, "doc_id", "text")
    val b = Repetition.lineRepetitionViaExplode(real, "doc_id", "text")
    assert(a.orderBy("doc_id").collect().toSeq == b.orderBy("doc_id").collect().toSeq)
    // the kernel path must be shuffle-free
    assert(!a.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}

class EmbeddingNearDupRecallSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Dedup
  import graft.functions.{SimilarityFunctions => S}

  test("banded hyperplane LSH recall vs brute force at cosine >= 0.95") {
    // natural test embeddings have max pairwise cosine ~0.48 — plant a
    // jittered near-dup per base vector: w_d = v_d + 0.3*v_{(d+1) mod 64}
    // gives cosine ~1/sqrt(1.09) ~ 0.957, JUST above the threshold (the
    // regime where single-bucket LSH recall was ~0.3 and banding matters)
    val base = sf("embeddings").select(col("vec_id"), col("embedding"))
    val jitterExpr = expr(
      """CAST(transform(embedding, (x, d) ->
           x + CAST(0.3 AS FLOAT) * element_at(embedding, ((d + 1) % 64) + 1))
         AS ARRAY<FLOAT>)""")
    val jittered = base.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000L).as("vec_id"), jitterExpr.as("embedding"))
    val emb = base.unionByName(jittered)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val brute = a.crossJoin(b).filter(col("ia") < col("ib"))
      .withColumn("cos", S.cosine(col("va"), col("vb")))
      .filter(col("cos") >= 0.95)
      .select(col("ia"), col("ib")).as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupPairs(emb, "embedding", "vec_id", dim = 64)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute)) // exact verification: zero false positives
    assert(brute.size >= 30, s"planted pairs missing: ${brute.size}")
    val recall = lsh.size.toDouble / brute.size
    // banded: 1-(1-p^8)^6 ~ 0.97 at cosine 0.957; single-bucket was ~0.3
    assert(recall >= 0.85, s"recall $recall (${lsh.size}/${brute.size})")
  }
}

class CorpusLineDedupSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Repetition

  test("corpus-level keep-first: shared boilerplate survives only in the earliest doc") {
    val df = Seq(
      (1L, "unique one\nBOILER\ntail one"),
      (2L, "BOILER\nunique two"),
      (3L, "BOILER")                      // everything claimed elsewhere
    ).toDF("doc_id", "text")
    val got = Repetition.dropRepeatedLinesCorpus(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got(0) == ((1L, "unique one\nBOILER\ntail one")))
    assert(got(1) == ((2L, "unique two")))
    assert(got(2) == ((3L, "")))          // emptied, not dropped
  }

  test("within-doc repeats also collapse to the first instance corpus-wide") {
    val df = Seq((5L, "a\na\nb"), (6L, "b\nc")).toDF("doc_id", "text")
    val got = Repetition.dropRepeatedLinesCorpus(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((5L, "a\nb"), (6L, "c")))
  }
}

class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Sampling

  test("token-budget sample equals global-order cumsum <= budget, and respects the budget") {
    val docs = (1L to 200L).map(i => (i, 1L + (i * 7) % 50)).toDF("doc_id", "n_tokens")
    val budget = 1000L
    val got = Sampling.tokenBudgetSample(docs, "doc_id", "n_tokens", budget)
      .as[(Long, Long)].collect().toMap
    // reference: global (bucket, id) order, keep while cum <= budget
    val ordered = docs.withColumn("b", Sampling.hashBucket(col("doc_id")))
      .orderBy("b", "doc_id").as[(Long, Long, Int)].collect()
    var cum = 0L
    val expected = ordered.takeWhile { case (_, t, _) => { cum += t; cum <= budget } }
      .map(r => r._1 -> r._2).toMap
    assert(got == expected)
    assert(got.values.sum <= budget)
    assert(got.values.sum >= budget - 50) // fills to within one max-doc of target
  }

  test("packSequences: exact concat-then-chunk mapping, contiguous global offsets") {
    val docs = (1L to 150L).map(i => (i, 1L + (i * 13) % 97)).toDF("doc_id", "n_tokens")
    val L = 128L
    val got = Sampling.packSequences(docs, "doc_id", "n_tokens", L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference: naive global (bucket, id) order exclusive cumsum
    val ordered = docs.withColumn("b", Sampling.hashBucket(col("doc_id")))
      .orderBy("b", "doc_id").as[(Long, Long, Int)].collect()
    var g = 0L
    val expected = ordered.map { case (id, t, _) =>
      val row = (id, t, g / L, g % L); g += t; row
    }.toSet
    assert(got.toSet == expected)
    assert(got.forall { case (_, _, _, off) => off >= 0 && off < L })
    // every token position is covered exactly once: total tokens == final g
    assert(got.map(_._2).sum == g)
  }

  test("packSequences edges: zero-token docs, doc longer than seqLen, null counts") {
    val docs = Seq((1L, Some(0L)), (2L, Some(300L)), (3L, None), (4L, Some(10L)))
      .toDF("doc_id", "n_tokens")
    val got = Sampling.packSequences(docs, "doc_id", "n_tokens", 128L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size == 4) // zero/null-token docs still get a position
    assert(got.values.forall { case (_, _, off) => off >= 0 && off < 128 })
    // the 300-token doc spans sequences: its successor starts 300 later
    val ordered = docs.withColumn("b", Sampling.hashBucket(col("doc_id")))
      .orderBy("b", "doc_id").select("doc_id").as[Long].collect()
    val offsets = ordered.map(id => got(id)._2 * 128 + got(id)._3)
    val toks = ordered.map(id => got(id)._1)
    offsets.zip(offsets.drop(1)).zip(toks).foreach { case ((g0, g1), t) =>
      assert(g1 == g0 + t) // contiguous concat layout, nulls as 0
    }
  }

  test("mixtureSample: binding group keeps all rows, kept token mass tracks target, untargeted groups drop") {
    // groups with equal doc counts but skewed token mass: a=9000, b=1000, c=500
    val docs = ((1L to 90L).map(i => (i, "a", 100L)) ++
      (101L to 190L).map(i => (i, "b", 11L)) ++ // ~1000 tokens
      (201L to 290L).map(i => (i, "c", 5L)))
      .toDF("doc_id", "grp", "n_tokens")
    val kept = Sampling.mixtureSample(docs, "doc_id", "grp", "n_tokens",
        Map("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "grp", "n_tokens").as[(Long, String, Long)].collect()
    assert(!kept.exists(_._2 == "c")) // untargeted group dropped
    // b is binding (0.5/990 > 0.5/9000): every b row kept
    assert(kept.count(_._2 == "b") == 90)
    // kept token mass ratio approaches 50/50 (hash granularity leaves slack)
    val aTok = kept.filter(_._2 == "a").map(_._3).sum.toDouble
    val bTok = kept.filter(_._2 == "b").map(_._3).sum.toDouble
    val frac = aTok / (aTok + bTok)
    assert(frac > 0.35 && frac < 0.65, s"a-fraction $frac")
    // deterministic
    val again = Sampling.mixtureSample(docs, "doc_id", "grp", "n_tokens",
        Map("a" -> 0.5, "b" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("determinism hardening: null token counts count 0; duplicate ids keep a stable multiset") {
    // nulls: a null-count doc must neither crash the boundary cumsum nor be
    // dropped arbitrarily — it costs 0 tokens, so it is always kept when its
    // bucket is reached
    val withNulls = Seq((1L, Some(600L)), (2L, None), (3L, Some(600L)))
      .toDF("doc_id", "n_tokens")
    val kept = Sampling.tokenBudgetSample(withNulls, "doc_id", "n_tokens", 700L)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    assert(kept.values.map(math.max(_, 0L)).sum <= 700L)
    // duplicate ids with different counts: repeated runs agree exactly (the
    // (id, tokens) tie-break pins the cut inside the boundary bucket)
    val dups = Seq((7L, 300L), (7L, 100L), (7L, 300L), (9L, 200L), (9L, 50L))
      .toDF("doc_id", "n_tokens")
    def run() = Sampling.tokenBudgetSample(dups, "doc_id", "n_tokens", 450L)
      .as[(Long, Long)].collect().sorted.toSeq
    val first = run()
    (1 to 3).foreach(_ => assert(run() == first))
    assert(first.map(_._2).sum <= 450L)
  }
}
