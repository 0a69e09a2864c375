package graft

import graft.functions.{SimilarityFunctions => S}
import graft.functions.expressions.{SketchAggregates => SK}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-independence stress: every round-8 second-wave operator must
  * produce IDENTICAL results under adversarial partitioning (1 partition vs
  * a prime-count repartition) — the property the oracle gate checks against
  * DuckDB is only meaningful if Spark's own answer is partition-stable. */
class PartitionInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private def docs = sf("documents").select(col("doc_id"), col("lang"),
    col("source"), col("text"), col("n_chars"))

  private def invariant(tag: String)(f: DataFrame => DataFrame): Unit = {
    val a = f(docs.coalesce(1)).collect().toSet
    val b = f(docs.repartition(7, col("doc_id"))).collect().toSet
    assert(a == b, s"$tag differs across partitioning")
    assert(a.nonEmpty, s"$tag produced nothing")
  }

  test("second-wave operators are partition-invariant") {
    invariant("kmv sketch") { d =>
      d.select(col("lang"), explode(S.tokens(col("text"))).as("t"))
        .select(col("lang"), conv(substring(md5(col("t")), 1, 15), 16, 10)
          .cast("long").as("h"))
        .groupBy(col("lang")).agg(SK.kmv_sketch(col("h"), 16).as("sk"))
    }
    invariant("hll sketch") { d =>
      d.select(col("lang"), explode(S.tokens(col("text"))).as("t"))
        .groupBy(col("lang")).agg(SK.hll_sketch(col("t"), 8).as("sk"))
    }
    invariant("bottom-k sample") { d =>
      graft.operators.Sampling.groupSample(d, "doc_id", "source", 5, "pi")
    }
    invariant("bin packing") { d =>
      graft.operators.Sampling.binPackDocs(d, "doc_id", "n_chars", 2048, 8, "pi")
    }
    invariant("divergence") { d =>
      graft.operators.CorpusStats.tokenDivergence(
        d.select(col("lang"), pmod(col("doc_id"), lit(2)).as("side"),
          S.tokens(col("text")).as("toks")), "toks", "lang", "side")
        .select(col("lang"), round(col("kl_ab"), 9), round(col("chi2"), 9))
    }
    invariant("canonicalize") { d =>
      val toks = d.select(col("doc_id"), col("lang"), col("source"),
        S.tokens(col("text")).as("toks"))
      val pairs = graft.operators.Dedup.jaccardSelfJoin(
        toks, "toks", "doc_id", Seq("lang", "source"), 0.5)
      graft.operators.ConnectedComponents.canonicalize(
        d.select(col("doc_id"), col("n_chars")), pairs, "doc_id", "n_chars")
    }
    invariant("token dropout") { d =>
      graft.operators.Augment.tokenDropout(d, "doc_id", "text", "pi", 200)
    }
    invariant("ngram diversity") { d =>
      graft.operators.CorpusStats.ngramDiversity(d, "text", "source", Seq(1, 2))
    }
  }

  // Round-9 extension: the FIRST-WAVE (round 5–7) families, where order
  // sensitivity is the classic silent failure — sampling cut points, shard
  // numbering, rank iterations, packing folds.
  test("first-wave sampling/shard/packing operators are partition-invariant") {
    invariant("token budget sample") { d =>
      graft.operators.Sampling.tokenBudgetSample(
        d.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", 50000L)
    }
    invariant("sequence packing") { d =>
      graft.operators.Sampling.packSequences(
        d.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", 2048L)
    }
    invariant("mixture sample") { d =>
      graft.operators.Sampling.mixtureSample(d, "doc_id", "lang", "n_chars",
        Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2))
    }
    invariant("temperature mixture sample") { d =>
      graft.operators.Sampling.temperatureMixtureSample(
        d, "doc_id", "lang", "n_chars", 0.7)
    }
    invariant("dsir sample") { d =>
      graft.operators.Sampling.dsirSample(d, "doc_id", "text",
        col("lang") === "en", nBuckets = 32, k = 50)
    }
    invariant("epoch shuffle shard") { d =>
      graft.operators.Sampling.epochShuffleShard(
        d.select(col("doc_id")), "doc_id", "pi", 8)
    }
    invariant("stratified interleave") { d =>
      graft.operators.Sampling.stratifiedInterleave(d, "doc_id", "source", "pi")
    }
    invariant("quality quota") { d =>
      graft.operators.Sampling.qualityQuota(
        d.select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id", "source", "n_chars", 3, 10)
    }
  }

  test("first-wave sketch/graph operators are partition-invariant") {
    invariant("cms sketch") { d =>
      d.select(col("lang"), explode(S.tokens(col("text"))).as("t"))
        .groupBy(col("lang")).agg(SK.cms_sketch(col("t"), 4, 64).as("sk"))
    }
    invariant("bloom sketch") { d =>
      // hex(): BINARY collects as Array[Byte], which compares by REFERENCE
      // in Row equality — the set compare would fail even on equal bitsets
      d.select(col("lang"), explode(S.tokens(col("text"))).as("t"))
        .groupBy(col("lang")).agg(hex(SK.bloom_sketch(col("t"), 1 << 12, 4)).as("sk"))
    }
    invariant("bottom-k struct") { d =>
      d.select(col("lang"), explode(S.tokens(col("text"))).as("t"))
        .groupBy(col("lang"), col("t")).agg(count(lit(1)).as("c"))
        .groupBy(col("lang"))
        .agg(SK.bottom_k_struct(struct((-col("c")).as("negc"), col("t")), 5).as("top"))
    }
    invariant("kll sketch (exact regime)") { d =>
      d.groupBy(col("lang"))
        .agg(SK.kll_sketch(col("n_chars").cast("double"), 4096).as("sk"))
    }
    invariant("pagerank 3 iters") { d =>
      val nodes = d.select(col("doc_id"))
      val edges = d.select(col("doc_id").as("src"),
          (pmod(col("doc_id") * 7 + 3, lit(500)) ).as("dst"))
        .join(nodes.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      graft.operators.PageRank.fixedPoint(edges, "src", "dst",
        nodes, "doc_id", iterations = 3)
    }
  }

  // Round-10 extension: the fixpoint/index family — daily-path operators
  // whose reports feed downstream decisions (what to keep, what to search),
  // where a partition-dependent answer would silently fork the corpus.
  test("round-10 fixpoint/index operators are partition-invariant") {
    invariant("weighted sample") { d =>
      graft.operators.Sampling.weightedSample(
        d.select(col("doc_id"),
          log(col("n_chars").cast("double") + 1.0).as("logw")),
        "doc_id", "logw", 50, "pi")
    }
    invariant("mg sketch (exact regime)") { d =>
      d.groupBy(col("lang")).agg(SK.mg_sketch(col("source"), 64).as("sk"))
    }
    invariant("incremental minhash report (exact regime)") { d =>
      val stored = d.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id"), col("text"))
      val batch = d.filter(pmod(col("doc_id"), lit(2)) === 1)
        .select((col("doc_id") + 50000).as("doc_id"), col("text"))
      val idx = graft.operators.Dedup.minhashIndex(stored, "text", "doc_id")
      graft.operators.Dedup.incrementalMinhash(idx, batch, "text", "doc_id",
        threshold = 0.999)._1
    }
    invariant("incremental dedup report") { d =>
      val toks = d.select(col("doc_id"), col("lang"), col("source"),
        array_distinct(S.tokens(col("text"))).as("toks"))
      graft.operators.Dedup.incrementalDedup(
        toks.filter(pmod(col("doc_id"), lit(2)) === 0),
        toks.filter(pmod(col("doc_id"), lit(2)) === 1)
          .withColumn("doc_id", col("doc_id") + 50000),
        "toks", "doc_id", Seq("lang", "source"), 0.7)
    }
    invariant("bm25 search over built+appended index") { d =>
      import graft.operators.Retrieval
      val (p0, l0) = Retrieval.bm25Index(
        d.filter(pmod(col("doc_id"), lit(2)) === 0), "text", "doc_id")
      val (p1, l1) = Retrieval.bm25Append(p0, l0,
        d.filter(pmod(col("doc_id"), lit(2)) === 1), "text", "doc_id")
      Retrieval.bm25Search(p1, l1, "doc_id",
        Seq("qa" -> "spark join merge", "qb" -> "customer order value"), k = 10)
    }
  }

  test("continuation-wave LM/classifier operators are partition-invariant") {
    invariant("kn bigram ppl (per-lang models)") { d =>
      graft.operators.Tfidf.knBigramPpl(
        d.filter(pmod(col("doc_id"), lit(10)) =!= 0), d, "text", "doc_id",
        groupCols = Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          round(col("nll"), 6).as("nll_r"))
    }
    invariant("ccnet perplexity buckets") { d =>
      graft.operators.Tfidf.perplexityBuckets(
        d.select(col("doc_id"), col("lang"), col("text")),
        "text", "doc_id", Seq("lang"))
    }
    invariant("sparse logistic fit (quantized weights)") { d =>
      val labels = d.select(col("doc_id"),
        (col("n_chars") >= 200).cast("int").as("y"))
      val feats = graft.operators.Retrieval.hashedTokenFeatures(
        d, "text", "doc_id", 256)
      graft.operators.Retrieval.logisticFitSparse(feats, labels, "doc_id", "y",
        iters = 2, lrNum = 1, lrDen = 1)._1
    }
    invariant("moore-lewis cross-entropy difference") { d =>
      val train = d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      graft.operators.Tfidf.mooreLewisScore(
        train.filter(col("lang") === "en"), train, d, "text", "doc_id")
        .select(col("doc_id"), col("n_bigrams"),
          round(col("ce_diff"), 6).as("ce_diff_r"))
    }
    invariant("kn trigram ppl (recursive backoff)") { d =>
      graft.operators.Tfidf.knTrigramPpl(
        d.filter(pmod(col("doc_id"), lit(10)) =!= 0), d, "text", "doc_id")
        .select(col("doc_id"), col("n_trigrams"), round(col("nll"), 6).as("nll_r"))
    }
    invariant("span corruption") { d =>
      graft.operators.Augment.spanCorrupt(d, "doc_id", "text", "pi", 100, 3)
    }
    invariant("winnow matches") { d =>
      graft.operators.Dedup.winnowMatches(d, "text", "doc_id", minShared = 2)
    }
    invariant("incremental winnow report") { d =>
      val idx = graft.operators.Dedup.winnowIndex(
        d.filter(pmod(col("doc_id"), lit(2)) === 0), "text", "doc_id")
      graft.operators.Dedup.incrementalWinnow(idx,
        d.filter(pmod(col("doc_id"), lit(2)) === 1)
          .withColumn("doc_id", col("doc_id") + 50000L),
        "text", "doc_id")._1
    }
    invariant("keep-one span scrub") { d =>
      graft.operators.Repetition.scrubRepeatedSpans(
        d.select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" shared banner tokens one two three four five")))
            .otherwise(col("text")).as("text")),
        "doc_id", "text", n = 8, minDocs = 2, keepFirst = true)
    }
  }

  test("ivf-pq search over built+appended index is partition-invariant") {
    val emb = sf("embeddings").select(col("vec_id"), col("embedding"))
    val centroids =
      graft.functions.expressions.HashExpressions.fixedCentroids(100, 16, 64)
    val fc = graft.functions.expressions.HashExpressions.fixedCentroids(200, 128, 8)
    val codebooks = Array.tabulate(8)(j => fc.slice(j * 16, j * 16 + 16))
    def run(e: DataFrame): Set[org.apache.spark.sql.Row] = {
      val idx = graft.operators.Ann.ivfPqAppend(
        graft.operators.Ann.ivfPqIndex(e.filter(pmod(col("vec_id"), lit(2)) === 0),
          "embedding", "vec_id", centroids, codebooks),
        e.filter(pmod(col("vec_id"), lit(2)) === 1), "embedding", "vec_id",
        centroids, codebooks)
      graft.operators.Ann.ivfPqSearch(idx,
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding")),
        "embedding", "vec_id", "query_id", centroids, codebooks,
        k = 10, nprobe = 4).collect().toSet
    }
    val a = run(emb.coalesce(1))
    val b = run(emb.repartition(7, col("vec_id")))
    assert(a == b && a.nonEmpty)
  }
}
