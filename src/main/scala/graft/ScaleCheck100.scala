package graft

import graft.functions.{SimilarityFunctions => S}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× scale tier for the three headliner shapes (round-6 evidence ladder
  * extension — the 10× table in ScaleCheck stays the per-family sweep):
  * jaccard self-join, fuzzy entity match on Zipf blocks, sequence packing.
  *
  * Replication here PERTURBS each replica (≈40% of tokens get a
  * replica-unique suffix) so cross-replica near-dup pairs do NOT form:
  * unperturbed replication grows dup-clique output quadratically — at 100×
  * that measures the output writer, not the join. With perturbation, input
  * grows 100× and true output grows ~100× (within-replica pairs only) — the
  * regime a real 100 TB corpus with bounded dup-group sizes is in, which is
  * exactly the claim the plans need to support. Zipf/fuzzy and packing
  * replicate with fresh ids (their cost is key-distribution-driven, not
  * content-driven).
  *
  * Usage: runMain graft.ScaleCheck100 [sfDir] [replication=100]
  */
object ScaleCheck100 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def timed[A](tag: String)(f: => (A, Long)): A = {
      // untimed inter-row cleanup (Bench.runTimed's posture — see ScaleCheck)
      try { spark.catalog.clearCache() } catch { case _: Throwable => () }
      System.gc()
      Thread.sleep(300)
      val sb0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val (a, rows) = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val sMB = (shuffleBytes.get() - sb0) / 1e6
      println(f"[scale100] $tag: $rows rows in $dt%.1f s (shuffle ~$sMB%.1f MB)")
      a
    }

    val docs = queries.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    docs.count()
    val offset = docs.agg(max(col("doc_id"))).head().getLong(0) + 1

    // ---- 1. jaccard self-join: perturbed 100x replication ----
    // replica i rewrites tokens whose hash lands in 2/5 of the space to a
    // replica-suffixed spelling: within-replica similarity is untouched,
    // cross-replica jaccard drops to ~(3/5)/(2·2/5+3/5) ≈ 0.43 < 0.7.
    def perturbed(i: Int): DataFrame = docs.select(
      (col("doc_id") + lit(i.toLong * offset)).as("doc_id"),
      col("lang"), col("source"),
      array_join(transform(split(col("text"), "\\s+"), t =>
        when(pmod(xxhash64(t, lit(i)), lit(5)) < 2, concat(t, lit("_r"), lit(i)))
          .otherwise(t)), " ").as("text"))
    val rep = (0 until n).map(perturbed).reduce(_ unionByName _)
    def toks(df: DataFrame) = df.select(col("lang"), col("source"), col("doc_id"),
      array_distinct(S.tokens(col("text"))).as("toks"))
    Seq(perturbed(0) -> "1x", rep -> s"${n}x").foreach { case (df, tag) =>
      timed(s"jaccardSelfJoin t=0.7 blocked $tag (perturbed replicas)") {
        val p = operators.Dedup.jaccardSelfJoin(toks(df), "toks", "doc_id",
            Seq("lang", "source"), 0.7)
          .select(col("id_a"), col("id_b")).localCheckpoint(true)
        ((), p.count())
      }
    }

    // ---- 2. fuzzy entity match, Zipf(≈1) blocks ----
    val fspec = operators.EntityMatch.MatchSpec(
      primaryTable = "", globalIdField = "globalid", sortField = "",
      sourcePrimaryKey = "", sourceSystemKey = "",
      levels = Seq(operators.EntityMatch.LevelSpec("1", Seq("blk"),
        Seq(operators.EntityMatch.FieldSpec("name", "string", "jarowinkler",
          Some(0.85), 1.0)), 1.0)))
    def zipfSide(side: String, nRows: Int): DataFrame = {
      val k = 10000.0
      val u = pmod(xxhash64(col("id"), lit(side)), lit(1000000)).cast("double") / 1000000.0
      spark.range(nRows).select(
        concat(lit(side), col("id")).as("rid"),
        concat(lit("z"), floor(exp(u * math.log(k)))).as("blk"),
        concat(lit("name "), pmod(xxhash64(col("id") * 13), lit(200))).as("name"))
    }
    val zipfBase = 15000
    Seq(1 -> "1x", n -> s"${n}x").foreach { case (m, tag) =>
      Seq(false -> "", true -> " collapseIncoming").foreach { case (collapse, ctag) =>
        timed(s"fuzzy match zipf-blocks $tag$ctag") {
          val (ma, u) = operators.EntityMatch.fuzzyMatch(
            zipfSide("i", zipfBase * m)
              .withColumn("globalid", lit(null).cast("string")),
            zipfSide("p", zipfBase * m)
              .withColumn("globalid", concat(lit("g-"), col("rid"))),
            fspec, Seq("rid"), collapseIncoming = collapse)
          ((), ma.count() + u.count())
        }
      }
    }

    // ---- 3. sequence packing ----
    val docsTok = docs.select(col("doc_id"),
      functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val repTok = (0 until n).map(i => docsTok.select(
        (col("doc_id") + lit(i.toLong * offset)).as("doc_id"), col("n_tokens")))
      .reduce(_ unionByName _)
    Seq(docsTok -> "1x", repTok -> s"${n}x").foreach { case (df, tag) =>
      timed(s"sequence packing $tag")(((),
        operators.Sampling.packSequences(df, "doc_id", "n_tokens", 2048L).count()))
    }

    // ---- 4. mergeable sketches at 100× (round-7 ladder extension) ----
    // partial sketches keep the shuffle at bytes-per-partition however large
    // the corpus — at 100× (~15M tokens) the wall must track the scan only.
    val repIds = (0 until n).map(i => docs.select(
        (col("doc_id") + lit(i.toLong * offset)).as("doc_id"),
        col("lang"), col("text")))
      .reduce(_ unionByName _)
    Seq(docs -> "1x", repIds -> s"${n}x").foreach { case (df, tag) =>
      import functions.expressions.{SketchAggregates => SK}
      val t = df.select(col("lang"), explode(S.tokens(col("text"))).as("tok"))
      timed(s"kmv+cms sketch per lang $tag")(((),
        t.groupBy(col("lang"))
          .agg(SK.kmv_sketch(
              conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"), 64)
            .as("kmv"),
            SK.cms_sketch(col("tok"), 4, 64).as("cms"))
          .count()))
    }

    // ---- 5. fixed-point PageRank at 100× (1M-edge graph, 3 iterations) ----
    Seq(docs -> "1x", repIds -> s"${n}x").foreach { case (df, tag) =>
      val nodes = df.select(col("doc_id"))
      val nn = nodes.agg((max(col("doc_id")) + 1).as("__n"))
      val edges = nodes.crossJoin(broadcast(nn)).select(col("doc_id").as("src"),
        explode(array((col("doc_id") * 2 + 1) % col("__n"),
          (col("doc_id") * 5 + 3) % col("__n"))).as("dst"))
      timed(s"pagerank 3 iters $tag")(((),
        operators.PageRank.fixedPoint(edges, "src", "dst", nodes, "doc_id",
          iterations = 3).count()))
    }

    // ---- 6. repeated-span scrub at 100× (round-7 ladder extension) ----
    // q107's shape with the banner planted on every 7th doc, over PERTURBED
    // replicas: the per-replica token rewrite keeps within-replica banner
    // grams hot (~14% of the replica's docs share them) while cross-replica
    // grams diverge — hot-set size grows ~linearly with replicas, the regime
    // a real corpus's boilerplate is in. Unperturbed replication would make
    // EVERY gram hot (all docs ≥ 100 copies) and measure the rebuild writer,
    // not the scrub.
    def banner(df: DataFrame): DataFrame = df.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), lit(" subscribe to our newsletter for updates" +
          " terms of service apply today"))).otherwise(col("text")).as("text"))
    // localCheckpoint sink, NOT count(): count of the left-preserving join
    // lets Catalyst prune the entire gram/scrub computation (measured 0.1 s /
    // 0 MB — the harness, not the operator); checkpointing materializes
    // every column, same posture as the jaccard row above
    Seq(perturbed(0) -> "1x", rep -> s"${n}x").foreach { case (df, tag) =>
      timed(s"span scrub n=8 minDocs=2 $tag (perturbed replicas)") {
        val p = operators.Repetition.scrubRepeatedSpans(banner(df), "doc_id", "text",
          n = 8, minDocs = 2).localCheckpoint(true)
        val c = p.count()
        p.unpersist(true)
        ((), c)
      }
    }

    // ---- 6b. Bloom decontamination at 100× (round-8 addition) ----
    // build = one bounded aggregate over the (fixed) bench set; probe = one
    // codegen'd corpus scan with the 128 KiB bitset as a reference object.
    // Wall must track the scan; corpus-side shuffle must be ~ZERO at any
    // size (localCheckpoint sink — count() would prune the probe).
    val benchSet = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
      .select(col("doc_id"), col("text"))
    Seq(docs -> "1x", repIds -> s"${n}x").foreach { case (df, tag) =>
      timed(s"bloom decontamination n=13 $tag") {
        val p = operators.Dedup.bloomDecontaminate(
          df.select(col("doc_id"), col("text")), benchSet, "text", "doc_id", n = 13)
          .localCheckpoint(true)
        val c = p.count()
        p.unpersist(true)
        ((), c)
      }
    }

    // ---- 7. BM25 top-10 at 100× (round-7 ladder extension) ----
    // fixed request-sized query set (q105's), corpus replicated with fresh
    // ids: the broadcast-semi-join contract means only tokens matching the
    // (tiny) query-term list shuffle — wall must track the scan, shuffle the
    // matched slice, at any corpus size.
    Seq(docs -> "1x", repIds -> s"${n}x").foreach { case (df, tag) =>
      timed(s"bm25 top-10, 4 queries $tag")(((),
        operators.Retrieval.bm25TopK(df, "text", "doc_id",
          queries.TextQueries.Bm25Queries, k = 10).count()))
    }

    // ---- 9. KMV set ops: the sketches stay 32 longs per (lang, half)
    // whatever the corpus size — shuffle must stay ~FLAT at 100× while
    // runtime tracks the token scan. (rep100 token STREAM grows 100×; the
    // distinct-hash stream the TreeSet sees grows 100× too, but partials
    // still emit k longs per partition.)
    locally {
      import functions.expressions.{SketchAggregates => SK}
      def setOps(df: DataFrame) = {
        val grams = df.select(col("lang"),
            pmod(col("doc_id"), lit(2)).as("half"),
            explode(S.tokens(col("text"))).as("tok"))
          .select(col("lang"), col("half"),
            conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
        val sks = grams.groupBy(col("lang"), col("half"))
          .agg(SK.kmv_sketch(col("h"), 32).as("sk"))
        sks.filter(col("half") === 0).select(col("lang"), col("sk").as("ska"))
          .join(sks.filter(col("half") === 1)
            .select(col("lang"), col("sk").as("skb")), Seq("lang"))
          .select(SK.kmv_jaccard(col("ska"), col("skb"), 32).as("j"),
            SK.kmv_intersect_estimate(col("ska"), col("skb"), 32).as("i"))
      }
      val rep100 = (0 until n).map(i => docs.select(
          (col("doc_id") + lit(i.toLong * offset)).as("doc_id"),
          col("lang"), col("text")))
        .reduce(_ unionByName _)
      Seq(docs -> "1x", rep100 -> s"${n}x").foreach { case (df, tag) =>
        timed(s"kmv set ops per lang $tag")(((), setOps(df).count()))
      }
    }

    // ---- 10. batch sessionize: one user-hash window exchange — runtime
    // and shuffle must track rows ~linearly (1k users, so per-user frames
    // grow 100× as well: the in-partition sort is the stressed piece).
    locally {
      def ev(rows: Long) = spark.range(rows).select(
        col("id").as("event_id"), pmod(col("id"), lit(1000L)).as("user_id"),
        timestamp_micros(lit(1700000000000000L) +
          pmod(xxhash64(col("id")), lit(30L * 86400 * 1000000L))).as("ts"))
      Seq(100000L -> "1x", 100000L * n -> s"${n}x").foreach { case (rows, tag) =>
        timed(s"batch sessionize gap=1h, 1k users $tag")(((),
          operators.WindowOps.sessionize(ev(rows), "user_id", "ts", 3600,
              Seq(col("event_id")))
            .agg(bit_xor(xxhash64(struct(col("user_id"), col("session_idx"))))
              .as("ck"), count(lit(1)).as("cnt")).head().getLong(1)))
      }
    }

    // ---- 11. z-order layout: one range exchange + local sort — runtime
    // and shuffle must track rows ~linearly; no global sort may appear.
    locally {
      def pts(rows: Long) = spark.range(rows).select(
        pmod(col("id") * 7919, lit(1L << 16)).as("x"),
        pmod(col("id") * 104729, lit(1L << 16)).as("y"))
      Seq(200000L -> "1x", 200000L * n -> s"${n}x").foreach { case (rows, tag) =>
        timed(s"zorder 16-bit 2-dim layout $tag")(((),
          operators.Layout.zorderBy(pts(rows), Seq(col("x"), col("y")), 16, 32)
            .agg(bit_xor(xxhash64(col("zval"))).as("ck"),
              count(lit(1)).as("cnt")).head().getLong(1)))
      }
    }

    // ---- 12. NFD bin packing at 100×, buckets scaled alongside: per-bucket
    // work constant, shuffle row-linear, wall ~flat.
    locally {
      def lens(rows: Long) = spark.range(rows).select(col("id"),
        (pmod(xxhash64(col("id")), lit(900L)) + 100L).as("len"))
      Seq((100000L, 64) -> "1x", (100000L * n, 64 * n) -> s"${n}x").foreach {
        case ((rows, buckets), tag) =>
          timed(s"nfd bin packing cap=2048 $tag")(((),
            operators.Sampling.binPackDocs(lens(rows), "id", "len", 2048,
              buckets, "bp").count()))
      }
    }

    // ---- 13. token divergence at 100×: replicas repeat the same tokens, so
    // the post-combine count table must NOT grow — shuffle bounded by vocab.
    locally {
      val rep100 = (0 until n).map(i => docs.select(
          (col("doc_id") + lit(i.toLong * offset)).as("doc_id"),
          col("lang"), col("text")))
        .reduce(_ unionByName _)
      Seq(docs -> "1x", rep100 -> s"${n}x").foreach { case (df, tag) =>
        timed(s"token divergence per lang $tag")(((),
          operators.CorpusStats.tokenDivergence(
              df.select(col("lang"), pmod(col("doc_id"), lit(2)).as("side"),
                S.tokens(col("text")).as("toks")), "toks", "lang", "side")
            .agg(bit_xor(xxhash64(struct(col("kl_ab"), col("chi2")))).as("ck"),
              count(lit(1)).as("cnt")).head().getLong(1)))
      }
    }

    // ---- 14. directed containment join at 100× (the q126 family): perturbed
    // replicas keep cross-replica containments from forming, so true output
    // grows ~100× (within-replica snippet→source pairs). The a-side prefix
    // is rank-linear and the b-side full inverted index token-linear; the
    // growth check validates no pairs² term from the hot shared-vocab
    // tokens (rare/perturbed tokens dominate the prefixes).
    locally {
      def withSnippets(df: DataFrame): DataFrame = {
        val snips = df.filter(pmod(col("doc_id"), lit(9)) === 0)
          .select((col("doc_id") + lit(100L * offset)).as("doc_id"),
            col("lang"), col("source"),
            array_join(slice(split(col("text"), "\\s+"), lit(1),
              greatest(ceil(size(split(col("text"), "\\s+")) * lit(0.6))
                .cast("int"), lit(1))), " ").as("text"))
        df.unionByName(snips)
      }
      def shingles(df: DataFrame) = df.select(col("lang"), col("source"),
        col("doc_id"), graft.functions.expressions.HashExpressions
          .hashed_shingles(col("text"), 2).as("toks"))
      Seq(perturbed(0) -> "1x", rep -> s"${n}x").foreach { case (df, tag) =>
        timed(s"containmentJoin t=0.8 blocked, planted snippets $tag")(((),
          operators.Dedup.containmentJoin(shingles(withSnippets(df)), "toks",
            "doc_id", Seq("lang", "source"), 0.8)
            .select(col("id_a"), col("id_b")).localCheckpoint(true).count()))
      }
    }

    // ---- 15. incremental dedup at 100×: FIXED daily batch against a
    // 100×-grown stored corpus (perturbed replicas so cross-replica matches
    // don't explode the output). The batch×stored prefix join is
    // stored-token-linear on the index side only — the daily-ingest cost
    // contract at the 100 TB shape.
    locally {
      val toksOf = (df: DataFrame) => df.select(col("doc_id"), col("lang"),
        col("source"), array_distinct(S.tokens(col("text"))).as("toks"))
      val batch = toksOf(perturbed(0).filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + lit(1000L * offset)).as("doc_id"),
          col("lang"), col("source"), col("text")))
        .localCheckpoint(true)
      Seq(perturbed(0) -> "1x", rep -> s"${n}x").foreach { case (df, tag) =>
        timed(s"incremental dedup, fixed batch vs $tag stored corpus")(((),
          operators.Dedup.incrementalDedup(toksOf(df), batch, "toks",
            "doc_id", Seq("lang", "source"), 0.7)
            .groupBy(col("status")).count().collect().map(_.getLong(1)).sum))
      }
    }

    // ---- 16b. persisted-index fixpoints at 100×: BM25 postings
    // append+search and IVF-PQ append+search vs 100×-grown indexes (built
    // OUTSIDE the timers — persisted state), plus incremental CC against a
    // 100×-node stored labeling. The daily path must stay batch-scoped.
    locally {
      val bmBatch = perturbed(0).filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + lit(3000L * offset)).as("doc_id"), col("text"))
        .localCheckpoint(true)
      Seq(perturbed(0) -> "1x", rep -> s"${n}x").foreach { case (df, tag) =>
        val (p, l) = operators.Retrieval.bm25Index(
          df.select(col("doc_id"), col("text")), "text", "doc_id")
        val (pi, li) = (p.localCheckpoint(true), l.localCheckpoint(true))
        timed(s"bm25 index append fixed batch + top-10 search vs $tag index")(((),
          { val (p2, l2) = operators.Retrieval.bm25Append(pi, li, bmBatch,
              "text", "doc_id")
            operators.Retrieval.bm25Search(p2, l2, "doc_id",
              queries.TextQueries.Bm25Queries, k = 10).count() }))
      }

      val embAll = queries.Tables(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val eoff = embAll.agg(max(col("vec_id"))).head().getLong(0) + 1
      val embRep = (0 until n).map(i => embAll.select(
          (col("vec_id") + lit(i.toLong * eoff)).as("vec_id"), col("embedding")))
        .reduce(_ unionByName _)
      val centroids =
        graft.functions.expressions.HashExpressions.fixedCentroids(100, 16, 64)
      val fcb = graft.functions.expressions.HashExpressions.fixedCentroids(200, 128, 8)
      val codebooks = Array.tabulate(8)(j => fcb.slice(j * 16, j * 16 + 16))
      val vBatch = embAll.filter(pmod(col("vec_id"), lit(7)) === 0)
        .select((col("vec_id") + lit(100L * eoff * n)).as("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val vq = embAll.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding")).localCheckpoint(true)
      Seq(embAll -> "1x", embRep -> s"${n}x").foreach { case (df, tag) =>
        val idx = operators.Ann.ivfPqIndex(df, "embedding", "vec_id",
          centroids, codebooks).localCheckpoint(true)
        timed(s"ivf-pq append fixed batch + top-10 search vs $tag index")(((),
          operators.Ann.ivfPqSearch(
            operators.Ann.ivfPqAppend(idx, vBatch, "embedding", "vec_id",
              centroids, codebooks),
            vq, "embedding", "vec_id", "query_id", centroids, codebooks,
            k = 10, nprobe = 4).count()))
      }

      // 10-star components; the fixed batch bridges 500 component pairs —
      // the honest merge shape, still batch-scoped
      def starGraph(nodes: Long) = spark.range(nodes)
        .select(col("id").as("src"), (col("id") - pmod(col("id"), lit(10))).as("dst"))
      val ccBatch = spark.range(500)
        .select((col("id") * 20).as("src"), (col("id") * 20 + 10).as("dst"))
        .localCheckpoint(true)
      Seq(10000L -> "1x", 1000000L -> s"${n}x").foreach { case (nn, tag) =>
        val labels = operators.ConnectedComponents.run(starGraph(nn), "src", "dst",
          localEdgeThreshold = 0).localCheckpoint(true)
        timed(s"incremental CC, fixed 500-bridge batch vs $tag stored labeling")(((),
          operators.ConnectedComponents.incremental(labels, ccBatch).count()))
      }
    }

    // ---- 16. incremental minhash at 100×: FIXED daily batch against a
    // 100×-grown stored signature INDEX (perturbed replicas). The index is
    // built outside the timer (persisted state in the daily contract); the
    // timed path bands the batch, semi-joins stored bucket rows down to
    // batch-touched buckets (broadcast — the stored side never shuffles),
    // and forms only batch-driven pairs. Daily wall must track the batch,
    // not the index.
    locally {
      val batch = perturbed(0).filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + lit(2000L * offset)).as("doc_id"), col("text"))
        .localCheckpoint(true)
      Seq(perturbed(0) -> "1x", rep -> s"${n}x").foreach { case (df, tag) =>
        val idx = operators.Dedup.minhashIndex(
            df.select(col("doc_id"), col("text")), "text", "doc_id")
          .localCheckpoint(true)
        timed(s"incremental minhash, fixed batch vs $tag stored index")(((),
          operators.Dedup.incrementalMinhash(idx, batch, "text", "doc_id",
            threshold = 0.7)._1
            .groupBy(col("status")).count().collect().map(_.getLong(1)).sum))
      }
    }

    // ---- 17. co-occurrence PMI at 100×: pair volume Σ_docs tokens² is
    // linear in docs when per-doc sets are bounded (maxTokens); minSupport
    // scales with N so output stays the same collocation set. Wall must
    // grow ~linearly — the pinned-parallelism enumeration, never a 1-task
    // cliff or a vocab² product.
    locally {
      val docs1 = perturbed(0).select(col("doc_id"), col("text"))
      Seq(docs1 -> ("1x", 150), rep.select(col("doc_id"), col("text")) ->
          (s"${n}x", 150 * n)).foreach { case (df, (tag, ms)) =>
        timed(s"cooccurrencePmi minSupport=$ms $tag")(((),
          operators.CorpusStats.cooccurrencePmi(df, "text", "doc_id",
            minSupport = ms).count()))
      }
    }

    // ---- 18. label propagation at 100×: 3 iterations over a 2-out-degree
    // graph — per-iteration work linear in edges, labels re-materialized
    // per round so plan depth is constant at any scale.
    locally {
      Seq(5000L -> "1x", 500000L -> s"${n}x").foreach { case (nn, tag) =>
        val ids = spark.range(nn).select(col("id").as("doc_id")).localCheckpoint(true)
        val edges = ids.select(col("doc_id").as("src"),
            explode(array((col("doc_id") * 2 + 1) % nn,
              (col("doc_id") * 5 + 3) % nn)).as("dst"))
          .localCheckpoint(true)
        timed(s"labelPropagation 3 iters $tag")(((),
          operators.GraphOps.labelPropagation(edges, "src", "dst",
            ids, "doc_id", iters = 3).count()))
      }
    }

    // ---- 19. delete-discovery CROSSOVER at 100×: partition count scales
    // with the data (constant partition size), keys fixed. The stats path
    // is flat in table size (stats rows + the handful of candidate files);
    // the full-table semi-join grows with the data — at 100× the absolute
    // ordering flips and the index pays for itself.
    locally {
      import graft.catalog.{FileStats, Retention}
      def build(rows: Long, parts: Int, name: String): String = {
        val t = s"scaledel100.$name"
        spark.sql("CREATE DATABASE IF NOT EXISTS scaledel100")
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.range(rows).select(col("id").as("event_id"),
            col("id").as("user_id"),
            pmod(col("id"), lit(parts.toLong)).cast("int").as("bucket"))
          .repartition(parts, col("bucket"))
          .write.partitionBy("bucket").saveAsTable(t)
        t
      }
      val keys = spark.range(10).select((col("id") * 1777L + 13L).as("user_id"))
        .localCheckpoint(true)
      Seq((200000L, 32, "1x"), (200000L * n, 32 * n, s"${n}x")).foreach {
        case (rows, parts, tag) =>
          val tFull = build(rows, parts, s"full_$tag")
          timed(s"deleteRows FULL-SCAN discovery $tag")(((),
            Retention.deleteRows(spark, tFull, "user_id", keys).rowsDeleted))
          val tIdx = build(rows, parts, s"idx_$tag")
          val st = s"scaledel100.idx_${tag}_stats"
          spark.sql(s"DROP TABLE IF EXISTS $st")
          timed(s"deleteRows stats REFRESH (write-path amortized) $tag")(((),
            FileStats.refresh(spark, tIdx, st, FileStats.StatsSpec(
              Seq("user_id"), bloomCols = Seq("user_id"),
              bloomBits = 1 << 17)).filesScanned.toLong))
          timed(s"deleteRows STATS-PRUNED discovery $tag")(((),
            Retention.deleteRows(spark, tIdx, "user_id", keys,
              statsTable = Some(st)).rowsDeleted))
      }
    }

    // ---- 20. incremental LPA at 100×: stored graph ×100 (communities of
    // 10, in-block degree 3), batch fixed. From-scratch pays 3 full vote
    // rounds (joins + per-node argmax sorts over ~6·N edge-label rows);
    // the incremental pass broadcasts its frontier deltas, so big-side
    // work is map-side scans — at 100× the wall gap opens, not just the
    // shuffle-byte gap.
    locally {
      import graft.operators.GraphOps
      def ring(rows: Long) = spark.range(rows).select(col("id").as("src"),
        explode(array(Seq(1L, 3L, 5L).map(o =>
          col("id") - pmod(col("id"), lit(10L)) +
            pmod(col("id") + o, lit(10L))): _*)).as("dst"))
      val batch = spark.range(50).select((col("id") * 1777L).as("src"),
        (col("id") * 1777L + 5L).as("dst")).localCheckpoint(true)
      Seq(100000L -> "1x", 100000L * n -> s"${n}x").foreach { case (rows, tag) =>
        val nodes = spark.range(rows).select(col("id"))
        val edges = ring(rows).localCheckpoint(true)
        val trace = timed(s"LPA from-scratch 3-iter trace $tag")({
          val t = GraphOps.labelPropagationTrace(edges, "src", "dst",
            nodes, "id", 3).localCheckpoint(true)
          (t, t.count())
        })
        timed(s"LPA incremental fixed batch $tag")(((),
          GraphOps.incrementalLabelPropagation(edges, trace, batch,
              "src", "dst", 3)
            .agg(bit_xor(xxhash64(struct(col("iter"), col("id"), col("label"))))
              .as("ck"), count(lit(1)).as("cnt")).head().getLong(1)))
      }
    }

    // Incremental fixed-point PageRank: same ring fixture, FIXED 50-edge
    // batch — floor divisions quantize rank cascades, so the recompute is
    // batch-bounded; the from-scratch trace row is the ~Nx comparison.
    locally {
      import graft.operators.PageRank
      def ring(rows: Long) = spark.range(rows).select(col("id").as("src"),
        (col("id") - pmod(col("id"), lit(10L)) +
          pmod(col("id") + 1L, lit(10L))).as("dst"))
      val batch = spark.range(50).select((col("id") * 10L).as("src"),
        (col("id") * 10L + 5L).as("dst")).localCheckpoint(true)
      Seq(100000L -> "1x", 100000L * n -> s"${n}x").foreach { case (rows, tag) =>
        val nodes = spark.range(rows).select(col("id"))
        val edges = ring(rows).localCheckpoint(true)
        val trace = timed(s"PageRank from-scratch 3-iter trace $tag")({
          val t = PageRank.fixedPointTrace(edges, "src", "dst",
            nodes, "id", 3).localCheckpoint(true)
          (t, t.count())
        })
        timed(s"PageRank incremental fixed batch $tag")(((),
          PageRank.incrementalFixedPoint(edges, trace, batch,
              "src", "dst", 3)
            .agg(bit_xor(xxhash64(struct(col("iter"), col("id"), col("pr"))))
              .as("ck"), count(lit(1)).as("cnt")).head().getLong(1)))
      }
    }

    // Incremental exact-substring dedup: the stored window index grows Nx,
    // the batch is FIXED — daily cost = the batch's window pass plus a
    // map-side semi-join scan of the content-keyed index.
    locally {
      import graft.operators.SuffixArray
      def corpus(rows: Long, off: Long) = spark.range(rows)
        .select((col("id") + off).as("doc_id"),
          concat(lit("stored body with unique trail "),
            ((col("id") + off) * 7919L).cast("string"),
            when(pmod(col("id"), lit(13L)) === 0,
              lit(" shared-fortycharacter-boilerplate-banner-text")).otherwise(lit("")))
            .as("text"))
      val batch = corpus(2000L, 900000000L).localCheckpoint(true)
      Seq(20000L -> "1x", 20000L * n -> s"${n}x").foreach { case (rows, tag) =>
        val idx = timed(s"char-window index build $tag")({
          val i = SuffixArray.charWindowIndex(corpus(rows, 0L), "doc_id",
            "text", 40).localCheckpoint(true)
          (i, i.count())
        })
        timed(s"incremental substring dedup, fixed batch vs $tag index")(((),
          SuffixArray.incrementalScrubRepeatedCharSpans(idx, batch,
              "doc_id", "text", 40, keepFirst = true)._1
            .agg(bit_xor(xxhash64(struct(col("doc_id"), col("n_masked"),
              col("scrubbed_text")))).as("ck"), count(lit(1)).as("cnt"))
            .head().getLong(1)))
      }
    }

    // PER-DOC (gate-form) substring-index probe with a CORPUS-HOT window:
    // the q215 gate's index keeps one row per (document, window content) so
    // deletion is row-exact — the price is that a batch touching a window
    // present in EVERY stored document pulls O(corpus occurrences) index
    // rows into the batch-touched aggregation (per-occurrence probe cost,
    // the BM25-postings shape). This row MEASURES that documented growth
    // instead of leaving it asserted: the same fixed batch probes (a) the
    // COMPACT one-row-per-content index and (b) the PER-DOC index, both
    // built over a corpus where the boilerplate banner is in EVERY doc.
    locally {
      import graft.operators.SuffixArray
      def hot(rows: Long, off: Long) = spark.range(rows)
        .select((col("id") + off).as("doc_id"),
          concat(lit("stored body with unique trail "),
            ((col("id") + off) * 7919L).cast("string"),
            lit(" shared-fortycharacter-boilerplate-banner-text")).as("text"))
      val batch = hot(2000L, 900000000L).localCheckpoint(true)
      def probe(idx: org.apache.spark.sql.DataFrame, tag: String): Unit =
        timed(tag)(((),
          SuffixArray.incrementalScrubRepeatedCharSpans(idx, batch,
              "doc_id", "text", 40, keepFirst = true,
              needUpdatedIndex = false)._1
            .agg(bit_xor(xxhash64(struct(col("doc_id"), col("n_masked"),
              col("scrubbed_text")))).as("ck"), count(lit(1)).as("cnt"))
            .head().getLong(1)))
      Seq(20000L -> "1x", 20000L * n -> s"${n}x").foreach { case (rows, tag) =>
        val compact = timed(s"hot-window COMPACT index build $tag")({
          val i = SuffixArray.charWindowIndex(hot(rows, 0L), "doc_id",
            "text", 40).localCheckpoint(true)
          (i, i.count())
        })
        probe(compact, s"hot-window scrub, fixed batch vs $tag COMPACT index")
        val perDoc = timed(s"hot-window PER-DOC index build $tag")({
          val i = SuffixArray.charWindowIndexPerDoc(hot(rows, 0L), "doc_id",
            "text", 40).localCheckpoint(true)
          (i, i.count())
        })
        probe(perDoc, s"hot-window scrub, fixed batch vs $tag PER-DOC index")
      }
    }

    // Char-exact substring dedup (rolling-hash nomination + exact verify):
    // duplicated content is a FIXED 1/13 fraction, so hot positions grow
    // ~Nx while unique text grows ~Nx too — the check is that WALL and
    // SHUFFLE both track N linearly (the corpus-sized stages are one
    // 8-byte count and one 16-byte semi-join per char; the verify/rebuild
    // stages are candidate-sized). The prefix-doubling form this replaced
    // measured 3.3 GB shuffle at 10x and could not be run at 100x.
    locally {
      def sdocs(rows: Long) = spark.range(rows).select(col("id").as("doc_id"),
        concat(lit("document body with unique trail "),
          (col("id") * 7919L).cast("string"),
          when(pmod(col("id"), lit(13L)) === 0,
            lit(" shared-fortycharacter-boilerplate-banner-text")).otherwise(lit("")))
          .as("text"))
      Seq(20000L -> "1x", 20000L * n -> s"${n}x").foreach { case (rows, tag) =>
        timed(s"exact-substring char dedup minLen=40 $tag")(((),
          operators.SuffixArray.scrubRepeatedCharSpans(sdocs(rows), "doc_id",
              "text", 40)
            .agg(bit_xor(xxhash64(struct(col("doc_id"), col("n_masked"),
              col("scrubbed_text")))).as("ck"), count(lit(1)).as("cnt"))
            .head().getLong(1)))
      }
    }

    spark.stop()
  }
}
