package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent dataset splitting for training
  * pipelines: a row's split is a pure function of its id (md5 bucket), so the
  * assignment is reproducible across runs, engines, and cluster sizes, and
  * new rows never reshuffle old ones between splits — unlike randomSplit,
  * which depends on partitioning and seed plumbing. */
object Sampling {

  /** Stable bucket in [0, 65536) from the md5 of the stringified id.
    * NULL ids land deterministically in bucket 0 (the first-named split /
    * always-sampled stratum) instead of silently falling through to the
    * LAST split via three-valued logic. */
  def hashBucket(id: Column): Column =
    coalesce(conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int"), lit(0))

  /** Assign each row a named split with the given weights (normalized).
    * Buckets partition [0, 65536) by cumulative weight. */
  def splitByHash(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights required")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(f => math.round(f * 65536).toInt)
    val bucket = hashBucket(col(idCol))
    val expr = weights.zipWithIndex.foldRight(lit(weights.last._1)) {
      case (((name, _), i), acc) =>
        when(bucket >= cuts(i) && bucket < cuts(i + 1), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** LEAK-SAFE split: [[splitByHash]] keyed by the near-dup COMPONENT, not
    * the document — the guard against the classic eval-contamination bug
    * where a train doc's near-duplicate lands in test and inflates every
    * metric. Every member of a connected near-dup component hashes on the
    * component's canonical (min) id, so a whole dup cluster moves to ONE
    * side of every boundary; singleton docs hash on themselves, exactly as
    * the plain split would.
    *
    * Scale: the pairs frame is whatever near-dup join the pipeline already
    * ran (jaccardSelfJoin / minhashPairs); components add the usual
    * path-halving rounds, and the split itself stays one zero-shuffle
    * projection over the broadcast-joined labels (components frame ≈ the
    * DUP subset of the corpus, typically far smaller than the corpus).
    *
    * @param pairs near-dup pairs (idACol, idBCol) over `df`'s id space
    * @return df + (split_key, split) — split_key the component canonical id */
  def leakSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                    idACol: String, idBCol: String,
                    weights: Seq[(String, Double)]): DataFrame = {
    val comps = ConnectedComponents.run(pairs, idACol, idBCol)
    val keyed = df
      .join(comps.select(col("vertex").as(idCol), col("component")), Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("component"), col(idCol)))
      .drop("component")
    splitByHash(keyed, "split_key", weights)
  }

  /** Deterministic WEIGHTED sample without replacement, k items: Efraimidis-
    * Spirakis via the Gumbel-key trick already proven in [[dsirSample]] —
    * key(i) = logw(i) − ln(−ln u(i)) with u a stable per-id hash uniform,
    * take the top k by (key desc, id). P(i in sample) follows the
    * sequential weighted draw; deterministic in (seed, id, weight), so an
    * oracle replays it exactly. One bounded top-k (no global sort — Spark
    * turns orderBy+limit into TakeOrdered with O(k) per-partition heaps).
    *
    * @param logWeightCol log-weight column (log keeps the key arithmetic
    *                     exact-replayable; pass log(w) for raw weights)
    * @return the k sampled rows + (u_r, key_r, rank) */
  def weightedSample(df: DataFrame, idCol: String, logWeightCol: String,
                     k: Int, seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    // 52-bit uniform (13 md5 hex digits): every value is mantissa-exact in a
    // double, so the SQL oracle replays it bit-for-bit — and unlike a 16-bit
    // bucket, equal-weight docs essentially never collide on u, so the id
    // tie-break is a true last resort rather than a systematic low-id bias.
    val u = (conv(substring(md5(concat(lit(seed + "|"), col(idCol).cast("string"))), 1, 13),
      16, 10).cast("double") + lit(0.5)) / 4503599627370496.0 // 2^52
    val keyed = df
      .withColumn("u_r", round(u, 9))
      .withColumn("key_r", round(col(logWeightCol) - log(-log(u)), 9))
      .orderBy(col("key_r").desc, col(idCol)).limit(k)
    keyed.withColumn("rank", row_number().over(
      Window.orderBy(col("key_r").desc, col(idCol))).cast("long"))
  }

  /** Deterministic stratified sample: keep `fractions(stratum)` of each
    * stratum (default fraction for unlisted strata), selected by the same
    * stable id-hash — the reproducible analog of `DataFrame.stat.sampleBy`.
    * The hash is salted with the stratum so the same id can be selected in
    * one stratum and not another. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    val bucket = hashBucket(concat(col(stratumCol).cast("string"), lit("|"),
      col(idCol).cast("string")))
    val cutoff = fractions.foldLeft(lit(math.round(defaultFraction * 65536).toInt)) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(math.round(f * 65536).toInt)).otherwise(acc)
    }
    df.filter(bucket < cutoff)
  }

  /** Deterministic TOKEN-BUDGET sample: keep documents, in stable
    * (hashBucket, id) order, while the running token total stays ≤ `budget`
    * — "give me ~N tokens of corpus", reproducible across runs and cluster
    * sizes (the training-mixture primitive; fraction-based sampling can't
    * hit a token target when doc lengths are skewed).
    *
    * Scale shape: NO global sort/cumsum. Phase 1 aggregates token totals per
    * 16-bit hash bucket (≤65536 rows — a bounded frame) and prefix-sums them
    * with a window on that tiny frame; full buckets under the budget are
    * kept by a broadcast semi-join on the bucket id. Phase 2 runs the
    * intra-bucket cumulative sum ONLY inside the single boundary bucket
    * (~1/65536 of the corpus). Equivalent to the global-order cumsum ≤
    * budget, which is exactly what the oracle computes. */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokensCol: String,
                        budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Determinism hardening: NULL token counts count as 0 (a window sum
    // would otherwise SKIP them, leaving their keep/drop to row order), and
    // the boundary scan tie-breaks on the token count so duplicate ids with
    // different counts still cut deterministically. Rows identical in BOTH
    // (id, tokens) remain interchangeable — the kept multiset is the same
    // either way, which is all the reproducibility contract promises.
    val tok = coalesce(col(tokensCol).cast("long"), lit(0L))
    val withB = df.withColumn("__b", hashBucket(col(idCol)))
    val perBucket = withB.groupBy(col("__b"))
      .agg(sum(tok).as("__t"))
      .withColumn("__cum", sum(col("__t")).over(
        Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, 0)))
    val fullBuckets = perBucket.filter(col("__cum") <= budget)
      .select(col("__b"))
    // the first bucket whose cumulative total crosses the budget gets the
    // residual budget for its intra-bucket prefix scan
    val boundary = perBucket.filter(col("__cum") > budget)
      .orderBy(col("__b")).limit(1)
      .select(col("__b"), (lit(budget) - (col("__cum") - col("__t"))).as("__residual"))
    val keptFull = withB.join(broadcast(fullBuckets), Seq("__b"), "left_semi")
    val boundaryRows = withB.join(broadcast(boundary), Seq("__b"))
      .withColumn("__cum", sum(tok).over(
        Window.partitionBy(col("__b"))
          .orderBy(col(idCol), tok).rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("__cum") <= col("__residual"))
      .drop("__cum", "__residual")
    keptFull.unionByName(boundaryRows).drop("__b")
  }

  /** Deterministic SEQUENCE PACKING (concat-then-chunk): documents are laid
    * out in stable (hashBucket, id, tokens) order, token counts concatenated,
    * and cut at `seqLen` boundaries — each doc gets the training sequence its
    * first token lands in plus its offset there (docs may span a boundary,
    * as in the standard concat recipe). Output: (idCol, n_tokens, seq_id,
    * seq_offset).
    *
    * Scale shape: an EXACT global exclusive prefix sum with NO global
    * sort/cumsum — per-bucket totals prefix-sum on a ≤65,536-row frame
    * (broadcast back as bucket start offsets), intra-bucket exclusive cumsum
    * as an ordinary partitioned window. One shuffle by bucket + one
    * broadcast, any corpus size. NULL token counts count 0 (same
    * determinism contract as [[tokenBudgetSample]]). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    import org.apache.spark.sql.expressions.Window
    val tok = coalesce(col(tokensCol).cast("long"), lit(0L))
    val withB = df.select(col(idCol), tok.as("__t"))
      .withColumn("__b", hashBucket(col(idCol)))
    val bucketStarts = withB.groupBy(col("__b"))
      .agg(sum(col("__t")).as("__bt"))
      .withColumn("__bstart", coalesce(
        sum(col("__bt")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__b"), col("__bstart"))
    withB.join(broadcast(bucketStarts), Seq("__b"))
      .withColumn("__g", col("__bstart") + coalesce(
        sum(col("__t")).over(
          Window.partitionBy(col("__b")).orderBy(col(idCol), col("__t"))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(idCol), col("__t").as("n_tokens"),
        expr(s"__g div $seqLen").as("seq_id"),
        pmod(col("__g"), lit(seqLen)).as("seq_offset"))
  }

  /** Deterministic DOMAIN-MIXTURE sampling: keep a per-group fraction of
    * rows such that the sampled TOKEN mass approaches the `target`
    * distribution over `groupCol` (normalized weights), keeping as much data
    * as possible — the group whose target/available ratio is highest keeps
    * 100% and every other group scales down proportionally (the data-mixing
    * primitive: fraction-based per-group sampling can't hit token targets
    * when group sizes are skewed). Selection is the stable salted id-hash of
    * [[stratifiedSample]], so the result is reproducible anywhere. Groups
    * absent from `target` (or with zero weight / zero tokens) are dropped.
    *
    * Scale shape: one aggregation over the group cardinality (bounded by the
    * number of domains), rates joined back as a broadcast — no collect, no
    * extra pass over rows. Returns the kept rows plus their group `rate`. */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
                    tokensCol: String, target: Map[String, Double]): DataFrame = {
    require(target.nonEmpty && target.values.forall(_ >= 0) && target.values.sum > 0,
      "target weights must be non-negative with a positive sum")
    import org.apache.spark.sql.expressions.Window
    val wSum = target.values.sum
    val tok = coalesce(col(tokensCol).cast("long"), lit(0L))
    val fExpr = target.foldLeft(lit(0.0)) { case (acc, (g, w)) =>
      when(col(groupCol) === g, lit(w / wSum)).otherwise(acc)
    }
    val rates = df.groupBy(col(groupCol))
      .agg(sum(tok).as("__tg"))
      .withColumn("__f", fExpr)
      .filter(col("__f") > 0 && col("__tg") > 0)
      .withColumn("__ratio", col("__f") / col("__tg"))
      // group count is bounded (domains), so the unpartitioned window frame
      // is a few rows — not a scale concern
      .withColumn("rate", col("__ratio") / max(col("__ratio")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(groupCol), col("rate"))
    val bucket = hashBucket(concat(col(groupCol).cast("string"), lit("|"),
      col(idCol).cast("string")))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(bucket.cast("double") < col("rate") * 65536.0)
  }

  /** Temperature-scaled mixture sampling (the T5/UniMax-style τ exponent):
    * keep group g at a rate that makes expected kept tokens ∝ tokens_g^τ —
    * τ<1 flattens the domain distribution toward uniform, τ=1 is identity.
    *
    * The normalization cancels in closed form: with ratio_g ∝ tg_g^(τ-1)
    * and rates scaled so the binding group keeps 100%,
    *
    *   rate_g = (tg_ref / tg_g)^(1-τ),   tg_ref = min tg (τ≤1) / max (τ>1).
    *
    * No token share p_g, no Σ p^τ — so for τ=0.5 the whole computation is
    * integer sums + one double division + sqrt, ALL correctly-rounded IEEE
    * ops, and the result (selection AND rate) is bit-identical across
    * engines. Other τ go through pow (last-ulp engine-dependent — selection
    * boundaries are 1-in-2^40 events, rates should be rounded for compare).
    * Selection is the stable salted id-hash of [[stratifiedSample]].
    * Scale shape: one bounded aggregation + broadcast join, like
    * [[mixtureSample]]. */
  def temperatureMixtureSample(df: DataFrame, idCol: String, groupCol: String,
                               tokensCol: String, tau: Double): DataFrame = {
    require(tau > 0, "tau must be positive")
    import org.apache.spark.sql.expressions.Window
    val full = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val tok = coalesce(col(tokensCol).cast("long"), lit(0L))
    val tg = df.groupBy(col(groupCol)).agg(sum(tok).as("__tg"))
      .filter(col("__tg") > 0)
    val refCol = if (tau <= 1.0) min(col("__tg")).over(full)
                 else max(col("__tg")).over(full)
    val ratio = col("__ref").cast("double") / col("__tg").cast("double")
    val rateCol = if (tau == 0.5) sqrt(ratio) else pow(ratio, 1.0 - tau)
    val rates = tg.withColumn("__ref", refCol)
      .select(col(groupCol), rateCol.as("rate"))
    val bucket = hashBucket(concat(col(groupCol).cast("string"), lit("|"),
      col(idCol).cast("string")))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(bucket.cast("double") < col("rate") * 65536.0)
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its HASHED unigram features are under the target
    * slice (`targetPred`) than under the raw corpus, then draw the top-k
    * under deterministic Gumbel noise — the standard Gumbel-top-k trick that
    * turns "sample ∝ importance weight" into a sort.
    *
    *   logw(d) = Σ_buckets n_d(b) · [ln p̂_target(b) − ln p̂_source(b)]
    *
    * with add-one smoothing over `nBuckets` hashed buckets (bucket =
    * md5-bucket of the token, mod nBuckets — engine-independent, so the
    * whole computation replays in the oracle). Gumbel noise is a pure
    * function of the id: u = (md5-bucket("dsir|"+id)+0.5)/65536,
    * g = −ln(−ln u). Token-less documents emit no row.
    *
    * Scale shape: the feature space is BOUNDED (nBuckets rows), so both
    * "models" are one hash aggregation each collapsed to a broadcast
    * bucket→weight table; per-document scoring is one explode + one
    * (doc, bucket) aggregation + the broadcast join. Selection is a global
    * top-k (TakeOrdered — no full sort materializes); the rank window runs
    * over the k survivors only. Returns (id, logw_r, key_r, rank). */
  def dsirSample(docs: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, nBuckets: Int = 64,
                 k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets > 0 && k > 0, "nBuckets and k must be positive")
    val toks = docs.select(col(idCol), targetPred.as("__tgt"),
        explode(graft.functions.SimilarityFunctions.tokens(col(textCol))).as("token"))
      .withColumn("__bk", pmod(hashBucket(col("token")), lit(nBuckets)))
    val perBucket = toks.groupBy(col("__bk"))
      .agg(count(lit(1)).as("__cs"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"))
    val totals = perBucket.agg(sum(col("__cs")).as("__ts"), sum(col("__ct")).as("__tt"))
    // absent buckets never join a document row, so their smoothed mass only
    // matters through the totals — which count tokens, not buckets
    val weights = perBucket.crossJoin(broadcast(totals))
      .select(col("__bk"),
        (log((col("__ct").cast("double") + 1.0) /
            (col("__tt").cast("double") + nBuckets.toDouble)) -
          log((col("__cs").cast("double") + 1.0) /
            (col("__ts").cast("double") + nBuckets.toDouble))).as("__w"))
    val scored = toks.groupBy(col(idCol), col("__bk"))
      .agg(count(lit(1)).as("__n"))
      .join(broadcast(weights), Seq("__bk"))
      .groupBy(col(idCol))
      .agg(sum(col("__n") * col("__w")).as("__logw"))
    val keyed = scored.withColumn("__u",
        (hashBucket(concat(lit("dsir|"), col(idCol).cast("string"))) + lit(0.5)) / 65536.0)
      .withColumn("key_r", round(col("__logw") - log(-log(col("__u"))), 6))
      .withColumn("logw_r", round(col("__logw"), 6))
      .orderBy(col("key_r").desc, col(idCol)).limit(k)
    keyed.withColumn("rank", row_number().over(
        Window.orderBy(col("key_r").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("logw_r"), col("key_r"), col("rank"))
  }

  /** Deterministic EPOCH SHUFFLE-SHARD: the training-dataloader prep step —
    * give every row a pseudo-random position that is a pure function of
    * (seed, id), bucket rows into `nShards` shards, and number them within
    * their shard in shuffled order. Different seeds give independent epoch
    * orders; the same seed reproduces the same order on any cluster.
    *
    * Scale shape: ONE hash-partitioned shuffle by shard, then each shard
    * sorts independently (an ordinary partitioned window — no global sort,
    * no skew: md5 spreads ids uniformly). This is exactly the physical shape
    * of a sharded training-data writer: repartition(shard) + sortWithin.
    * Returns (id, shard, pos) with pos 1-based in shard order. */
  def epochShuffleShard(df: DataFrame, idCol: String, seed: String,
                        nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, s"nShards must be positive: $nShards")
    val h = md5(concat(lit(seed + "|"), col(idCol).cast("string")))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(
        conv(substring(col("__h"), 1, 4), 16, 10).cast("int"), lit(nShards)).cast("long"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))).cast("long"))
      .drop("__h")
  }

  /** Deterministic STRATIFIED INTERLEAVE: a total training order that
    * round-robins across strata (domains/sources) — position p of every
    * stratum comes before position p+1 of any stratum — with a seeded
    * pseudo-random order inside each stratum. This is the dataloader-prep
    * "balanced stream" order: a consumer reading the output sequentially
    * sees every domain early and at its natural rate, instead of whole
    * domains back-to-back (the failure mode of sorting by domain) or a
    * domain-blind global shuffle (which under-serves small domains early).
    *
    * Scale shape: NO global sort/window anywhere. Per-stratum `pos` is a
    * partitioned window (one hash shuffle by stratum); the GLOBAL position
    * is then computed arithmetically from the bounded per-stratum count
    * vector — global_pos(d, p) = Σ_{d'} min(cnt_{d'}, p)  +  |{d' < d :
    * cnt_{d'} > p}| — i.e. all rows with smaller pos, plus same-pos rows of
    * lexicographically earlier strata. The count vector is a
    * strata-bounded aggregate carried as ONE broadcast array row (same
    * pattern as [[mixtureSample]]'s rate table), so the whole computation
    * is a map-side expression: the exact distributed prefix-sum trick of
    * [[packSequences]], applied to interleaving.
    *
    * Returns (id, stratum, pos, global_pos), both positions 0-based;
    * global_pos is a bijection onto [0, N). */
  def stratifiedInterleave(df: DataFrame, idCol: String, stratumCol: String,
                           seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withPos = df
      .select(col(idCol), col(stratumCol).cast("string").as("__dom"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("__dom"))
          .orderBy(md5(concat(lit(seed + "|"), col(idCol).cast("string"))), col(idCol)))
        .cast("long") - lit(1L))
    val countVec = withPos.groupBy(col("__dom"))
      .agg(count(lit(1)).as("__cnt"))
      .agg(sort_array(collect_list(struct(col("__dom").as("d"), col("__cnt").as("c"))))
        .as("__arr"))
    withPos.crossJoin(broadcast(countVec))
      .withColumn("global_pos", aggregate(col("__arr"), lit(0L),
        (acc, e) => acc + least(e.getField("c"), col("pos")) +
          when(e.getField("d") < col("__dom") && e.getField("c") > col("pos"), lit(1L))
            .otherwise(lit(0L))))
      .select(col(idCol), col("__dom").as(stratumCol), col("pos"), col("global_pos"))
  }

  /** Deterministic per-group uniform k-sample: the k rows with the smallest
    * salted order hash in each group — per-domain/per-language caps without
    * a per-group WINDOW SORT. The bottom-k runs as a
    * TypedImperativeAggregate with O(k) partials (same machinery as the
    * top-k token heap), so each partition contributes at most k candidate
    * rows to the exchange however large the group is; a window row_number
    * would sort every group member. Uniformity comes from the md5 order
    * hash (a row's inclusion is a pure function of seed + id — stable
    * across runs and cluster sizes, the [[splitByHash]] property).
    *
    * @return (group, pos, id): pos = 1-based hash-order rank within the
    *         sample; groups smaller than k keep all members. */
  def groupSample(df: DataFrame, idCol: String, groupCol: String, k: Int,
                  seed: String): DataFrame = {
    import graft.functions.expressions.{SketchAggregates => SK}
    require(k > 0, "k must be positive")
    val h = md5(concat(lit(seed + "|"), col(idCol).cast("string")))
    df.select(col(groupCol), col(idCol), h.as("__h"))
      .groupBy(col(groupCol))
      .agg(SK.bottom_k_struct(
        struct(col("__h").as("h"), col(idCol).as("id")), k).as("__sample"))
      .select(col(groupCol), posexplode(col("__sample")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("pos"),
        col("col.id").as(idCol))
  }

  /** Whole-document bin packing, next-fit-decreasing per hash bucket — the
    * OTHER real packing strategy next to [[packSequences]]' concat-then-
    * chunk: each document stays intact (no mid-document truncation), bins
    * hold ≤ `capacity` tokens (oversize docs get a bin alone), and the
    * objective is few mostly-full bins for sample-efficient batch assembly.
    *
    * Exact FFD/NFD is inherently sequential, so the distributed form runs
    * NFD independently per salted HASH BUCKET: ONE shuffle by bucket, a
    * per-bucket (len desc, id) sort, one linear fold — deterministic under
    * any partitioning/parallelism because the bucket assignment and the
    * in-bucket order are pure functions of (seed, id, len). Within-bucket
    * memory is the bucket's rows (the caller scales `buckets` with the
    * corpus, like epochShuffleShard's shards), and packing quality matches
    * global NFD to within the usual per-shard fragmentation (≤ one
    * partially-filled trailing bin per bucket).
    *
    * @return (bucket, id, len, bin, load_after): `bin` is 1-based per
    *         bucket, `load_after` the bin's cumulative tokens after this
    *         doc — both fully replayable by a sequential oracle. */
  def binPackDocs(df: DataFrame, idCol: String, lenCol: String,
                  capacity: Long, buckets: Int, seed: String): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val s = df.sparkSession
    import s.implicits._
    val keyed = df
      .select(col(idCol).cast("long").as("id"), col(lenCol).cast("long").as("len"))
      .withColumn("bucket", pmod(
        conv(substring(md5(concat(lit(seed + "|"), col("id").cast("string"))), 1, 4),
          16, 10).cast("int"), lit(buckets)))
      .as[(Long, Long, Int)]
    keyed.groupByKey(_._3).flatMapGroups { (bucket, it) =>
      val docs = it.toArray.sortBy(t => (-t._2, t._1))
      val out = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Long)](docs.length)
      var bin = 0L
      var load = 0L
      docs.foreach { case (id, len, _) =>
        if (bin == 0L || load + len > capacity) { bin += 1; load = len }
        else load += len
        out += ((bucket, id, len, bin, load))
      }
      out.iterator
    }.toDF("bucket", idCol, lenCol, "bin", "load_after")
      .withColumn("bucket", col("bucket").cast("long"))
  }

  /** Per-group quality quota: keep the best ⌈(num/den)·n_g⌉ rows of each
    * group by (score desc, id asc) — "keep the top 30% of every domain".
    * The fraction is an exact integer rational: the keep predicate is
    * num·n_g > (rank−1)·den, so no float ceil is involved and a SQL replay
    * is bit-exact.
    *
    * A FRACTIONAL quota needs every group member ranked, so this is a
    * per-group window sort (partition-bounded — the topKPerGroup shape;
    * fine wherever a group fits a partition's sort budget). For an ABSOLUTE
    * quota use [[groupSample]]'s O(k)-partial heap instead — no sort at
    * any size. Group counts join back as a broadcast (groups are bounded).
    *
    * @return input columns + 1-based `rank` within the group. */
  def qualityQuota(df: DataFrame, idCol: String, groupCol: String,
                   scoreCol: String, num: Long, den: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(num > 0 && den > 0, "quota fraction must be positive")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq(groupCol))
      .filter(lit(num) * col("__n") > (col("rank") - 1) * lit(den))
      .drop("__n")
  }

  /** Cumulative Poisson(1) ladder for the bootstrap weights: weight k iff
    * u < cdf(k) first; the tail (u past the last threshold) gets 8 —
    * P ≈ 1e-5, bias negligible, ladder bounded. The literals are spelled
    * identically in the SQL oracle. */
  private val poisson1Cdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.919698602928606,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  /** POISSON BOOTSTRAP (the streaming/distributed bootstrap: each row draws
    * an independent Poisson(1) replication count per replicate, instead of
    * resampling n-of-n globally — the only bootstrap that works in one
    * pass over data too large to index): `replicates` deterministic
    * resamples of `valueCol`'s mean, weights from the inverse Poisson(1)
    * CDF over an md5 uniform, so the whole uncertainty estimate is
    * reproducible and oracle-replayable. Spread of `mean_r` across
    * replicates estimates the sampling error of the corpus statistic —
    * the error bar every corpus-stats dashboard should carry.
    *
    * Scale shape: one explode(×B) + one hash aggregation; weighted sums
    * are exact integers (value quantized 6dp → scaled long) so replicate
    * means are partition-order-independent. */
  def poissonBootstrap(df: DataFrame, idCol: String, valueCol: String,
                       replicates: Int, seed: String): DataFrame = {
    require(replicates >= 1 && replicates <= 1000)
    val rep = df.select(col(idCol), col(valueCol),
      explode(sequence(lit(0), lit(replicates - 1))).as("replicate"))
    val u = (conv(substring(md5(concat_ws("|", lit(seed),
        col("replicate").cast("string"), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)
    val w = poisson1Cdf.zipWithIndex.foldRight(lit(8): Column) {
      case ((t, k), acc) => when(u < lit(t), lit(k)).otherwise(acc)
    }
    // exact integer arithmetic: value quantized to 6dp as a scaled long,
    // so Σ(w·v) commutes under any partitioning
    val vq = round(col(valueCol).cast("double") * 1000000.0).cast("long")
    rep.select(col("replicate"), w.as("__w"), vq.as("__v"))
      .groupBy(col("replicate"))
      .agg(sum(col("__w")).as("n_eff"),
        sum(col("__w") * col("__v")).as("__s"))
      .select(col("replicate").cast("int").as("replicate"), col("n_eff"),
        when(col("n_eff") === 0, lit(null))
          .otherwise(round(col("__s").cast("double") / col("n_eff") / 1000000.0, 6))
          .as("mean_r"))
  }
}
