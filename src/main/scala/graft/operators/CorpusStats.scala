package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-distribution statistics in scale-friendly, oracle-exact
  * formulations. */
object CorpusStats {

  /** Histogram-bucket quantiles: the scalable answer to "p50/p90/p99 of a
    * value per group" over a corpus too large for a global sort. Values land
    * in `nBuckets` fixed-width buckets (one hash-partitioned groupBy with
    * map-side combine — integer counts, no sort of the raw values); the
    * q-quantile is the first bucket whose cumulative count reaches
    * ceil(q·N), computed with exact integer thresholds, so the result is
    * deterministic and replays exactly in SQL. Resolution is the bucket
    * width — the classic histogram-sketch tradeoff, explicit here.
    *
    * @param qs quantiles as (name, numerator, denominator) — e.g.
    *           ("p50", 1, 2); thresholds are ceil(num·N / den) in exact
    *           integer arithmetic
    * @return one row per group: groupCols*, n, and per quantile the bucket's
    *         lower bound `<name>_lo` (bucket index × width, capped bucket) */
  def histogramQuantiles(df: DataFrame, valueCol: String,
                         groupCols: Seq[String], bucketWidth: Long,
                         nBuckets: Int,
                         qs: Seq[(String, Long, Long)]): DataFrame = {
    require(bucketWidth > 0 && nBuckets > 0 && qs.nonEmpty)
    val gcols = groupCols.map(col)
    val bucket = least(expr(s"$valueCol div $bucketWidth"), lit(nBuckets - 1L))
    val counts = df.select((gcols :+ bucket.as("__b")): _*)
      .groupBy((gcols :+ col("__b")): _*).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("__b"))
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(gcols: _*)))
    val qCols: Seq[Column] = qs.map { case (name, num, den) =>
      // first bucket with cum >= ceil(num*N/den); exact: (num*N + den - 1) div den
      min(when(col("__cum") * den >= col("__n") * num, col("__b")))
        .multiply(bucketWidth).as(s"${name}_lo")
    }
    cum.groupBy(gcols: _*)
      .agg(max(col("__n")).as("n"), qCols: _*)
  }

  /** Sketch quantiles: [[histogramQuantiles]]'s extreme-cardinality
    * complement — when no sensible fixed bucket width exists (values spread
    * over many orders of magnitude, or resolution must adapt to the data),
    * aggregate a KLL sketch per group instead: O(k·log n/k) state, merge
    * order-independent, VALUE-resolution answers (an actual data value, not
    * a bucket lower bound). Below k values per group the answers are exact
    * order statistics (the q160/q162 regime); above, rank error ≤ ε·n
    * (KllSketchSpec pins the bound). One aggregation, no sort of the raw
    * values — the same physical shape as the histogram path.
    *
    * @param qs (name, quantile in [0,1]) pairs → one `<name>` column each */
  def sketchQuantiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
                      qs: Seq[(String, Double)], k: Int = 2048): DataFrame = {
    import graft.functions.expressions.{SketchAggregates => SK}
    require(qs.nonEmpty)
    val gcols = groupCols.map(col)
    val sk = df.groupBy(gcols: _*)
      .agg(SK.kll_sketch(col(valueCol).cast("double"), k).as("__sk"),
        count(col(valueCol)).as("n"))
    sk.select(gcols ++ (col("n") +:
      qs.map { case (name, q) => SK.kll_quantile(col("__sk"), q).as(name) }): _*)
  }

  /** n-gram diversity per group: distinct / total n-gram ratios for each
    * requested n — the standard repetitiveness / mode-collapse readout for
    * a corpus slice (low diversity ⇒ templated or duplicated text). Totals
    * come from token-count ARITHMETIC (Σ max(len−n+1, 0): no n-gram
    * explosion for the denominator); distincts from one explode +
    * count_distinct per n. All integer counts + one rounded division.
    *
    * Scale: the distinct side shuffles hashed gram tokens once per n with
    * map-side partial distinct; for sketch-sized state at extreme scale,
    * swap count_distinct for hll_sketch/kmv_sketch (q117/q128) — the exact
    * form is kept here because its oracle is exact. */
  def ngramDiversity(docs: DataFrame, textCol: String, groupCol: String,
                     ns: Seq[Int]): DataFrame = {
    import graft.functions.{SimilarityFunctions => S}
    require(ns.nonEmpty && ns.forall(_ > 0))
    val toks = docs.select(col(groupCol), S.tokens(col(textCol)).as("__t"))
    val totCols = ns.map(n =>
      sum(greatest(size(col("__t")) - (n - 1), lit(0)).cast("long"))
        .as(s"n${n}_total"))
    val totals = toks.groupBy(col(groupCol)).agg(totCols.head, totCols.tail: _*)
    val distincts = ns.map { n =>
      docs.select(col(groupCol),
          explode(S.wordShingles(col(textCol), n)).as("__g"))
        .groupBy(col(groupCol))
        .agg(count_distinct(col("__g")).as(s"n${n}_distinct"))
    }
    val joined = distincts.foldLeft(totals)((acc, d) =>
      acc.join(d, Seq(groupCol), "left"))
      .na.fill(0L, ns.map(n => s"n${n}_distinct"))
    val ratioCols = ns.flatMap { n =>
      Seq(col(s"n${n}_total"), col(s"n${n}_distinct"),
        round(when(col(s"n${n}_total") > 0,
          col(s"n${n}_distinct").cast("double") / col(s"n${n}_total").cast("double"))
          .otherwise(lit(0.0)), 6).as(s"n${n}_div_r"))
    }
    joined.select(col(groupCol) +: ratioCols: _*)
  }

  /** Key-skew diagnostics: the "will this key wreck my join/groupBy" report
    * — key cardinality, row total, hottest-key count, top-k heavy keys
    * (via the O(k)-partial bottom-k heap, no window over all keys), and the
    * GINI coefficient of the key-count distribution
    * (2·Σ i·xᵢ / (n·Σxᵢ) − (n+1)/n over ascending counts: 0 = uniform,
    * →1 = one key holds everything).
    *
    * Shape: ONE combine aggregation over the data (rows → key counts),
    * then everything runs over the KEY table. The Gini rank is a global
    * window over distinct keys — bounded by key cardinality, fine for the
    * join-key profiles this serves; for extreme-cardinality keys where even
    * the key table is too big to sort, use [[histogramQuantiles]] over the
    * counts instead (bucket-resolution Lorenz curve, no sort).
    *
    * @return ONE row: (n_keys, n_rows, max_count, gini_r,
    *         top{1..k}_key/top{1..k}_n) */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 3): DataFrame = {
    import graft.functions.expressions.{SketchAggregates => SK}
    require(topK > 0)
    val counts = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // feeds three consumers below
    val ranked = counts.withColumn("__i",
      row_number().over(Window.orderBy(col("__c"), col("__k"))).cast("long"))
    val g = ranked.agg(count(lit(1)).as("n_keys"), sum("__c").as("n_rows"),
      max("__c").as("max_count"), sum(col("__i") * col("__c")).as("__s1"))
    val top = counts.agg(SK.bottom_k_struct(
      struct((-col("__c")).as("nc"), col("__k").as("k")), topK).as("__top"))
    val gini = (lit(2.0) * col("__s1").cast("double")) /
      (col("n_keys") * col("n_rows")).cast("double") -
      (col("n_keys").cast("double") + 1.0) / col("n_keys").cast("double")
    val topCols = (0 until topK).flatMap { i =>
      val e = element_at(col("__top"), i + 1)
      Seq(e.getField("k").as(s"top${i + 1}_key"),
        (-e.getField("nc")).as(s"top${i + 1}_n"))
    }
    g.crossJoin(top).select(
      Seq(col("n_keys"), col("n_rows"), col("max_count"),
        round(gini, 6).as("gini_r")) ++ topCols: _*)
  }

  /** Merge two HLL register-state tables keyed by `keyCols` — the
    * INCREMENTAL corpus-statistics step: yesterday's stored sketch states
    * plus today's batch sketches give the union-corpus states WITHOUT
    * rescanning the old corpus, because HLL registers merge by per-index
    * max (and a merge of sketches equals the sketch of the union — the
    * mergeability contract q117/q128 build on). Keys present on only one
    * side pass through unchanged (full outer + coalesce).
    *
    * Shape: one key-hash join over BOUNDED sketch tables (one row per
    * group, 2^p ints each) — never corpus-sized. */
  def mergeHllStates(stored: DataFrame, batch: DataFrame,
                     keyCols: Seq[String], regsCol: String): DataFrame = {
    val merged = zip_with(col(s"__a.$regsCol"), col(s"__b.$regsCol"),
      (a, b) => greatest(a, b))
    stored.alias("__a").join(batch.alias("__b"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        coalesce(merged, col(s"__a.$regsCol"), col(s"__b.$regsCol"))
          .as(regsCol): _*)
  }

  /** Token-distribution divergence between two corpus slices, per group —
    * the distribution-shift monitor of a data pipeline (did this crawl
    * snapshot / source mix drift from the last one?). For each group the two
    * slices' add-one-smoothed unigram distributions over the group's union
    * vocabulary yield KL(A‖B), KL(B‖A), and the χ² statistic
    * Σ (cA−cB)²/(cA+cB).
    *
    * Shape at scale: one token-grained count aggregation (map-side combine —
    * the same contract as any word count), then a vocab-bounded join to the
    * per-group totals and ONE more aggregation per group. Nothing is
    * proportional to corpus bytes after the first combine; no window, no
    * sort. χ² is a sum of integer-numerator rationals; the KL log terms
    * round to 6 dp for replay (same convention as the NLL filters).
    *
    * @param sideCol 0/1 column assigning each doc to slice A or B
    * @return (group, v, na, nb, kl_ab, kl_ba, chi2) — v = union vocab size,
    *         na/nb = slice token totals */
  def tokenDivergence(docs: DataFrame, tokensCol: String, groupCol: String,
                      sideCol: String): DataFrame = {
    val counts = docs
      .select(col(groupCol), col(sideCol).as("__side"),
        explode(col(tokensCol)).as("__tok"))
      .groupBy(col(groupCol), col("__tok"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cb"))
    val totals = counts.groupBy(col(groupCol))
      .agg(sum("__ca").as("__na"), sum("__cb").as("__nb"),
        count(lit(1)).as("__v"))
    val pa = (col("__ca") + 1).cast("double") / (col("__na") + col("__v")).cast("double")
    val pb = (col("__cb") + 1).cast("double") / (col("__nb") + col("__v")).cast("double")
    counts.join(totals, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("__v")).as("v"), max(col("__na")).as("na"),
        max(col("__nb")).as("nb"),
        sum(pa * log(pa / pb)).as("kl_ab"),
        sum(pb * log(pb / pa)).as("kl_ba"),
        sum((col("__ca") - col("__cb")).cast("double")
          * (col("__ca") - col("__cb")).cast("double")
          / (col("__ca") + col("__cb")).cast("double")).as("chi2"))
  }

  /** Vocabulary coverage curve — the tokenizer-sizing question: how much of
    * the corpus token mass do the top-k vocabulary entries cover? Returns
    * the top `topK` tokens by frequency with their rank and CUMULATIVE
    * coverage share (count desc, token breaks ties — engine-replayable).
    *
    * Scale shape: one token-frequency aggregation (vocabulary-sized,
    * map-side partial), then `orderBy.limit(topK)` — Spark plans
    * TakeOrderedAndProject, a per-partition top-k + driver merge, NEVER a
    * global sort of the vocabulary. The cumulative window then runs over
    * the topK rows only (request-sized, the [[graft.operators.Retrieval
    * .rrfFuse]] posture), and the corpus total rides along as one broadcast
    * row. Returns (rank, token, cnt, coverage = cum/total). */
  def vocabCoverage(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    import graft.functions.{SimilarityFunctions => S}
    val freq = docs.select(explode(S.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("__tot"))
    val top = freq.orderBy(col("cnt").desc, col("token")).limit(topK)
    val w = Window.orderBy(col("cnt").desc, col("token"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("cnt"),
        (col("__cum").cast("double") / col("__tot").cast("double")).as("coverage"))
  }

  /** Token co-occurrence with PMI — collocation mining over document-level
    * token sets: pairs of DISTINCT tokens appearing together in ≥
    * `minSupport` documents, scored pmi = ln(support·N / (df_a·df_b)) > 0
    * iff the pair co-occurs more than independence predicts. Documents
    * with more than `maxTokens` distinct tokens are EXCLUDED — the
    * quadratic guard (one boilerplate mega-doc would contribute
    * maxTokens² pair rows); the exclusion is part of the contract and the
    * oracle replays it.
    *
    * Scale shape: pair enumeration self-joins the (doc, token) stream on
    * doc id — per-doc volume capped by maxTokens², the join's parallelism
    * PINNED against AQE's size-based coalesce (the q180 lesson: tiny
    * inputs, quadratic output); df/N are one aggregation each and join the
    * surviving pairs only. */
  def cooccurrencePmi(df: DataFrame, textCol: String, idCol: String,
                      minSupport: Int, maxTokens: Int = 200): DataFrame = {
    require(minSupport >= 1 && maxTokens >= 2)
    import graft.functions.{SimilarityFunctions => S}
    val toks = df.select(col(idCol).as("id"),
        array_distinct(S.tokens(col(textCol))).as("ts"))
      .filter(size(col("ts")) > 0 && size(col("ts")) <= maxTokens)
      .localCheckpoint(true) // feeds N, df, and both pair-join sides
    val n = toks.agg(count(lit(1)).as("__N"))
    val tok = toks.select(col("id"), explode(col("ts")).as("t"))
    val dfreq = tok.groupBy(col("t")).agg(count(lit(1)).as("__df"))
    val sp = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val pairs = tok.select(col("id"), col("t").as("token_a"))
      .repartition(sp, col("id"))
      .join(tok.select(col("id"), col("t").as("token_b"))
        .repartition(sp, col("id")), Seq("id"))
      .filter(col("token_a") < col("token_b"))
      .groupBy(col("token_a"), col("token_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(dfreq.select(col("t").as("token_a"), col("__df").as("df_a")), Seq("token_a"))
      .join(dfreq.select(col("t").as("token_b"), col("__df").as("df_b")), Seq("token_b"))
      .crossJoin(broadcast(n))
      .select(col("token_a"), col("token_b"), col("support"),
        col("df_a"), col("df_b"),
        round(log((col("support") * col("__N")).cast("double") /
          (col("df_a") * col("df_b")).cast("double")), 6).as("pmi"))
  }
}
