package graft.operators

import graft.functions.{SimilarityFunctions => S}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval + corpus-trained classification — the remaining two
  * text-side primitives a training-data pipeline runs at corpus scale:
  * BM25 keyword search (mining task-relevant documents out of a crawl) and
  * a multinomial Naive Bayes classifier (the classic CCNet/fastText-style
  * "looks like the reference corpus" quality/language filter, trained and
  * applied without leaving the cluster). The reference ETL has no analog;
  * these join the LLM-pipeline pack beside TF-IDF and the NLL scorers.
  *
  * Both are engine-independent arithmetic over exact token counts, so both
  * are fully DuckDB-oracle-checkable (no RNG, no float accumulation beyond
  * the per-document sums the NLL family already relies on).
  */
object Retrieval {

  /** Okapi BM25 top-k document retrieval for a (small) set of keyword
    * queries.
    *
    * score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
    *                          (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    * with the Lucene-style always-positive idf(t) = ln(1 + (N − df + 0.5) /
    * (df + 0.5)); dl = whitespace token count, avgdl over ALL documents
    * (token-less ones included). Query terms are deduplicated (qtf = 1).
    *
    * Scale shape: the query set is request-sized, so its term list is
    * BROADCAST and the corpus token stream is semi-joined down to matching
    * terms immediately after the explode — tf/df aggregations then run over
    * the matched slice only, never the full vocabulary. N and avgdl ride
    * along as one broadcast row (no driver scalar); the final top-k is a
    * per-query window over candidate documents (queries × matching docs,
    * already filtered). Ranking ties break on rounded score then doc id, so
    * the result is engine-independent. */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queries: Seq[(String, String)], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "at least one query required")
    val qterms = queryTerms(docs.sparkSession, queries)
    val (tf, lens) = oneShotTf(docs, textCol, idCol, qterms)
    scoreBm25(qterms, tf, lens, idCol, k, k1, b)
  }

  /** One-shot candidate generation shared by [[bm25TopK]] and
    * [[hardNegatives]]: semi-join BEFORE the tf aggregation, so only the
    * query-matched token slice ever aggregates/shuffles (the 100× contract
    * PlanSpec + BASELINE pin); the index path instead pays the full-vocab
    * aggregation ONCE at build time and filters thereafter. ONE
    * implementation so tokenization and the semi-join shape cannot drift
    * between the q105/q170 and q182 paths. */
  private def oneShotTf(docs: DataFrame, textCol: String, idCol: String,
                        qterms: DataFrame): (DataFrame, DataFrame) = {
    val lens = docs.select(col(idCol),
      size(S.tokens(col(textCol))).cast("long").as("__dl"))
    val matched = docs
      .select(col(idCol), explode(S.tokens(col(textCol))).as("token"))
      .join(broadcast(qterms.select(col("token")).distinct()), Seq("token"), "left_semi")
    val tf = matched.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("__tf"))
    (tf, lens)
  }

  /** Persisted BM25 INDEX: ONE text scan producing the two frames sparse
    * retrieval needs — postings (token, id, tf) and document lengths
    * (id, dl). Both are APPEND-ONLY under corpus growth: term frequency is
    * doc-local, and every corpus-level statistic (df, N, avgdl) is priced
    * at SEARCH time from the index, so a daily batch appends via
    * [[bm25Append]] without touching or re-scoring a single stored row —
    * the sparse twin of [[Ann.ivfPqIndex]]/`ivfPqAppend`, and unlike the
    * dense path there is no model to go stale. Write both frames
    * (postings bucketed by token so a query's semi-join prunes files) and
    * the raw text never needs to be read again. */
  def bm25Index(docs: DataFrame, textCol: String,
                idCol: String): (DataFrame, DataFrame) = {
    val lens = docs.select(col(idCol),
      size(S.tokens(col(textCol))).cast("long").as("__dl"))
    val postings = docs
      .select(col(idCol), explode(S.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("__tf"))
    (postings, lens)
  }

  /** Append a batch to a persisted BM25 index: tokenize the BATCH only and
    * union — stored postings are untouched (tf is doc-local; df/N/avgdl are
    * search-time aggregates). Id uniqueness is the caller's, as in
    * [[Ann.ivfPqAppend]]. */
  def bm25Append(postings: DataFrame, lens: DataFrame, batch: DataFrame,
                 textCol: String, idCol: String): (DataFrame, DataFrame) = {
    val (bp, bl) = bm25Index(batch, textCol, idCol)
    (postings.unionByName(bp), lens.unionByName(bl))
  }

  /** BM25 over a persisted index: the query terms broadcast-semi-join the
    * postings down to matching terms (never the vocabulary — map-side, no
    * postings shuffle), df comes from the matched slice, N/avgdl from one
    * narrow aggregate over the length frame. The scoring tail is shared
    * with [[bm25TopK]] (q105 pins the one-shot path, q170 pins
    * build+append+search against the same oracle). */
  def bm25Search(postings: DataFrame, lens: DataFrame, idCol: String,
                 queries: Seq[(String, String)], k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "at least one query required")
    val qterms = queryTerms(postings.sparkSession, queries)
    val tf = postings
      .join(broadcast(qterms.select(col("token")).distinct()), Seq("token"), "left_semi")
      .select(col(idCol), col("token"), col("__tf"))
    scoreBm25(qterms, tf, lens, idCol, k, k1, b)
  }

  /** (query_id, token) term frame — query terms lowercased, deduplicated. */
  private def queryTerms(spark: org.apache.spark.sql.SparkSession,
                         queries: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    queries
      .flatMap { case (qid, q) =>
        q.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
          .map(t => (qid, t))
      }
      .toDF("query_id", "token")
  }

  /** Shared BM25 scoring tail over a (idCol, token, __tf) frame — ONE
    * implementation behind both [[bm25TopK]] and [[bm25Search]], so the
    * arithmetic the q105 oracle pins bit-for-bit cannot drift between the
    * one-shot and persisted-index paths. */
  private def scoreBm25(qterms: DataFrame, tf: DataFrame, lens: DataFrame,
                        idCol: String, k: Int, k1: Double, b: Double): DataFrame =
    rankTopK(scoredBm25(qterms, tf, lens, idCol, k1, b), idCol, k)

  /** Pre-rank BM25 scores: every (query, candidate) pair with its rounded
    * score — the shared arithmetic behind [[scoreBm25]] and
    * [[hardNegatives]] (one implementation, so the q105-pinned formula
    * cannot drift between consumers). */
  private def scoredBm25(qterms: DataFrame, tf: DataFrame, lens: DataFrame,
                         idCol: String, k1: Double, b: Double): DataFrame = {
    val stats = lens.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
    val contrib = broadcast(qterms)
      .join(tf, Seq("token"))
      .join(dfreq, Seq("token"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__idf", log(lit(1.0) +
        (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
      .withColumn("__c", col("__idf") * col("__tf") * lit(k1 + 1.0) /
        (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
    contrib.groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("__c")), 6).as("score_r"))
  }

  /** Deterministic (score desc, id) per-query top-k over a scored frame. */
  private def rankTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_r").desc, col(idCol))).cast("long"))
      .filter(col("rank") <= k)

  /** Hard-negative mining for retrieval-model training (the DPR /
    * sentence-transformers recipe): for each query, the top-k BM25-scored
    * documents that are NOT known positives — lexically close enough to
    * confuse a dense model, labeled negative. Positives are excluded
    * BEFORE ranking, so returned ranks are dense 1..k over negatives only
    * (dropping them after would leave holes and short lists).
    *
    * Scale shape: identical to [[bm25TopK]] — the corpus token stream is
    * semi-joined to query terms immediately after the explode, and the
    * `positives` frame (query_id, idCol; request-sized: queries × a few
    * gold ids) broadcasts into an anti-join over the already query-bounded
    * candidate set. Nothing new shuffles at corpus scale. */
  def hardNegatives(docs: DataFrame, textCol: String, idCol: String,
                    queries: Seq[(String, String)], positives: DataFrame,
                    k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "at least one query required")
    val qterms = queryTerms(docs.sparkSession, queries)
    val (tf, lens) = oneShotTf(docs, textCol, idCol, qterms)
    val negatives = scoredBm25(qterms, tf, lens, idCol, k1, b)
      .join(broadcast(positives.select(col("query_id"), col(idCol))),
        Seq("query_id", idCol), "left_anti")
    rankTopK(negatives, idCol, k)
  }

  /** Reciprocal-Rank Fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of N
    * per-query rank lists: rrf(q, d) = Σ_{legs containing d} 1/(c + rankᵢ),
    * the standard score-free hybrid-retrieval combiner (sparse BM25 + dense
    * ANN being the canonical pair). A doc absent from a leg simply
    * contributes nothing — no outer-join nulls, no score normalization.
    *
    * Scale shape: each leg is already top-k-per-query (request-sized ×
    * k rows), so the union + groupBy + per-query window all run over
    * bounded, tiny frames regardless of corpus size — the heavy lifting
    * happened inside the legs. Scores round to 9 dp before ranking so the
    * (rrf desc, id) order is engine-independent; with each (query, id)
    * appearing in ≤ 2 legs the two-term IEEE sum is order-exact, and for
    * more legs the 9-dp round absorbs associativity noise (1/(c+r) terms
    * are ≥ 1e-4 apart at c = 60, k ≤ 1000).
    *
    * @param legs each with (queryIdCol, idCol, rankCol); rank is 1-based
    * @param k    fused list depth per query
    * @param c    RRF damping constant (60 in the original paper) */
  def rrfFuse(legs: Seq[DataFrame], queryIdCol: String, idCol: String,
              rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(legs.nonEmpty, "at least one ranking leg required")
    val unioned = legs
      .map(_.select(col(queryIdCol), col(idCol), col(rankCol).cast("long").as("__r")))
      .reduce(_ unionByName _)
    unioned.groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(lit(1.0) / (lit(c.toDouble) + col("__r"))), 9).as("rrf_r"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol))
          .orderBy(col("rrf_r").desc, col(idCol))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Multinomial Naive Bayes with add-one smoothing, trained on the rows
    * matching `trainPred` and applied to the rest — the classic corpus
    * quality/language classifier (label by `labelCol` on the train side;
    * the held-out side keeps its label for evaluation).
    *
    * score(d, c) = ln p(c) + Σ_{token occurrences t ∈ d}
    *               ln ((cnt(c,t) + 1) / (tot(c) + V))
    * where V = train vocabulary size; tokens unseen in class c (or in the
    * whole train set) get the same smoothed (0+1) mass. Prediction = argmax
    * class, ties broken by class name — engine-independent. Token-less
    * held-out documents emit no row (nothing to score), same contract as
    * [[Tfidf.unigramNll]].
    *
    * Scale shape: the model IS a pair of bounded tables — (class, token)
    * counts (vocabulary × classes) and per-class priors (classes) — built by
    * two hash aggregations over the train slice. Scoring explodes held-out
    * tokens once, fans them across the (bounded, broadcast) class list, and
    * left-joins the count table with strategy left to AQE: a web-scale
    * vocabulary side can exceed the broadcast limit, and a forced hint would
    * OOM the driver instead of (correctly) shuffling, same reasoning as
    * [[Tfidf]]. One per-(doc, class) aggregation and a classes-sized window
    * pick the argmax. */
  def naiveBayes(docs: DataFrame, textCol: String, idCol: String,
                 labelCol: String,
                 trainPred: org.apache.spark.sql.Column): DataFrame = {
    val train = docs.filter(trainPred)
    val trainTerms = train.select(col(labelCol).as("__cls"),
      explode(S.tokens(col(textCol))).as("token"))
    val priors = train.groupBy(col(labelCol).as("__cls"))
      .agg(count(lit(1)).as("__nd"))
    val nTrain = priors.agg(sum(col("__nd")).as("__ntot"))
    val cnts = trainTerms.groupBy(col("__cls"), col("token"))
      .agg(count(lit(1)).as("__cnt"))
    val classTot = cnts.groupBy(col("__cls")).agg(sum(col("__cnt")).as("__tot"))
    val vocab = trainTerms.agg(countDistinct(col("token")).as("__v"))
    val classes = priors.join(classTot, Seq("__cls"), "left")
      .na.fill(0L, Seq("__tot"))
      .crossJoin(broadcast(nTrain))
      .crossJoin(broadcast(vocab))
      .select(col("__cls"), col("__tot"), col("__v"),
        log(col("__nd").cast("double") / col("__ntot").cast("double")).as("__lnprior"))
    val testTerms = docs.filter(!trainPred)
      .select(col(idCol), col(labelCol), explode(S.tokens(col(textCol))).as("token"))
    testTerms
      .crossJoin(broadcast(classes))
      .join(cnts, Seq("__cls", "token"), "left")
      .na.fill(0L, Seq("__cnt"))
      .groupBy(col(idCol), col(labelCol), col("__cls"))
      .agg((first(col("__lnprior")) +
        sum(log((col("__cnt").cast("double") + 1.0) /
          (col("__tot").cast("double") + col("__v").cast("double"))))).as("__score"))
      .withColumn("score_r", round(col("__score"), 6))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score_r").desc, col("__cls"))))
      .filter(col("__rk") === 1)
      .select(col(idCol), col(labelCol), col("__cls").as("pred"), col("score_r"))
  }

  /** DETERMINISTIC distributed logistic regression — the TRAINABLE quality
    * classifier next to [[naiveBayes]] (fixed generative model): fit a
    * linear decision boundary over integer document features (lengths,
    * counts, scores) by batch gradient descent, with every source of
    * parallel nondeterminism designed out so the entire FIT — not just the
    * scoring — replays bit-for-bit in a SQL oracle (q165):
    *
    *  - the sigmoid is the RATIONAL fast-sigmoid σ̃(z) = 1/2 + (z/2)/(1+|z|)
    *    — only +,−,×,÷ which IEEE754 rounds correctly, so any engine
    *    computes the identical double (exp() differs in ulps across libms);
    *  - the gradient is Σᵢ ⌊(yᵢ − σ̃(zᵢ))·xᵢⱼ·scale⌋ — each row's term is
    *    FLOORED TO A LONG before the sum, and integer addition commutes, so
    *    the aggregate is exact under any partitioning (the PageRank
    *    fixed-point trick applied to ML training);
    *  - zᵢ and the weight updates are fixed-order left-associated double
    *    arithmetic over driver-held weights (k×m scalars, the kmeansFit
    *    cutover shape) — order written once, replayed verbatim.
    *
    * Per iteration: ONE scan + ONE bounded aggregation (m+1 longs); nothing
    * else shuffles. At 100 TB that is the textbook distributed-LR shape —
    * partials merge map-side and the driver folds m+1 numbers.
    *
    * @param features INTEGER-typed feature columns (cast upstream); a bias
    *                 term is prepended internally
    * @return (weights incl. bias at index 0, predictions frame with
    *         (idCol, labelCol, z, p, pred)) */
  def logisticFit(df: DataFrame, features: Seq[String], idCol: String,
                  labelCol: String, iters: Int, lrNum: Long, lrDen: Long,
                  scale: Long = 1000000L): (Array[Double], DataFrame) = {
    require(features.nonEmpty && iters >= 0 && lrNum > 0 && lrDen > 0 && scale > 0)
    val m = features.length + 1
    val n = df.count()
    require(n > 0, "empty training frame")
    val y = col(labelCol).cast("double")
    def zOf(w: Array[Double]): Column =
      features.zipWithIndex.foldLeft(lit(w(0))) { case (acc, (f, j)) =>
        acc + lit(w(j + 1)) * col(f).cast("double")
      }
    def sigmoid(z: Column): Column =
      lit(0.5) + (z / lit(2.0)) / (lit(1.0) + abs(z))
    val w = Array.fill(m)(0.0)
    for (_ <- 1 to iters) {
      val err = y - sigmoid(zOf(w))
      val gAggs = (lit(1.0) +: features.map(col(_).cast("double"))).zipWithIndex
        .map { case (x, j) => sum(floor(err * x * lit(scale.toDouble))).as(s"g$j") }
      val g = df.agg(gAggs.head, gAggs.tail: _*).head()
      var j = 0
      while (j < m) {
        // left-associated exactly as the oracle writes it:
        // w + (lrNum·g) / ((lrDen·scale)·n)
        w(j) = w(j) + (lrNum * g.getLong(j)).toDouble /
          (lrDen.toDouble * scale.toDouble * n.toDouble)
        j += 1
      }
    }
    val z = zOf(w)
    val preds = df.select(col(idCol), col(labelCol),
      round(z, 6).as("z_r"), round(sigmoid(z), 6).as("p_r"),
      (sigmoid(z) >= 0.5).as("pred"))
    (w, preds)
  }

  /** Hashed bag-of-words features: (id, feature, cnt) with feature =
    * md5-bucket of the token mod `numFeatures` (the fastText/Vowpal-Wabbit
    * hashing trick — no vocabulary pass, collisions fold rare tokens
    * together). md5 rather than xxhash so the bucket assignment replays in
    * the SQL oracle; any hash serves the trick itself. One explode + one
    * (id, feature) count aggregation, map-side combinable. */
  def hashedTokenFeatures(docs: DataFrame, textCol: String, idCol: String,
                          numFeatures: Int): DataFrame = {
    require(numFeatures > 0, s"numFeatures must be positive: $numFeatures")
    docs.select(col(idCol), explode(S.tokens(col(textCol))).as("__tok"))
      .select(col(idCol), pmod(
        conv(substring(md5(col("__tok")), 1, 15), 16, 10).cast("long"),
        lit(numFeatures.toLong)).as("feature"))
      .groupBy(col(idCol), col("feature"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Deterministic distributed SPARSE logistic regression — [[logisticFit]]
    * for the regime where the MODEL no longer fits on the driver: weights
    * live in a DataFrame (feature → weight), updated by joins, never
    * collected. With hashed text features ([[hashedTokenFeatures]]) at
    * 2³⁰ buckets — or raw token-id features with a billion-type vocabulary —
    * the same plan fits; q165's dense path folds m+1 longs on the driver and
    * caps m at driver memory.
    *
    * Determinism adds ONE trick to q165's three (rational sigmoid, floored
    * integer gradient terms, fixed-order scalar updates): weights are
    * QUANTIZED to longs (wq = w·wScale), so the per-document margin
    * z = (Σ_f wq(f)·cnt + wq(bias)) / wScale is an exact integer sum under
    * any partitioning — the one place the dense path relied on driver-held
    * doubles. Each weight update is scalar IEEE arithmetic per feature row:
    *   wq += ⌊(lrNum·g(f) as double)·wScale / (lrDen·scale·n)⌋
    * — every op individually correctly rounded, so any engine agrees
    * bit-for-bit; the SQL oracle unrolls iterations as CTEs over the same
    * count tables (q174).
    *
    * Per iteration: one feats⨝weights join (feature-keyed), one per-doc
    * integer-sum aggregation, one labels join, one per-feature gradient
    * aggregation (both map-side partial), one weights⨝gradient join — all
    * bounded by |feats| rows; the weights frame is localCheckpoint'd per
    * iteration so lineage stays flat over any iteration count. The bias is
    * feature −1 with cnt 1 on every labeled row. Gradient-term flooring
    * biases each term down by <1/scale — the q165 price of exactness.
    *
    * @param feats  (idCol, feature: long, cnt: long) sparse rows — build
    *               with [[hashedTokenFeatures]] or supply any integer
    *               feature stream; ids without rows get bias-only scores
    * @param labels (idCol, labelCol) with 0/1 labels, one row per id
    * @return (weights (feature, wq, w), preds (idCol, label, z_r, p_r, pred)) */
  def logisticFitSparse(feats: DataFrame, labels: DataFrame, idCol: String,
                        labelCol: String, iters: Int, lrNum: Long, lrDen: Long,
                        scale: Long = 1000000L, wScale: Long = 1000000L):
      (DataFrame, DataFrame) = {
    require(iters >= 0 && lrNum > 0 && lrDen > 0 && scale > 0 && wScale > 0)
    val spark = feats.sparkSession
    val n = labels.count()
    require(n > 0, "empty label frame")
    // Materialized EAGERLY, for two reasons: (1) the feature stream is
    // probed 2× per iteration (margin join + gradient join) — recomputing
    // tokenize/hash/count every probe would dominate the fit; (2) guards a
    // measured Spark 4.1.2 wrong-result: with the union's arms sharing a
    // repartitioned parquet lineage, the later gradient self-join
    // (allFeats ⨝ err-derived-from-allFeats) returned every row TWICE
    // (plan-reuse canonicalization — reproduced only with parquet source +
    // RepartitionByExpression upstream; the invariance spec pins the fix).
    val allFeats = withBias(feats, labels, idCol).localCheckpoint(true)
    import spark.implicits._
    var w: DataFrame = Seq.empty[(Long, Long)].toDF("feature", "wq")
    for (_ <- 1 to iters)
      w = sparseGdStep(allFeats, labels, w, idCol, labelCol, n,
        lrNum, lrDen, scale, wScale).localCheckpoint(true)
    val z = sparseMargin(allFeats, w, idCol, wScale)
    val preds = z
      .join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
      .select(col(idCol), col(labelCol),
        round(col("z"), 6).as("z_r"),
        round(fastSigmoid(col("z")), 6).as("p_r"),
        (fastSigmoid(col("z")) >= 0.5).as("pred"))
    (w.select(col("feature"), col("wq"),
      (col("wq").cast("double") / lit(wScale.toDouble)).as("w")), preds)
  }

  /** The rational fast-sigmoid σ̃(z) = 1/2 + (z/2)/(1+|z|) — only
    * correctly-rounded IEEE ops, the engine-independence contract of the
    * logistic family (no libm exp in any fit or score path). */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + (z / lit(2.0)) / (lit(1.0) + abs(z))

  /** Per-id margin z = (Σ wq(f)·cnt) / wScale over a sparse feature frame —
    * an exact integer sum however the data is partitioned. */
  private def sparseMargin(allFeats: DataFrame, w: DataFrame, idCol: String,
                           wScale: Long): DataFrame =
    allFeats.join(w, Seq("feature"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("wq"), lit(0L)) * col("cnt")).as("__znum"))
      .select(col(idCol), (col("__znum").cast("double") / lit(wScale.toDouble)).as("z"))

  /** ONE deterministic batch-GD step over sparse features: weights in,
    * weights out — the unit [[logisticFitSparse]] iterates offline and the
    * streaming online fit applies once per micro-batch (mini-batch SGD).
    * The weight merge is a FULL OUTER join: offline the gradient side
    * always covers the weight side (same rows every step) so it degenerates
    * to the left join, but ONLINE a stored weight whose feature is absent
    * from today's batch must survive untouched, not vanish.
    * `allFeats` must carry the bias rows (feature −1, cnt 1 per labeled id)
    * and should be materialized (it is probed twice). */
  def sparseGdStep(allFeats: DataFrame, labels: DataFrame, w: DataFrame,
                   idCol: String, labelCol: String, n: Long,
                   lrNum: Long, lrDen: Long, scale: Long = 1000000L,
                   wScale: Long = 1000000L): DataFrame = {
    require(n > 0 && lrNum > 0 && lrDen > 0 && scale > 0 && wScale > 0)
    val err = sparseMargin(allFeats, w, idCol, wScale)
      .join(labels.select(col(idCol), col(labelCol).cast("double").as("__y")), Seq(idCol))
      .select(col(idCol), (col("__y") - fastSigmoid(col("z"))).as("__e"))
    val g = allFeats.join(err, Seq(idCol))
      .groupBy(col("feature"))
      .agg(sum(floor(col("__e") * col("cnt").cast("double") *
        lit(scale.toDouble))).as("__g"))
    g.join(w, Seq("feature"), "full_outer")
      .select(col("feature"),
        (coalesce(col("wq"), lit(0L)) +
          when(col("__g").isNull, lit(0L)).otherwise(
            // multiply in DOUBLE: a long product lrNum·__g could overflow
            // (ANSI: throw) on a pathologically hot feature bucket at full
            // corpus scale — double-first is value-identical whenever the
            // product fits 2^53 (everything the oracle or any sane batch
            // reaches; the cast to double happened next anyway)
            floor(lit(lrNum.toDouble) * col("__g").cast("double") * lit(wScale.toDouble) /
              (lit(lrDen.toDouble) * lit(scale.toDouble) * lit(n.toDouble)))
              .cast("long"))).as("wq"))
  }

  /** Bias-augmented sparse feature frame for the logistic family: the
    * caller's (id, feature, cnt) rows plus (id, −1, 1) per labeled id. */
  def withBias(feats: DataFrame, labels: DataFrame, idCol: String): DataFrame =
    feats.select(col(idCol), col("feature").cast("long").as("feature"),
        col("cnt").cast("long").as("cnt"))
      .unionByName(labels.select(col(idCol), lit(-1L).as("feature"), lit(1L).as("cnt")))

  /** Per-class precision / recall / F1 over (label, pred) pairs — the
    * model-quality readout every classifier-driven curation step (langid
    * routing, NB filtering) needs next to it. Exact integer confusion
    * counts; ratios computed once, unrounded, then rounded at 6 dp — so a
    * SQL replay is bit-equal.
    *
    * Scale: ONE count aggregation over the scored rows (map-side combine),
    * then everything operates on the class×class matrix — bounded however
    * large the corpus.
    *
    * @return (cls, support, predicted, tp, precision_r, recall_r, f1_r),
    *         one row per class appearing as label OR prediction. */
  def classifierEval(scored: DataFrame, labelCol: String, predCol: String): DataFrame = {
    // materialize the class×class matrix ONCE: classes/lt/pt/tp all derive
    // from it, and without the barrier each re-runs the full scored scan
    // (the prediction expression is typically the expensive part — measured
    // ~3× the single-scan cost on the langid query)
    val cm = scored
      .groupBy(col(labelCol).as("cls"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val classes = cm.select(col("cls"))
      .unionByName(cm.select(col("pred").as("cls"))).distinct()
    val lt = cm.groupBy(col("cls")).agg(sum("n").as("support"))
    val pt = cm.groupBy(col("pred").as("cls")).agg(sum("n").as("predicted"))
    val tp = cm.filter(col("cls") === col("pred")).select(col("cls"), col("n").as("tp"))
    val base = classes
      .join(lt, Seq("cls"), "left").join(pt, Seq("cls"), "left").join(tp, Seq("cls"), "left")
      .na.fill(0L, Seq("support", "predicted", "tp"))
    val p = when(col("predicted") > 0,
      col("tp").cast("double") / col("predicted").cast("double")).otherwise(lit(0.0))
    val r = when(col("support") > 0,
      col("tp").cast("double") / col("support").cast("double")).otherwise(lit(0.0))
    val f1 = when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(lit(0.0))
    base.select(col("cls"), col("support"), col("predicted"), col("tp"),
      round(p, 6).as("precision_r"), round(r, 6).as("recall_r"),
      round(f1, 6).as("f1_r"))
  }
}
