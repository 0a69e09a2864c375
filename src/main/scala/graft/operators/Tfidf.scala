package graft.operators

import graft.functions.{SimilarityFunctions => S}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF over a document corpus — term weighting for keyword extraction,
  * search, and near-dup feature vectors.
  *
  * Scale shape: one explode + two hash aggregations (term frequency per doc,
  * document frequency per token) and one join on token. The join strategy is
  * LEFT TO CATALYST/AQE: the document-frequency side is vocabulary-sized and
  * usually broadcasts on its own statistics, but a web-scale shingle
  * vocabulary can exceed the broadcast limit — an unconditional hint would
  * turn that into a driver OOM instead of a (correct) shuffle join. */
object Tfidf {

  /** (doc, token, tf, df, tfidf) for every distinct (doc, token) pair.
    * tf = occurrences of token in doc; df = docs containing token;
    * tfidf = tf × ln(N / df). */
  def tfidf(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val n = docs.count()
    val terms = docs.select(col(idCol), explode(S.tokens(col(textCol))).as("token"))
    val tf = terms.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("token"))
      .withColumn("tfidf", col("tf") * log(lit(n.toDouble) / col("df")))
  }

  /** Per-document unigram negative log-likelihood — the CCNet-style
    * perplexity-proxy quality signal with the corpus as its own LM: p(tok) =
    * corpus count / corpus total, score = mean over the doc's tokens of
    * −ln p(tok). Low = in-distribution/common text, high = rare-token noise.
    * Scale shape: one explode + one vocabulary aggregation + one token join
    * (strategy left to AQE, same reasoning as [[tfidf]]) + one per-doc
    * aggregation; the corpus total rides along as a broadcast single row,
    * never a driver scalar. Token-less docs emit no row (there is nothing to
    * score) — left-join and fill if presence is needed. */
  def unigramNll(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val terms = docs.select(col(idCol), explode(S.tokens(col(textCol))).as("token"))
    val counts = terms.groupBy(col("token")).agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum(col("__c")).as("__total"))
    terms.join(counts, Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        avg(-log(col("__c").cast("double") / col("__total").cast("double"))).as("nll"))
  }

  /** Per-document BIGRAM conditional NLL with add-one smoothing — the
    * sharper perplexity proxy ([[unigramNll]]'s big sibling): score = mean
    * over the doc's bigrams of −ln p(w₂|w₁), p(w₂|w₁) = (c(w₁w₂)+1) /
    * (c(w₁)+V) where V = unigram vocabulary size. Smoothing keeps unseen
    * continuations finite, so the filter generalizes beyond the corpus that
    * trained it. Same scale shape as [[unigramNll]] plus one more
    * vocabulary-sized aggregation and join; docs with <2 tokens emit no row
    * (the kernel returns the empty array below 2 tokens; single-token docs
    * still widen the vocabulary V via the separate token stream).
    * V rides along as a broadcast single row. */
  def bigramNll(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // Bigram stream = ONE codegen'd kernel pass emitting 8-byte
    // (w1-hash, bigram-hash) pairs (Kernels.bigramHashes): the zip_with HOF
    // it replaces evaluated INTERPRETED once per downstream use (three
    // times — both model aggregations + the probe join; the q107 disease)
    // and shuffled string pairs. Hash-keyed counts collide at ~vocab²/2⁶⁴
    // (immaterial for a quality signal; collision-free at oracle scale).
    // V stays an exact distinct count over token STRINGS.
    import graft.functions.expressions.HashExpressions.bigram_hashes
    val bigrams = docs.select(col(idCol),
        explode(bigram_hashes(col(textCol))).as("bg"))
      .select(col(idCol), col("bg.w1h").as("w1h"), col("bg.bgh").as("bgh"))
    val uni = bigrams.groupBy(col("w1h")).agg(count(lit(1)).as("__c1"))
    val vocab = docs.select(explode(S.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("__v"))
    val bi = bigrams.groupBy(col("bgh")).agg(count(lit(1)).as("__c2"))
    bigrams.join(bi, Seq("bgh")).join(uni, Seq("w1h"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(-log((col("__c2").cast("double") + 1.0) /
          (col("__c1").cast("double") + col("__v").cast("double")))).as("nll"))
  }

  /** Per-document interpolated Kneser-Ney bigram NLL/perplexity — the real
    * smoothing behind CCNet-style LM quality filtering ([[bigramNll]]'s
    * add-one is a placeholder next to it; KN's continuation distribution is
    * what separates "rare but well-formed" from "out-of-distribution").
    * TRAIN and SCORE corpora are separate arguments (self-scoring = pass the
    * same frame twice), so the filter generalizes: every unseen-event branch
    * is defined and exercised.
    *
    * Model (absolute discount D ∈ (0,1), default 0.75):
    *   c2(w1,w2)   bigram count          c1(w1) = Σ_w2 c2   (left totals)
    *   nf(w1)      distinct continuations of w1
    *   nl(w2)      distinct left contexts of w2
    *   T           distinct bigram types    V = distinct train tokens
    *   p_cont(w2)  = (nl(w2)+1) / (T+V+1)   — add-one over continuation
    *                 types keeps unseen w2 finite (mass held out for OOV)
    *   p(w2|w1)    = max(c2−D,0)/c1 + (D·nf(w1)/c1)·p_cont(w2)   if c1>0
    *               = p_cont(w2)                                   otherwise
    * score = mean over the doc's bigrams of −ln p; ppl = e^score.
    *
    * Scale shape: one codegen'd kernel pass per document emits 8-byte
    * (w1, w2, bigram) hash triples ([[graft.functions.expressions.Kernels
    * .knBigramHashes]]); the model is THREE vocabulary-sized hash
    * aggregations derived from one bigram-type table (all map-side partial),
    * scoring is three token-keyed joins left to AQE (broadcast when the
    * vocabulary allows, shuffle when web-scale — the [[tfidf]] reasoning),
    * and (T, V) ride along as one broadcast row. Nothing is ever collected:
    * the LM itself is a DataFrame, so a 100 TB train corpus with a
    * billion-type vocabulary fits the same plan. Hash-keyed counts collide
    * at ~vocab²/2⁶⁴ (immaterial for a quality signal; collision-free at
    * oracle scale — the oracle groups gram STRINGS). Docs with <2 tokens
    * emit no row. Returns (id [, groupCols], n_bigrams, nll, ppl).
    *
    * `groupCols` fits ONE INDEPENDENT LM PER GROUP in the same plan — the
    * CCNet shape (a model per language): every model aggregation and
    * scoring join simply adds the group columns to its key, so a hundred
    * languages cost one pass, not a hundred plan branches; (T, V) become a
    * groups-sized broadcast table instead of one row. Score rows join to
    * their own group's model only — a doc whose group never appeared in
    * train scores against empty counts → every bigram takes the pure
    * smoothing floor p = 1, i.e. nll 0 / ppl 1.0. CAUTION for consumers:
    * that is the BEST possible score, so a keep-low-perplexity filter fed
    * groups absent from train would keep fully unmodeled text wholesale —
    * guard by semi-joining score groups to train groups first (the
    * self-trained [[perplexityBuckets]] cannot hit this; [[mooreLewisScore]]
    * rejects empty train sides outright). */
  def knBigramPpl(train: DataFrame, score: DataFrame, textCol: String,
                  idCol: String, discount: Double = 0.75,
                  groupCols: Seq[String] = Nil): DataFrame = {
    import graft.functions.expressions.HashExpressions.kn_bigram_hashes
    val g = groupCols.map(col)
    val scoredBg = score
      .select(col(idCol) +: g :+ explode(kn_bigram_hashes(col(textCol))).as("bg"): _*)
      .select((col(idCol) +: g) ++ Seq(col("bg.w1h").as("w1h"),
        col("bg.w2h").as("w2h"), col("bg.bgh").as("bgh")): _*)
    knBigramPplOnHashes(train, scoredBg, textCol, idCol, discount, groupCols)
  }

  /** [[knBigramPpl]] with the SCORE side already reduced to hashed bigram
    * rows (idCol [, groupCols], w1h, w2h, bgh) — the shared formula behind
    * both the public operator and [[mooreLewisScore]], which tags each pool
    * bigram with both LM labels AFTER one kernel pass instead of running
    * the tokenize+hash kernel once per label. */
  private[operators] def knBigramPplOnHashes(
      train: DataFrame, scoredBg: DataFrame, textCol: String, idCol: String,
      discount: Double, groupCols: Seq[String]): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount must be in (0,1): $discount")
    import graft.functions.expressions.HashExpressions.kn_bigram_hashes
    val g = groupCols.map(col)
    def bigrams(d: DataFrame, extra: Column*): DataFrame =
      d.select(extra ++ g :+ explode(kn_bigram_hashes(col(textCol))).as("bg"): _*)
        .select(extra ++ g ++ Seq(col("bg.w1h").as("w1h"), col("bg.w2h").as("w2h"),
          col("bg.bgh").as("bgh")): _*)
    val bi = bigrams(train).groupBy(g ++ Seq(col("w1h"), col("w2h"), col("bgh")): _*)
      .agg(count(lit(1)).as("__c2"))
    val left = bi.groupBy(g :+ col("w1h"): _*)
      .agg(sum(col("__c2")).as("__c1"), count(lit(1)).as("__nf"))
    val cont = bi.groupBy(g :+ col("w2h"): _*).agg(count(lit(1)).as("__nl"))
    val vocab = train.select(g :+ explode(S.tokens(col(textCol))).as("t"): _*)
      .groupBy(g: _*).agg(countDistinct(col("t")).as("__v"))
    val types = bi.groupBy(g: _*).agg(count(lit(1)).as("__t"))
    val totals =
      if (groupCols.isEmpty) types.crossJoin(vocab)
      else types.join(vocab, groupCols)
    // __t/__v coalesce: a score group absent from train has no totals row —
    // p_cont degenerates to (nl+1)/(0+0+1) = 1, the pure-smoothing floor
    val pCont = (coalesce(col("__nl"), lit(0L)).cast("double") + 1.0) /
      (coalesce(col("__t"), lit(0L)).cast("double") +
        coalesce(col("__v"), lit(0L)).cast("double") + 1.0)
    val p = when(col("__c1").isNotNull,
        greatest(coalesce(col("__c2"), lit(0L)).cast("double") - discount, lit(0.0)) /
          col("__c1").cast("double") +
          lit(discount) * col("__nf").cast("double") / col("__c1").cast("double") * pCont)
      .otherwise(pCont)
    val scored = scoredBg
      .join(bi.select(g ++ Seq(col("bgh"), col("__c2")): _*),
        groupCols :+ "bgh", "left")
      .join(left, groupCols :+ "w1h", "left")
      .join(cont, groupCols :+ "w2h", "left")
    val withTotals =
      if (groupCols.isEmpty) scored.crossJoin(broadcast(totals))
      else scored.join(broadcast(totals), groupCols, "left")
    withTotals
      .groupBy(col(idCol) +: g: _*)
      .agg(count(lit(1)).as("n_bigrams"),
        avg(-log(p)).as("nll"))
      .withColumn("ppl", exp(col("nll")))
  }

  /** Per-document interpolated Kneser-Ney TRIGRAM NLL/perplexity with true
    * RECURSIVE backoff — the [[knBigramPpl]] model taken one order higher
    * (CCNet's KenLM operates at order 5; the recursion shape is identical
    * from order 3 up, each level interpolating with the next-lower one):
    *
    *   p(w3|w1w2) = max(c3−D,0)/c12 + (D·nf12/c12)·p_low(w3|w2)   if c12>0
    *              = p_low(w3|w2)                                   otherwise
    *   p_low(w3|w2) — the LOWER order uses CONTINUATION counts, not raw
    *   counts (the Kneser-Ney insight: "how many contexts has this bigram
    *   completed", not "how often did it occur"):
    *              = max(N1+(·w2w3)−D,0)/N1+(·w2·)
    *                + (D·nf(w2)/N1+(·w2·))·p_cont(w3)              if N1+(·w2·)>0
    *              = p_cont(w3)                                     otherwise
    *   p_cont(w3) = (N1+(·w3)+1)/(T2+V+1)   — the [[knBigramPpl]] floor
    *
    * where c3/c12/nf12 come from trigram counts, N1+(·w2w3) = distinct w1
    * preceding the bigram (trigram TYPES grouped by right-bigram),
    * N1+(·w2·) = distinct (w1,w3) pairs around w2, nf(w2)/N1+(·w3)/T2/V
    * from the bigram-type tables.
    *
    * Scale shape: ONE codegen'd `kn_trigram_hashes` pass + the bigram pass;
    * the model is SIX hash aggregations (8-byte keys, map-side partial) all
    * derived from two type tables; scoring is six key joins left to AQE and
    * one broadcast (T2, V) row. The LM is never collected — same 100 TB
    * contract as the bigram operator; hash collisions ~vocab³/2⁶⁴ at the
    * trigram level (quality-signal tolerance, collision-free at oracle
    * scale). Docs with <3 tokens emit no row.
    * Returns (id, n_trigrams, nll, ppl). */
  def knTrigramPpl(train: DataFrame, score: DataFrame, textCol: String,
                   idCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount must be in (0,1): $discount")
    import graft.functions.expressions.HashExpressions.{kn_bigram_hashes, kn_trigram_hashes}
    def trigrams(d: DataFrame, extra: Column*): DataFrame =
      d.select(extra :+ explode(kn_trigram_hashes(col(textCol))).as("tg"): _*)
        .select(extra ++ Seq(col("tg.w2h").as("w2h"), col("tg.w3h").as("w3h"),
          col("tg.b12h").as("b12h"), col("tg.b23h").as("b23h"),
          col("tg.tgh").as("tgh")): _*)
    val tri = trigrams(train)
      .groupBy(col("w2h"), col("w3h"), col("b12h"), col("b23h"), col("tgh"))
      .agg(count(lit(1)).as("__c3"))
    val left12 = tri.groupBy(col("b12h"))
      .agg(sum(col("__c3")).as("__c12"), count(lit(1)).as("__nf12"))
    val mid23 = tri.groupBy(col("b23h")).agg(count(lit(1)).as("__n1p23"))
    val midw2 = tri.groupBy(col("w2h")).agg(count(lit(1)).as("__n1pw2"))
    val bi = train.select(explode(kn_bigram_hashes(col(textCol))).as("bg"))
      .select(col("bg.w1h").as("w1h"), col("bg.w2h").as("w2h"), col("bg.bgh").as("bgh"))
      .groupBy(col("w1h"), col("w2h"), col("bgh")).agg(count(lit(1)).as("__c2"))
    val nfB = bi.groupBy(col("w1h").as("w2h")).agg(count(lit(1)).as("__nfw2"))
    val contB = bi.groupBy(col("w2h").as("w3h")).agg(count(lit(1)).as("__nl3"))
    val vocab = train.select(explode(S.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("__v"))
    val totals = bi.agg(count(lit(1)).as("__t2")).crossJoin(vocab)
    val pCont = (coalesce(col("__nl3"), lit(0L)).cast("double") + 1.0) /
      (coalesce(col("__t2"), lit(0L)).cast("double") +
        coalesce(col("__v"), lit(0L)).cast("double") + 1.0)
    val pLow = when(col("__n1pw2").isNotNull,
        greatest(coalesce(col("__n1p23"), lit(0L)).cast("double") - discount, lit(0.0)) /
          col("__n1pw2").cast("double") +
          lit(discount) * coalesce(col("__nfw2"), lit(0L)).cast("double") /
            col("__n1pw2").cast("double") * pCont)
      .otherwise(pCont)
    val p = when(col("__c12").isNotNull,
        greatest(coalesce(col("__c3"), lit(0L)).cast("double") - discount, lit(0.0)) /
          col("__c12").cast("double") +
          lit(discount) * col("__nf12").cast("double") / col("__c12").cast("double") * pLow)
      .otherwise(pLow)
    trigrams(score, col(idCol))
      .join(tri.select(col("tgh"), col("__c3")), Seq("tgh"), "left")
      .join(left12, Seq("b12h"), "left")
      .join(mid23, Seq("b23h"), "left")
      .join(midw2, Seq("w2h"), "left")
      .join(nfB, Seq("w2h"), "left")
      .join(contB, Seq("w3h"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        avg(-log(p)).as("nll"))
      .withColumn("ppl", exp(col("nll")))
  }

  /** CCNet-style perplexity buckets: fit one KN bigram LM PER GROUP
    * ([[knBigramPpl]] with `groupCols`), self-score, and cut each group's
    * perplexity distribution into `nBuckets` rank buckets (CCNet keeps
    * head/middle and drops the tail at 3). Bucketing is ntile over
    * (rounded ppl, id) within the group — deterministic and
    * engine-replayable; the rank sort is one per-group window (the exact
    * formulation; at extreme per-group cardinality the KLL cut-point route
    * — [[graft.operators.CorpusStats.sketchQuantiles]] — computes the same
    * cuts without a sort, the q160 tradeoff). A group whose every doc has
    * <2 tokens emits nothing (no LM evidence either way).
    * Returns (id [, groupCols], n_bigrams, ppl_r, bucket 1..nBuckets). */
  def perplexityBuckets(docs: DataFrame, textCol: String, idCol: String,
                        groupCols: Seq[String], nBuckets: Int = 3,
                        discount: Double = 0.75): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 buckets: $nBuckets")
    val scoredCols = (idCol +: groupCols).map(col)
    knBigramPpl(docs, docs, textCol, idCol, discount, groupCols)
      .withColumn("ppl_r", round(col("ppl"), 3))
      .withColumn("bucket", ntile(nBuckets).over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col("ppl_r"), col(idCol))).cast("long"))
      .select(scoredCols ++ Seq(col("n_bigrams"), col("ppl_r"), col("bucket")): _*)
  }

  /** Moore-Lewis cross-entropy difference scoring (Moore & Lewis, ACL 2010
    * — "Intelligent Selection of Language Model Training Data"): score every
    * pool document under TWO Kneser-Ney bigram LMs — one trained on the
    * IN-DOMAIN corpus, one on the GENERAL corpus — and rank by
    * ce_diff = nll_in − nll_gen (per-token cross-entropy difference).
    * Low ce_diff = reads like the target domain AND not like generic text —
    * the classic signal for mining domain-relevant training data out of a
    * crawl (CCNet's ppl filter is the one-sided special case of this).
    *
    * Scale shape: both LMs fit and score in ONE plan via [[knBigramPpl]]'s
    * `groupCols` machinery (one independent LM per group): the train sides
    * union under an `__lm` tag, so the model is one pass over
    * in-domain + general with every aggregation keyed by (`__lm`, gram) —
    * not two plan branches — and the pool runs the tokenize+hash kernel
    * ONCE, each resulting 8-byte bigram row exploded to both tags
    * (2× scoring rows, 1× kernel work — the pool is the crawl, the big
    * side). Nothing is collected; both LMs stay DataFrames — a 100 TB
    * general corpus fits the same plan as [[knBigramPpl]]. Pool docs with
    * <2 tokens emit no row (no LM evidence). Both train sides must be
    * non-empty: an empty LM would score every bigram at the pure-smoothing
    * floor p = 1 (nll 0) and silently invert the selection.
    * Returns (id, n_bigrams, nll_in, nll_gen, ce_diff). */
  def mooreLewisScore(inDomain: DataFrame, general: DataFrame,
                      pool: DataFrame, textCol: String, idCol: String,
                      discount: Double = 0.75): DataFrame = {
    require(!inDomain.isEmpty, "in-domain train side is empty — its LM would " +
      "degenerate to p=1 and select the whole pool")
    require(!general.isEmpty, "general train side is empty — its LM would " +
      "degenerate to p=1 and reject the whole pool")
    import graft.functions.expressions.HashExpressions.kn_bigram_hashes
    val train = inDomain.select(col(textCol)).withColumn("__lm", lit("in"))
      .unionByName(general.select(col(textCol)).withColumn("__lm", lit("gen")))
    val poolBg = pool
      .select(col(idCol), explode(kn_bigram_hashes(col(textCol))).as("bg"))
      .select(col(idCol), explode(array(lit("in"), lit("gen"))).as("__lm"),
        col("bg.w1h").as("w1h"), col("bg.w2h").as("w2h"), col("bg.bgh").as("bgh"))
    knBigramPplOnHashes(train, poolBg, textCol, idCol, discount, Seq("__lm"))
      .groupBy(col(idCol))
      .agg(max(col("n_bigrams")).as("n_bigrams"),
        max(when(col("__lm") === "in", col("nll"))).as("nll_in"),
        max(when(col("__lm") === "gen", col("nll"))).as("nll_gen"))
      .withColumn("ce_diff", col("nll_in") - col("nll_gen"))
  }

  /** Moore-Lewis selection: keep pool documents whose cross-entropy
    * difference clears `threshold` (rounded to 6 dp first so the cut is
    * engine-replayable — the paper picks the threshold on held-out data;
    * here it is the caller's knob). A fixed threshold keeps selection a
    * pure filter — no global sort, no quantile pass — so it composes with
    * any downstream sampler at any scale. */
  def mooreLewisSelect(inDomain: DataFrame, general: DataFrame,
                       pool: DataFrame, textCol: String, idCol: String,
                       threshold: Double, discount: Double = 0.75): DataFrame =
    mooreLewisScore(inDomain, general, pool, textCol, idCol, discount)
      .filter(round(col("ce_diff"), 6) <= threshold)

  /** Top-k highest-tfidf tokens per document (deterministic: rounded score,
    * then token, breaks ties). */
  def topTerms(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    tfidf(docs, textCol, idCol)
      .withColumn("tfidf_r", round(col("tfidf"), 6))
      .withColumn("term_rank", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("tfidf_r").desc, col("token"))))
      .filter(col("term_rank") <= k)
      .select(col(idCol), col("token"), col("tfidf_r"), col("term_rank"))
}
