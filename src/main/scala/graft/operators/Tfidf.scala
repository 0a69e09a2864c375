package graft.operators

import graft.functions.{SimilarityFunctions => S}
import org.apache.spark.sql.DataFrame
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
