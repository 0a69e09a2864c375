package graft.operators

import graft.functions.{SimilarityFunctions => S}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Byte-pair-encoding primitives for tokenizer training over a corpus —
  * the subword-vocabulary step of a training-data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Scale shape: the corpus is touched EXACTLY ONCE ([[wordVocab]] — one scan
  * + one hash aggregation to the word-frequency table). Every training
  * iteration after that runs over the vocab table, whose size is bounded by
  * the distinct-word count, not the corpus byte count — at 100 TB the vocab
  * is millions of rows where the corpus is trillions, so the per-merge cost
  * is corpus-size-independent. Pair counting is a zip_with over the shifted
  * symbol array (no self-join, no explode of the raw text), and the merge
  * rewrite is a single left-to-right fold per word (`aggregate` HOF) — no
  * shuffle at all. The only driver-side value per iteration is the argmax
  * pair (a one-row `limit(1)` control-flow scalar, same pattern as the DQ
  * halt checks).
  */
object Bpe {

  /** Word-frequency table with initial character-level symbols:
    * (word, freq, symbols). The single corpus-sized operation in BPE
    * training — everything downstream iterates over this table. Words are
    * [[S.tokens]] (lowercased, whitespace-split). */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(S.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      // Spark split("abc", "") yields a trailing "" (Java regex split with
      // limit -1); filter it so symbols are exactly the characters
      .withColumn("symbols", expr("filter(split(word, ''), s -> s <> '')"))

  /** Frequency-weighted adjacent-symbol pair counts:
    * (pair_left, pair_right, cnt). One explode + one hash aggregation over
    * the vocab; map-side partial aggregation absorbs the per-word fan-out. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("symbols")) >= 2)
      .select(col("freq"), explode(expr(
        "zip_with(slice(symbols, 1, size(symbols) - 1), " +
          "slice(symbols, 2, size(symbols) - 1), " +
          "(a, b) -> struct(a AS l, b AS r))")).as("p"))
      .groupBy(col("p.l").as("pair_left"), col("p.r").as("pair_right"))
      .agg(sum(col("freq")).as("cnt"))

  /** One merge pass of (l, r) -> l+r over a symbol array: the standard BPE
    * left-to-right non-overlapping greedy scan, as a fold — if the
    * accumulator's last symbol is `l` and the incoming one is `r`, the pair
    * collapses and the merged symbol does NOT immediately re-pair with the
    * next `r` (so "a a a" under (a,a) becomes [aa, a], not [aa, aa]'s
    * overlap). Pure per-row expression, zero shuffle. */
  private[operators] def mergeOnce(symbols: org.apache.spark.sql.Column,
      l: String, r: String): org.apache.spark.sql.Column =
    aggregate(symbols,
      lit(Array.empty[String]).cast(ArrayType(StringType)),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Apply an ordered merge list to the vocab's symbol arrays — the BPE
    * "encode with a trained merge table" step (and [[train]]'s inner loop).
    * Later merges see the symbols produced by earlier ones, so multi-char
    * cascades ((t,a) then (ta,b)) compose exactly as in reference BPE. */
  def applyMerges(vocab: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(vocab) { case (v, (l, r)) =>
      v.withColumn("symbols", mergeOnce(col("symbols"), l, r))
    }

  /** Train `numMerges` BPE merges: per iteration, the globally most frequent
    * adjacent pair (ties broken by (pair_left, pair_right) for determinism)
    * is recorded and merged into the vocab. Returns the merge table
    * (rank, pair_left, pair_right, cnt). The vocab is localCheckpoint-ed per
    * iteration so the fold's expression tree never accumulates across
    * merges; stops early if no pair remains (fully merged corpus). */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    var vocab = wordVocab(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    var rank = 1
    while (rank <= numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("pair_left"), col("pair_right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, c))
        vocab = applyMerges(vocab, Seq((l, r))).localCheckpoint()
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "pair_left", "pair_right", "cnt")
  }
}
