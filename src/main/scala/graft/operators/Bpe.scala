package graft.operators

import graft.functions.{SimilarityFunctions => S}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Byte-pair-encoding primitives for tokenizer training over a corpus —
  * the subword-vocabulary step of a training-data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Scale shape: the corpus is touched EXACTLY ONCE ([[wordVocab]] — one scan
  * + one hash aggregation to the word-frequency table). Every training
  * iteration after that runs over the vocab table, whose size is bounded by
  * the distinct-word count, not the corpus byte count — at 100 TB the vocab
  * is millions of rows where the corpus is trillions, so the per-merge cost
  * is corpus-size-independent.
  *
  * Merge-loop execution ([[train]]): the word vocab is bounded (distinct
  * words, not corpus bytes), so when it fits `localVocabBound` the merge
  * loop runs DRIVER-SIDE over the collected frequency table with
  * incremental pair counting + a lazy max-heap — a realistic 32k-merge
  * vocabulary costs zero Spark jobs after the single corpus scan, instead
  * of ~2 scheduler round-trips per merge. Above the bound the loop stays
  * distributed (pair aggregation + fold-rewrite per merge, each iteration
  * vocab-sized). Both paths are value-identical (BpeSpec proves equality);
  * the cutover mirrors ConnectedComponents.localRun, including UTF-8-binary
  * string tiebreaks so the local argmax matches Spark's string ordering
  * beyond the BMP.
  */
object Bpe {

  /** Word-frequency table with initial character-level symbols:
    * (word, freq, symbols). The single corpus-sized operation in BPE
    * training — everything downstream iterates over this table. Words are
    * [[S.tokens]] (lowercased, whitespace-split). Symbols are CODEPOINTS —
    * `regexp_extract_all` with a codepoint-matching `.` — not UTF-16 code
    * units (`split(word, '')` would shear supplementary-plane characters
    * like emoji/CJK-B into lone surrogates, diverging from reference BPE
    * and from the codepoint-based DuckDB oracle on multilingual corpora). */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(S.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("symbols", expr("regexp_extract_all(word, '(?s).', 0)"))

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
  private[graft] def mergeOnce(symbols: org.apache.spark.sql.Column,
      l: String, r: String): org.apache.spark.sql.Column =
    aggregate(symbols,
      lit(Array.empty[String]).cast(ArrayType(StringType)),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Apply an ordered merge list to the vocab's symbol arrays — the BPE
    * "encode with a trained merge table" step (and the distributed
    * training loop's inner rewrite). Later merges see the symbols produced
    * by earlier ones, so multi-char cascades ((t,a) then (ta,b)) compose
    * exactly as in reference BPE. One native kernel call per row
    * ([[graft.functions.expressions.HashExpressions.bpe_apply]]) — the
    * per-merge [[mergeOnce]] fold chain it replaces rebuilt the array
    * via slice/concat once per merge (BpeSpec asserts both paths agree). */
  def applyMerges(vocab: DataFrame, merges: Seq[(String, String)]): DataFrame =
    vocab.withColumn("symbols",
      graft.functions.expressions.HashExpressions.bpe_apply(col("symbols"), merges))

  /** Encode documents with a TRAINED merge table — the piece a pipeline
    * actually ships: doc -> lowercased whitespace words -> per-word
    * subword segmentation under the ordered merges. The merge table is a
    * driver-side Seq (vocab-sized output of [[train]], thousands of rows),
    * compiled into ONE per-row expression chain: cost is a single linear
    * scan of the corpus with no join and no shuffle — the merges ride along
    * as literals in codegen, the classic broadcast-a-small-table-as-
    * literals move. Output: (docCols..., words, segments) where
    * segments(i) is word i's symbol sequence joined by `sep`. */
  def encode(docs: DataFrame, textCol: String, merges: Seq[(String, String)],
             sep: String = " "): DataFrame = {
    val words = S.tokens(col(textCol))
    // one native kernel call per row: codepoint split + the whole ordered
    // merge table + join, with the merges as codegen reference objects. The
    // previous formulation (a transform() lambda folding mergeOnce per
    // merge) rebuilt every word's array once PER MERGE through interpreted
    // slice/concat — 57 s for 5k docs × 64 merges; this kernel does the
    // same semantics in one pass (~100× less; BpeSpec asserts equality).
    docs.withColumn("words", words)
      .withColumn("segments",
        graft.functions.expressions.HashExpressions.bpe_segments(
          col("words"), merges, sep))
  }

  /** Train `numMerges` BPE merges: per iteration, the globally most frequent
    * adjacent pair (ties broken by (pair_left, pair_right) ascending, in
    * UTF-8 binary order — Spark's string sort order) is recorded and merged
    * into the vocab. Returns the merge table (rank, pair_left, pair_right,
    * cnt); stops early if no pair remains (fully merged corpus).
    *
    * The corpus is scanned once into the word vocab; if the vocab has at
    * most `localVocabBound` rows the merge loop runs driver-side
    * ([[trainLocal]] — incremental counts, zero jobs per merge), else
    * distributed ([[trainDistributed]] — 2 jobs per merge, each
    * vocab-sized). Both collect/iterate the SAME distributed wordVocab
    * output, so tokenization and symbol-splitting parity is by
    * construction. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            localVocabBound: Long = 5000000L): DataFrame = {
    val spark = docs.sparkSession
    val vocab = wordVocab(docs, textCol).localCheckpoint()
    val merges =
      if (vocab.count() <= localVocabBound) trainLocal(vocab, numMerges)
      else trainDistributed(vocab, numMerges)
    import spark.implicits._
    merges.toDF("rank", "pair_left", "pair_right", "cnt")
  }

  /** UTF-8 binary string ordering — matches Spark's UTF8String sort order
    * (Java's String.compareTo disagrees beyond the BMP). */
  private def cmpU8(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** The greedy left-to-right non-overlapping merge pass, driver-side —
    * the ONE shared implementation ([[graft.functions.expressions.Kernels
    * .bpeMergePass]], also behind the bpe_apply/bpe_segments expressions),
    * so trainer and encoder can never diverge on merge semantics. */
  private def mergeVec(syms: Array[String], l: String, r: String): Array[String] =
    graft.functions.expressions.Kernels.bpeMergePass(syms, l, r)

  /** Driver-side merge loop over the collected word-frequency table.
    * Incremental pair maintenance: a pair->count map, a pair->word-ids
    * occurrence index, and a lazy max-heap ((cnt desc, l, r asc-UTF8));
    * stale heap entries (count changed since push) are skipped on pop, and
    * every touched pair re-pushes its final count after each merge, so the
    * heap top is always the true argmax. Per merge only the words that
    * CONTAIN the merged pair are rewritten — total work across all merges
    * is bounded by total symbol churn, not merges × vocab. */
  private def trainLocal(vocab: DataFrame, numMerges: Int): Seq[(Int, String, String, Long)] = {
    val rows = vocab.select(col("symbols"), col("freq")).collect()
    val words = new Array[Array[String]](rows.length)
    val freqs = new Array[Long](rows.length)
    var i = 0
    while (i < rows.length) {
      words(i) = rows(i).getSeq[String](0).toArray
      freqs(i) = rows(i).getLong(1)
      i += 1
    }
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // heap entry: (cnt-at-push, l, r); max by cnt, ties by SMALLEST (l, r)
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val cl = cmpU8(y._2, x._2) // reversed: smaller l = higher priority
          if (cl != 0) cl else cmpU8(y._3, x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    i = 0
    while (i < words.length) {
      val s = words(i); var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        counts.update(p, counts.getOrElse(p, 0L) + freqs(i))
        occ.getOrElseUpdate(p, mutable.HashSet.empty) += i
        j += 1
      }
      i += 1
    }
    counts.foreach { case (p, c) => heap.enqueue((c, p._1, p._2)) }

    def containsPair(s: Array[String], l: String, r: String): Boolean = {
      var j = 0
      while (j + 1 < s.length) { if (s(j) == l && s(j + 1) == r) return true; j += 1 }
      false
    }

    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= numMerges && heap.nonEmpty) {
      val (c, l, r) = heap.dequeue()
      if (c > 0 && counts.getOrElse((l, r), 0L) == c) {
        out += ((rank, l, r, c))
        val touched = mutable.HashSet.empty[(String, String)]
        val members = occ.getOrElse((l, r), mutable.HashSet.empty)
        val ids = members.toArray // snapshot: the loop mutates occ sets
        var k = 0
        while (k < ids.length) {
          val w = ids(k); val old = words(w)
          if (!containsPair(old, l, r)) members -= w // stale index entry
          else {
            val f = freqs(w)
            var j = 0
            while (j + 1 < old.length) {
              val p = (old(j), old(j + 1))
              counts.update(p, counts(p) - f); touched += p; j += 1
            }
            val neu = mergeVec(old, l, r)
            j = 0
            while (j + 1 < neu.length) {
              val p = (neu(j), neu(j + 1))
              counts.update(p, counts.getOrElse(p, 0L) + f)
              occ.getOrElseUpdate(p, mutable.HashSet.empty) += w
              touched += p; j += 1
            }
            words(w) = neu
          }
          k += 1
        }
        touched.foreach { p =>
          val pc = counts.getOrElse(p, 0L)
          if (pc > 0L) heap.enqueue((pc, p._1, p._2))
          else { counts.remove(p); occ.remove(p) }
        }
        rank += 1
      }
      // else: stale entry — skip
    }
    out.toSeq
  }

  /** Distributed merge loop — per iteration one vocab-sized pair
    * aggregation + argmax (`limit(1)` control-flow scalar, same pattern as
    * the DQ halt checks) and one fold-rewrite; the vocab is
    * localCheckpoint-ed per iteration so the fold's expression tree never
    * accumulates across merges. ~2 Spark jobs per merge: correct above the
    * local bound, where per-merge cost must stay distributed. */
  private def trainDistributed(vocab0: DataFrame, numMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = vocab0
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
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
    merges.toSeq
  }
}
