package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Within-document repetition metrics — the Gopher-family quality filter for
  * training corpora (a document whose text is mostly repeated lines is
  * boilerplate/template spam and gets dropped before training). The reference
  * ETL has no analog; this is part of the LLM-pipeline pack alongside
  * dedup/quality/langid.
  *
  * Per document over its newline-split lines:
  *  - `n_lines`, `n_distinct_lines`
  *  - `dup_line_frac`  = (n_lines − n_distinct_lines) / n_lines
  *  - `dup_char_frac`  = chars in lines occurring >1× / total chars
  *
  * Scale shape: lines are EXPLODED then immediately reduced by
  * (id, xxhash64(line)) — the shuffle carries (id, 8-byte hash, length, count)
  * per DISTINCT line, never line text (same 2⁻⁶⁴-collision contract as the
  * shingle pipeline). Two hash-partitioned aggregations on the doc id, no
  * window, no driver state; a 100 TB corpus shuffles O(distinct lines) small
  * rows. Map-side partial aggregation collapses a degenerate doc's repeated
  * lines before the exchange, so boilerplate floods don't skew the shuffle.
  */
object Repetition {

  def lineRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(idCol),
        explode(split(col(textCol), "\n")).as("__line"))
      .select(col(idCol), xxhash64(col("__line")).as("__lh"),
        length(col("__line")).cast("long").as("__len"))
    val perLine = lines.groupBy(col(idCol), col("__lh"))
      .agg(count(lit(1)).as("__c"), first(col("__len")).as("__len"))
    perLine.groupBy(col(idCol))
      .agg(
        sum(col("__c")).as("n_lines"),
        count(lit(1)).as("n_distinct_lines"),
        sum(col("__len") * col("__c")).as("__chars"),
        sum(when(col("__c") > 1, col("__len") * col("__c")).otherwise(0L)).as("__dup_chars"))
      .select(col(idCol),
        col("n_lines"), col("n_distinct_lines"),
        when(col("n_lines") > 0,
          (col("n_lines") - col("n_distinct_lines")).cast("double") / col("n_lines"))
          .otherwise(0.0).as("dup_line_frac"),
        when(col("__chars") > 0,
          col("__dup_chars").cast("double") / col("__chars"))
          .otherwise(0.0).as("dup_char_frac"))
  }

  /** Repeated-line REMOVAL (the cleanse counterpart of [[lineRepetition]]):
    * rebuild each document keeping only the FIRST occurrence of every line,
    * in original order — the standard template/boilerplate scrub before
    * training. Returns (id, cleaned).
    *
    * Scale shape: posexplode → min-position per (id, line) with map-side
    * partial aggregation (a boilerplate flood collapses before the shuffle)
    * → one per-id rebuild via array_sort over (position, line) structs
    * (positions are unique, so the sort is total and collect_list's
    * arrival-order nondeterminism is neutralized). Line text rides the
    * shuffle here by necessity — the output IS the text. */
  def dropRepeatedLines(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__p", "__l")))
    val firsts = lines.groupBy(col(idCol), col("__l"))
      .agg(min(col("__p")).as("__p"))
    firsts.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__p"), col("__l")))),
          s => s.getField("__l")),
        "\n").as("cleaned"))
  }

  /** Top word-n-gram character coverage — the other Gopher repetition rule
    * ("fraction of characters in the most frequent word n-gram"; n=2..4 in
    * the paper). Coverage of a gram = occurrences × gram length (incl. inner
    * spaces), normalized by the doc's total character count; the reported
    * gram is the deterministic STRUCT MAX over (count, coverage, gram) —
    * both Spark and DuckDB order structs lexicographically by field, so the
    * oracle replicates the tie-break exactly. Docs with fewer than n tokens
    * report ('', 0, 0.0).
    *
    * Scale shape: explode n-grams (string form — the gram itself is the
    * output), one (id, gram) aggregation with map-side partial combine, then
    * one per-id struct-max aggregation — never a window over the exploded
    * frame. For a huge corpus pre-materialize the token array column (see
    * SimilarityFunctions.wordShingles on HOF re-evaluation under
    * CollapseProject). */
  def topNgramCharFrac(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 2): DataFrame = {
    val ts = graft.functions.SimilarityFunctions.tokens(col(textCol))
    val base = df.select(col(idCol), length(col(textCol)).cast("long").as("__chars"),
      ts.as("__ts"))
    // n-grams via ZIPPED SHIFTED SLICES, not slice()-inside-a-lambda: a
    // lambda body referencing the token array re-evaluates the whole split()
    // subtree per ELEMENT (no CSE across lambda boundaries — see
    // SimilarityFunctions.wordShingles), turning gram construction O(tokens²).
    // Slices are row-level (n evaluations of the array), the lambda touches
    // only its own zipped element — linear.
    val cnt = size(col("__ts"))
    val m = cnt - (n - 1)
    val shifted = (0 until n).map(k => slice(col("__ts"), lit(k + 1), m).as(s"t$k"))
    val gramArr = transform(arrays_zip(shifted: _*), s =>
      concat_ws(" ", (0 until n).map(k => s.getField(s"t$k")): _*))
    val grams = base.filter(cnt >= n).select(col(idCol),
      explode(gramArr).as("__gram"))
    val top = grams.groupBy(col(idCol), col("__gram"))
      .agg(count(lit(1)).as("__c"))
      .select(col(idCol), struct(col("__c"),
        (col("__c") * length(col("__gram"))).as("__cov"), col("__gram").as("__g")).as("__s"))
      .groupBy(col(idCol)).agg(max(col("__s")).as("__top"))
    base.select(col(idCol), col("__chars"))
      .join(top, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__top.__g"), lit("")).as("top_gram"),
        coalesce(col("__top.__c"), lit(0L)).as("top_gram_count"),
        when(col("__chars") > 0 && col("__top.__c").isNotNull,
          col("__top.__cov").cast("double") / col("__chars"))
          .otherwise(0.0).as("top_gram_char_frac"))
  }
}
