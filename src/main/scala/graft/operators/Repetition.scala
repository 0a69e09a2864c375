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
}
