package graft.operators

import graft.functions.expressions.{TextStatsExpressions => TS}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Within-document repetition — the Gopher-family quality filters for
  * training corpora (a document whose text is mostly repeated lines or one
  * hammered n-gram is boilerplate/template spam and gets dropped before
  * training). The reference ETL has no analog; this is part of the
  * LLM-pipeline pack alongside dedup/quality/langid.
  *
  * Per document over its newline-split lines:
  *  - `n_lines`, `n_distinct_lines`
  *  - `dup_line_frac`  = (n_lines − n_distinct_lines) / n_lines
  *  - `dup_char_frac`  = chars in lines occurring >1× / total chars
  * Plus the most frequent word n-gram and its character coverage, and the
  * repeated-line scrub.
  *
  * Scale shape: documents are ROWS, so all of this is per-row math — each
  * operator is one native codegen'd kernel call
  * ([[graft.functions.expressions.TextStatsExpressions]]) inside whole-stage
  * codegen with ZERO shuffle; a 100 TB corpus runs these entirely map-side.
  * The explode+groupBy formulations are kept below (`*ViaExplode`) purely as
  * independent cross-check references — RepetitionSpec asserts equality with
  * codegen fallback disabled. */
object Repetition {

  def lineRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TS.line_stats(col(textCol)).as("__s"))
      .select(col(idCol),
        col("__s").getItem(0).as("n_lines"),
        col("__s").getItem(1).as("n_distinct_lines"),
        when(col("__s").getItem(0) > 0,
          (col("__s").getItem(0) - col("__s").getItem(1)).cast("double") / col("__s").getItem(0))
          .otherwise(0.0).as("dup_line_frac"),
        when(col("__s").getItem(2) > 0,
          col("__s").getItem(3).cast("double") / col("__s").getItem(2))
          .otherwise(0.0).as("dup_char_frac"))

  /** Repeated-line REMOVAL (the cleanse counterpart of [[lineRepetition]]):
    * rebuild each document keeping only the FIRST occurrence of every line,
    * in original order. Returns (id, cleaned). */
  def dropRepeatedLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TS.drop_repeated_lines(col(textCol)).as("cleaned"))

  /** Top word-n-gram character coverage — the other Gopher repetition rule
    * ("fraction of characters in the most frequent word n-gram"; n=2..4 in
    * the paper). Coverage of a gram = occurrences × gram length (incl. inner
    * spaces), normalized by the doc's total character count; the reported
    * gram is the deterministic argmax under the (count, coverage, gram)
    * struct order — the same order DuckDB's struct max uses, so the oracle
    * replicates tie-breaks exactly. Docs with fewer than n tokens report
    * ('', 0, 0.0). */
  def topNgramCharFrac(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 2): DataFrame =
    df.select(col(idCol), length(col(textCol)).cast("long").as("__chars"),
        TS.top_ngram(col(textCol), n).as("__top"))
      .select(col(idCol),
        coalesce(col("__top.gram"), lit("")).as("top_gram"),
        col("__top.cnt").as("top_gram_count"),
        when(col("__chars") > 0 && col("__top.gram").isNotNull,
          col("__top.cov").cast("double") / col("__chars"))
          .otherwise(0.0).as("top_gram_char_frac"))

  /** CORPUS-level repeated-line dedup (the C4/RefinedWeb recipe): across ALL
    * documents, every distinct line survives exactly once — in the document
    * where it first appears (min (doc, position) order) — and each document is
    * rebuilt from its surviving lines in original order. Unlike the per-row
    * [[dropRepeatedLines]], this is genuinely corpus-global state (the
    * boilerplate being scrubbed repeats ACROSS pages), so it shuffles — but
    * LINE TEXT never enters an exchange: the keep-first aggregation keys on
    * `xxhash64(line)` (8-byte keys; map-side partial min collapses floods
    * before the exchange), winners reduce to one (doc, positions[]) row per
    * document, and each document is rebuilt ROW-LOCALLY by re-splitting its
    * own text and keeping the surviving positions in order. Shuffle volume is
    * O(lines × 24 bytes) + O(docs × survivors×8 bytes), independent of line
    * length (previously the text was both the groupBy key and the semi-join
    * key — several times the bytes on long lines). Hash collisions merge two
    * distinct lines at ~n²/2⁶⁴ probability — the standard fingerprint-dedup
    * tradeoff ([[lineRepetitionViaExplode]] makes the same one). Documents
    * whose every line was claimed elsewhere come back as empty strings, not
    * dropped — callers filter on length if they want removal.
    * Returns (id, cleaned). */
  def dropRepeatedLinesCorpus(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__p", "__l")))
    val keepPos = lines
      .select(xxhash64(col("__l")).as("__lh"), col(idCol), col("__p"))
      .groupBy(col("__lh"))
      .agg(min(struct(col(idCol), col("__p"))).as("__first"))
      .select(col("__first").getField(idCol).as(idCol),
        col("__first").getField("__p").as("__p"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__p"))).as("__keep"))
    // Rebuild row-locally in O(kept) per doc: element_at on the __parts
    // ATTRIBUTE is O(1) offset access (UnsafeArrayData), so the cost is the
    // kept positions — not lines × kept (an array_contains-per-line
    // formulation is quadratic on huge mostly-kept documents). __parts is
    // referenced TWICE below (the size() guard) deliberately: CollapseProject
    // inlines single-use aliases into the lambda, where split() would
    // re-evaluate PER ELEMENT; a second use of a non-cheap alias blocks the
    // collapse (guarded by the plan spec).
    df.select(col(idCol), col(textCol)).join(keepPos, Seq(idCol), "left")
      .withColumn("__parts", split(col(textCol), "\n"))
      .select(col(idCol),
        when(col("__keep").isNull || size(col("__parts")) < 0, lit(""))
          .otherwise(array_join(
            transform(col("__keep"), p => element_at(col("__parts"), p + 1)),
            "\n")).as("cleaned"))
  }

  /** CORPUS-level repeated n-gram SPAN SCRUB (the exact-substring-dedup
    * recipe of Lee et al. 2022 "Deduplicating Training Data Makes Language
    * Models Better", at token-n-gram granularity): any run of `n` consecutive
    * tokens that appears in at least `minDocs` DISTINCT documents is
    * boilerplate; every token covered by such a run is removed from every
    * document (overlapping runs merge naturally — a token is dropped iff ANY
    * hot n-gram covers it). Distinct-document counting means within-document
    * repetition alone never triggers the scrub (that is
    * [[dropRepeatedLines]]/[[topNgramCharFrac]] territory).
    *
    * Scale shape: gram construction + hashing is ONE codegen'd kernel pass
    * per document ([[graft.functions.expressions.Kernels.gramHashPairs]] —
    * the zipped-shifted-slice HOF it replaces evaluated interpreted and cost
    * ~3× the whole rest of the query); what shuffles is
    * ((h1, h2), doc, pos) — a 16-byte 128-bit key instead of the gram TEXT
    * (shuffle bytes independent of gram length) or a 32-char md5 hex, with
    * over-masking from key collisions ~m²/2¹²⁸ (nonexistent in practice;
    * 64 bits would NOT survive 100 TB gram counts). The oracle groups the
    * same windows via md5 — any injective gram key yields identical hot
    * sets, so the replay needs no xxhash64 in DuckDB. The hot-key table is
    * usually tiny (boilerplate is rare) but corpus-dependent, so the join
    * back is left to AQE rather than force-broadcast. Each document is
    * rebuilt ROW-LOCALLY from its own text and its sorted hot-start list in
    * one kernel pass ([[graft.functions.expressions.Kernels.scrubSpans]]).
    * Returns (id, n_tokens, n_removed, scrubbed_text).
    *
    * `keepFirst = true` is the Lee et al. KEEP-ONE contract: each hot
    * n-gram's corpus-first occurrence (min (doc, position) — deterministic
    * however the corpus is partitioned) is exempt from the scrub, so exactly
    * one copy of every duplicated run survives the corpus instead of zero
    * (remove-all destroys legitimately-common constructs; keep-one only
    * destroys the repetition). Cost: one more hot-keyed aggregation (the
    * per-gram min struct, map-side partial) and the first-occurrence
    * anti-condition — both on the hot subset only, not the corpus. */
  def scrubRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 8, minDocs: Int = 2,
                         keepFirst: Boolean = false): DataFrame = {
    require(n > 0 && minDocs >= 2, s"need n > 0, minDocs >= 2: $n, $minDocs")
    import graft.functions.expressions.HashExpressions.gram_hash_pairs
    import graft.functions.expressions.TextStatsExpressions.scrub_spans
    val grams = df.select(col(idCol),
      posexplode(gram_hash_pairs(col(textCol), n)).as(Seq("__p", "__gh")))
    val hot = grams.groupBy(col("__gh"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__gh"))
    val hotOcc = grams.join(hot, Seq("__gh"))
    val scrubOcc =
      if (!keepFirst) hotOcc
      else {
        val firsts = hotOcc.groupBy(col("__gh"))
          .agg(min(struct(col(idCol), col("__p"))).as("__f"))
        hotOcc.join(firsts, Seq("__gh"))
          .filter(!(col(idCol) === col("__f").getField(idCol) &&
            col("__p") === col("__f").getField("__p")))
          .drop("__f")
      }
    val hotStarts = scrubOcc
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("__p"))).as("__starts"))
    df.select(col(idCol), col(textCol)).join(hotStarts, Seq(idCol), "left")
      .withColumn("__starts",
        coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__sc", scrub_spans(col(textCol), col("__starts"), n))
      .select(col(idCol),
        col("__sc.n_tokens").as("n_tokens"),
        col("__sc.n_removed").as("n_removed"),
        col("__sc.scrubbed_text").as("scrubbed_text"))
  }

  // ------------------------------------------------ cross-check formulations

  /** Reference implementation of [[lineRepetition]] via explode + two
    * hash aggregations (the shuffle carries 8-byte line hashes, never text).
    * Kept for spec cross-checks; the kernel path above needs no shuffle. */
  private[graft] def lineRepetitionViaExplode(df: DataFrame, idCol: String,
                                              textCol: String): DataFrame = {
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

  /** Reference implementation of [[topNgramCharFrac]]: zipped-shifted-slice
    * gram construction (NOT slice()-in-a-lambda, which re-evaluates the token
    * array per element — O(tokens²)), two aggregations, struct max. */
  private[graft] def topNgramViaExplode(df: DataFrame, idCol: String,
                                        textCol: String, n: Int): DataFrame = {
    val ts = graft.functions.SimilarityFunctions.tokens(col(textCol))
    val base = df.select(col(idCol), length(col(textCol)).cast("long").as("__chars"),
      ts.as("__ts"))
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
