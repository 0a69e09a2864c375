package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data augmentation / mixing operators: every random-looking
  * decision is a pure function of (seed, id, position), so augmented corpora
  * are reproducible across runs, engines, and cluster sizes, and an external
  * SQL replay can verify them exactly — the same engine-independence contract
  * as [[Sampling.splitByHash]]. */
object Augment {

  /** Per-position md5 coin in [0, 1000): the decision primitive. */
  private def coin(seed: String, id: Column, pos: Column): Column =
    pmod(conv(substring(md5(concat(lit(seed + "|"), id.cast("string"),
      lit("|"), pos.cast("string"))), 1, 6), 16, 10).cast("long"), lit(1000L))

  /** Token-dropout augmentation (EDA-style): drop token i of doc d iff
    * coin(seed, d, i) < pPerMille — a light lexical perturbation used to
    * de-memorize templated text. Zero-shuffle row-local projection
    * (positions via a HOF filter over the token array); never drops a doc's
    * position-0 token: keep i iff coin ≥ p OR i = 0. Position 0 is ALWAYS
    * kept (its coin is never consulted), which trivially guarantees a
    * non-empty result (empty docs poison downstream tokenization) at the
    * cost of a dropout distribution that is biased at position 0.
    *
    * @return (id, n_tokens, n_kept, text_aug) */
  def tokenDropout(df: DataFrame, idCol: String, textCol: String,
                   seed: String, pPerMille: Int): DataFrame = {
    require(pPerMille >= 0 && pPerMille < 1000)
    import graft.functions.{SimilarityFunctions => S}
    val toks = S.tokens(col(textCol))
    val kept = filter(toks, (_, i) =>
      i === 0 || coin(seed, col(idCol), i) >= pPerMille)
    df.select(col(idCol), size(toks).cast("long").as("n_tokens"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, " ").as("text_aug"))
  }

  /** T5/UL2-style SPAN CORRUPTION — the denoising-objective data prep:
    * deterministic noise spans are cut out of each document and replaced by
    * numbered sentinels; `inputs` is the corrupted text, `targets` the
    * sentinel-prefixed recovery sequence the model learns to emit.
    *
    * Every decision is a pure function of (seed, id, position):
    *  - position i ANCHORS a span iff coin(seed|A, d, i) < anchorPerMille
    *    (choose ≈ 1000·rate/meanSpan for a T5-like corrupt rate);
    *  - the span covers [i, i+len) with len = 1 + coin(seed|L, d, i) mod
    *    (2·meanSpan−1), clamped to the doc end. Coins are uniform over
    *    [0, 1000), so mean length is EXACTLY meanSpan when (2·meanSpan−1)
    *    divides 1000 (meanSpan 3 — the T5 default — or 13, 63, 101, 251,
    *    …); for other values the residue bias shifts the mean low by up to
    *    (2·meanSpan−1)/1000·O(meanSpan) — negligible for small spans, and
    *    meanSpan > 500 is rejected outright (lengths would hard-cap below
    *    the requested mean);
    *  - STRICTLY overlapping spans merge into one (gaps-and-islands over a
    *    running max of span ends; adjacent spans stay distinct sentinels);
    *  - merged spans are numbered left-to-right: <extra_id_0>, <extra_id_1>…
    *
    * Scale shape: one posexplode + per-doc windows (partitioned by doc —
    * no global sort) + one join of token rows to covered positions + one
    * per-doc ordered rebuild via sort_array(collect_list(struct(pos, …)))
    * (the [[graft.operators.Repetition.dropRepeatedLinesCorpus]] rebuild
    * idiom); everything is keyed by doc id, so a 100 TB corpus corrupts
    * embarrassingly parallel. No floating point anywhere — the SQL oracle
    * replays coins, islands, and both rebuilt strings exactly.
    *
    * @return (id, n_tokens, n_corrupt, n_spans, inputs, targets) — docs
    *         with zero anchors come back with inputs = re-joined tokens,
    *         targets = ""; token-less docs emit no row (nothing to corrupt,
    *         the [[tokenDropout]] contract) */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String, seed: String,
                  anchorPerMille: Int, meanSpan: Int = 3): DataFrame = {
    require(anchorPerMille >= 0 && anchorPerMille < 1000, s"bad rate: $anchorPerMille")
    require(meanSpan >= 1 && 2L * meanSpan - 1 <= 1000,
      s"bad meanSpan: $meanSpan (coin range caps span lengths above 500)")
    import graft.functions.{SimilarityFunctions => S}
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), posexplode(S.tokens(col(textCol))).as(Seq("p", "t")))
    val nTok = toks.groupBy(col(idCol)).agg(count(lit(1)).as("n_tokens"))
    val anchors = toks
      .filter(coin(seed + "A", col(idCol), col("p")) < anchorPerMille)
      .select(col(idCol), col("p").as("s"),
        (col("p") + 1L + pmod(coin(seed + "L", col(idCol), col("p")),
          lit(2L * meanSpan - 1))).as("e"))
      .join(nTok, Seq(idCol))
      .select(col(idCol), col("s"), least(col("e"), col("n_tokens")).as("e"))
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("s"))
    val islanded = anchors
      .withColumn("__prevMax", max(col("e")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__prevMax").isNull || col("s") >= col("__prevMax"), 1L).otherwise(0L))
      .withColumn("island", sum(col("__new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val merged = islanded.groupBy(col(idCol), col("island"))
      .agg(min(col("s")).as("ms"), max(col("e")).as("me"))
      .withColumn("k", (row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("ms"))) - 1).cast("long"))
    // covered carries a RENAMED id: it shares toks' lineage, and the join
    // below would otherwise be an ambiguous self-join
    val covered = merged.select(col(idCol).as("__cid"), col("k"), col("ms"),
        explode(sequence(col("ms"), col("me") - 1)).as("cp"))
      .select(col("__cid"), col("cp"), col("k"), (col("cp") === col("ms")).as("isStart"))
    val marked = toks.join(covered, col(idCol) === col("__cid") &&
        col("p") === col("cp"), "left")
      .select(col(idCol), col("p"), col("t"), col("k"), col("isStart"))
    val sentinel = concat(lit("<extra_id_"), col("k").cast("string"), lit(">"))
    val pieces = marked.select(col(idCol), col("p"),
      struct(col("p").as("pos"),
        when(col("k").isNull, col("t"))
          .when(col("isStart"), sentinel)
          .otherwise(lit(null).cast("string")).as("inp"),
        when(col("k").isNull, lit(null).cast("string"))
          .when(col("isStart"), concat(sentinel, lit(" "), col("t")))
          .otherwise(col("t")).as("tgt")).as("__pc"))
    def rebuild(field: String) = array_join(
      filter(transform(sort_array(collect_list(col("__pc"))), x => x.getField(field)),
        x => x.isNotNull), " ")
    pieces.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__pc").getField("tgt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("__pc").getField("inp").isNotNull &&
          col("__pc").getField("tgt").isNotNull, 1L).otherwise(0L)).as("n_spans"),
        rebuild("inp").as("inputs"),
        rebuild("tgt").as("targets"))
  }

  /** Repeat-factor upsampling: emit `repeats(d)` copies of each doc with a
    * stable copy index — the data-mixing step that oversamples high-value
    * sources ("epochs over subsets"). The repeat count is the caller's
    * Column (bounded!); copies get distinct deterministic ids so downstream
    * shuffles treat them independently.
    *
    * Zero-shuffle: one posexplode over a generated sequence per row. Output
    * grows Σ repeats — the caller owns that budget.
    *
    * @return input columns + (copy, aug_id = id·maxRepeats + copy) */
  def upsampleByFactor(df: DataFrame, idCol: String, repeatsCol: Column,
                       maxRepeats: Int): DataFrame = {
    require(maxRepeats > 0)
    val bounded = least(greatest(repeatsCol.cast("long"), lit(1L)), lit(maxRepeats.toLong))
    df.withColumn("copy", explode(sequence(lit(0L), bounded - 1)))
      .withColumn("aug_id", col(idCol) * maxRepeats + col("copy"))
  }
}
