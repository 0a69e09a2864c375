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
