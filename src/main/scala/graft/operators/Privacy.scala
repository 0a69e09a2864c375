package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators for training-data release: k-anonymity generalization
  * and deterministic differentially-private aggregate release. The reference
  * engine's data-protection layer stops at field hashing/tokenization
  * (`lib/glue_scripts/lib/datatransform_dataprotection.py` — hash/redact/
  * tokenize single columns); these close the rest of the standard release
  * checklist: quasi-identifier COMBINATIONS (which re-identify even when
  * every single column is "safe") and aggregate counts over small groups.
  *
  * Everything here is deterministic — a release run is reproducible
  * bit-for-bit, which is also what makes the operators oracle-checkable.
  */
object Privacy {

  /** k-anonymity with a two-level generalization ladder.
    *
    * Level 0: rows whose exact quasi-identifier tuple occurs ≥ k times pass
    * unchanged. Level 1: the remaining rows have each quasi column replaced
    * by its generalization (`generalize`, e.g. account balance → band,
    * nation → region; columns without an entry keep their value), and pass
    * if their GENERALIZED tuple occurs ≥ k times among those remaining
    * rows. Level 2: whatever still fails is fully suppressed (every quasi
    * column becomes `suppressed`). Within each level, every emitted
    * quasi-tuple therefore appears ≥ k times (suppressed rows are uniform
    * by construction), and the `anonymity_level` column records the cost.
    *
    * Quasi columns are emitted as STRINGS (generalization and suppression
    * need a common type); non-quasi columns pass through untouched.
    *
    * Scale shape: two hash aggregations and two broadcast-or-shuffle joins
    * on the quasi tuple — no windows over the whole frame, no driver
    * collection; the group-count frames are one row per distinct tuple. */
  /** Null-safe, injection-proof tuple key: each value md5-hashed
    * independently (NULL → a fixed out-of-alphabet marker) and the
    * fixed-width segments concatenated — distinct tuples can never
    * collide via delimiter injection or concat_ws NULL-skipping, and NULL
    * keys group/join like any other value (a plain equi-join on raw
    * values would drop null tuples: NULL = NULL is not true). */
  private def tupleKey(cols: Seq[Column]): Column =
    concat(cols.map(c => coalesce(md5(c.cast("string")), lit("~"))): _*)

  def kAnonymize(df: DataFrame, quasiCols: Seq[String],
                 generalize: Map[String, Column], k: Int,
                 suppressed: String = "*"): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be >= 2: $k")
    require(generalize.keySet.subsetOf(quasiCols.toSet),
      "generalize keys must be quasi columns")
    val rest = df.columns.filterNot(quasiCols.contains).toSeq
    val exact = quasiCols.map(c => col(c).cast("string").as(c))
    val gen = quasiCols.map(c =>
      generalize.getOrElse(c, col(c)).cast("string").as(s"__g_$c"))
    val base = df.select(rest.map(col) ++ exact ++ gen: _*)
      .withColumn("__k0", tupleKey(quasiCols.map(col)))
      .withColumn("__k1", tupleKey(quasiCols.map(c => col(s"__g_$c"))))

    // group-count + equi-join on the tuple key, NOT a window: a window
    // over the whole frame shuffles AND SORTS every row per level; the
    // count frame is one narrow row per distinct tuple and joins back
    // with a hash join (null tuples handled by the key encoding)
    val cnt0 = base.groupBy(col("__k0")).agg(count(lit(1)).as("__n0"))
    val leveled0 = base.join(cnt0, Seq("__k0"))
    val pass0 = leveled0.filter(col("__n0") >= k)
      .select(rest.map(col) ++ quasiCols.map(col) :+ lit(0).as("anonymity_level"): _*)
    val fail0 = leveled0.filter(col("__n0") < k)

    val cnt1 = fail0.groupBy(col("__k1")).agg(count(lit(1)).as("__n1"))
    val leveled1 = fail0.join(cnt1, Seq("__k1"))
    val pass1 = leveled1.filter(col("__n1") >= k)
      .select(rest.map(col) ++
        quasiCols.map(c => col(s"__g_$c").as(c)) :+ lit(1).as("anonymity_level"): _*)
    val pass2 = leveled1.filter(col("__n1") < k)
      .select(rest.map(col) ++
        quasiCols.map(c => lit(suppressed).as(c)) :+ lit(2).as("anonymity_level"): _*)
    pass0.unionByName(pass1).unionByName(pass2)
  }

  /** Per-group COUNT release with deterministic Laplace noise — the
    * ε-differential-privacy counting query, made reproducible: the noise is
    * Laplace(1/ε) via inverse-CDF over a uniform derived from
    * md5(seed | group values), so the same release run always publishes the
    * same numbers (and the oracle can replay them). A true DP deployment
    * would draw fresh randomness per release and never reuse a seed across
    * releases of the same data — determinism trades that for auditability,
    * the same posture as every seeded sampler in this engine.
    *
    * noisy = count − (1/ε)·sign(u−½)·ln(1−2·|u−½|),  u ∈ (0,1)
    *
    * One hash aggregation; the noise is a per-group scalar expression. */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
               seed: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    // injection-proof noise key ([[tupleKey]]): concat_ws would skip NULL
    // group values and has no delimiter escaping, so distinct groups like
    // (NULL,'en') vs ('en',NULL) — or ('a|b','c') vs ('a','b|c') — would
    // share one noise draw, and noisy_a − noisy_b would leak the exact
    // true difference, which is the attack ε-DP exists to prevent
    val key = concat(md5(lit(seed)), tupleKey(groupCols.map(col)))
    // 32 hex-bit md5 prefix → uniform in (0,1): (v + 0.5) / 2^32 never hits
    // the endpoints, so ln(1 − 2|u−½|) is finite
    val u = (conv(substring(md5(key), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val shifted = u - lit(0.5)
    val noise = (lit(-1.0) / lit(epsilon)) * signum(shifted) *
      log(lit(1.0) - lit(2.0) * abs(shifted))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__true"))
      .select(groupCols.map(col) :+
        round(col("__true") + noise, 6).as("noisy_count"): _*)
  }

  /** USER-LEVEL DP counting: [[dpCounts]] with contribution bounding — the
    * piece row-level DP silently skips. Laplace(1/ε) calibrates to
    * sensitivity 1, i.e. ONE ROW per individual; a user contributing 500
    * rows to a group moves its count by 500, and ε means nothing. This
    * variant first caps each user's contribution per group at
    * `maxPerUser`, then releases Laplace(maxPerUser/ε) — the scaled noise
    * that makes the release ε-DP at the USER level. */
  def dpCountsBounded(df: DataFrame, userCol: String, groupCols: Seq[String],
                      maxPerUser: Int, epsilon: Double, seed: String): DataFrame = {
    require(maxPerUser >= 1, s"maxPerUser must be >= 1: $maxPerUser")
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    // capping a COUNT never needs to pick which rows survive:
    // min(n, maxPerUser) per (user, group) is the whole bound — two hash
    // aggregations, no window, no ordering anywhere
    val capped = df
      .groupBy(col(userCol) +: groupCols.map(col): _*)
      .agg(least(count(lit(1)), lit(maxPerUser.toLong)).as("__c"))
    val key = concat(md5(lit(seed)), tupleKey(groupCols.map(col)))
    val u = (conv(substring(md5(key), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val shifted = u - lit(0.5)
    val noise = (lit(-maxPerUser.toDouble) / lit(epsilon)) * signum(shifted) *
      log(lit(1.0) - lit(2.0) * abs(shifted))
    capped.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__c")).as("__true"))
      .select(groupCols.map(col) :+
        round(col("__true") + noise, 6).as("noisy_count"): _*)
  }

  /** ε-DP SUM release with value clipping — the third member of the
    * release family (counts, bounded counts, sums): each row's value is
    * CLIPPED into [lo, hi] before summing (the sensitivity bound — without
    * it one outlier row moves the sum arbitrarily and ε is meaningless),
    * then Laplace((hi−lo)/ε) noise is added via the same deterministic
    * inverse-CDF draw. Values are quantized to 6dp scaled longs so the
    * clipped sum is exact and partition-order-independent; row-level
    * sensitivity — compose with the [[dpCountsBounded]] cap upstream for
    * user-level. One hash aggregation. */
  def dpSums(df: DataFrame, valueCol: String, groupCols: Seq[String],
             lo: Double, hi: Double, epsilon: Double, seed: String): DataFrame = {
    require(lo < hi, s"need lo < hi: [$lo, $hi]")
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    val clipped = least(greatest(col(valueCol).cast("double"), lit(lo)), lit(hi))
    val vq = round(clipped * 1000000.0).cast("long")
    val key = concat(md5(lit(seed)), tupleKey(groupCols.map(col)))
    val u = (conv(substring(md5(key), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val shifted = u - lit(0.5)
    val noise = (lit(-(hi - lo)) / lit(epsilon)) * signum(shifted) *
      log(lit(1.0) - lit(2.0) * abs(shifted))
    df.select(groupCols.map(col) :+ vq.as("__v"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__v")).as("__s"))
      .select(groupCols.map(col) :+
        round(col("__s").cast("double") / 1000000.0 + noise, 6).as("noisy_sum"): _*)
  }
}
