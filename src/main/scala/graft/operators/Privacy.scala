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
    // localCheckpoint: `base` feeds four output branches (pass0 and,
    // through fail0, pass1/pass2) and `fail0` feeds three — without
    // materialization one action replays the input scan + md5 tuple keys
    // up to ~4-6x. Same eager-cut convention as cooccurrencePmi /
    // labelPropagation / the streaming gates.
    val base = df.select(rest.map(col) ++ exact ++ gen: _*)
      .withColumn("__k0", tupleKey(quasiCols.map(col)))
      .withColumn("__k1", tupleKey(quasiCols.map(c => col(s"__g_$c"))))
      .localCheckpoint(true)

    // group-count + equi-join on the tuple key, NOT a window: a window
    // over the whole frame shuffles AND SORTS every row per level; the
    // count frame is one narrow row per distinct tuple and joins back
    // with a hash join (null tuples handled by the key encoding)
    val cnt0 = base.groupBy(col("__k0")).agg(count(lit(1)).as("__n0"))
    val leveled0 = base.join(cnt0, Seq("__k0"))
    val pass0 = leveled0.filter(col("__n0") >= k)
      .select(rest.map(col) ++ quasiCols.map(col) :+ lit(0).as("anonymity_level"): _*)
    val fail0 = leveled0.filter(col("__n0") < k).localCheckpoint(true)

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
    * ε-differential-privacy counting MECHANISM (noise calibrated to
    * add/remove-one-row sensitivity 1), made reproducible: the noise is
    * Laplace(1/ε) via inverse-CDF over a uniform derived from
    * md5(seed | group values), so the same release run always publishes the
    * same numbers (and the oracle can replay them).
    *
    * The ε-DP guarantee holds ONLY under two deployment preconditions the
    * operator cannot enforce:
    *
    *  1. **Group keys must be PUBLIC** (a fixed, data-independent domain —
    *     e.g. an enum of event types, a country list). The release emits
    *     exactly the groups present in the data with no noisy-threshold
    *     partition selection, so when keys are derived from private data a
    *     group's presence/absence reveals one user's presence
    *     deterministically. For private key domains, pre-join against the
    *     public domain (releasing noisy zeros) or do thresholded partition
    *     selection upstream; this operator deliberately does not guess.
    *  2. **The seed must be SECRET and never reused** across releases of
    *     the same (or overlapping) data. The noise is a pure function of
    *     (seed, group), so anyone who learns the seed recovers exact
    *     counts, and two releases with one seed share draws (their
    *     difference is noiseless). A true DP deployment draws fresh secret
    *     randomness per release; determinism here trades that for
    *     auditability, the same posture as every seeded sampler in this
    *     engine.
    *
    * noisy = count − (1/ε)·sign(u−½)·ln(1−2·|u−½|),  u ∈ (0,1)
    *
    * One hash aggregation; the noise is a per-group scalar expression. */
  /** Deterministic Laplace(scale) draw keyed by the group tuple.
    * Injection-proof key ([[tupleKey]]): concat_ws would skip NULL group
    * values and has no delimiter escaping, so distinct groups like
    * (NULL,'en') vs ('en',NULL) — or ('a|b','c') vs ('a','b|c') — would
    * share one noise draw, and noisy_a − noisy_b would leak the exact true
    * difference, which is the attack ε-DP exists to prevent. The 32
    * hex-bit md5 prefix maps to a uniform in (0,1): (v + 0.5) / 2^32 never
    * hits the endpoints, so ln(1 − 2|u−½|) is finite. ONE implementation
    * for all three releases — the draw arithmetic is oracle-pinned and two
    * drifting copies could break one oracle while another stays green. */
  private def laplaceNoise(groupCols: Seq[String], seed: String,
                           scale: Double): Column = {
    val key = concat(md5(lit(seed)), tupleKey(groupCols.map(col)))
    val u = (conv(substring(md5(key), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val shifted = u - lit(0.5)
    lit(-scale) * signum(shifted) * log(lit(1.0) - lit(2.0) * abs(shifted))
  }

  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
               seed: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__true"))
      .select(groupCols.map(col) :+
        round(col("__true") + laplaceNoise(groupCols, seed, 1.0 / epsilon), 6)
          .as("noisy_count"): _*)
  }

  /** USER-LEVEL DP counting: [[dpCounts]] with BOTH contribution bounds —
    * the pieces row-level DP silently skips. Laplace(1/ε) calibrates to
    * sensitivity 1, i.e. ONE ROW per individual; a user contributing 500
    * rows to a group moves its count by 500, and a user touching 26 groups
    * moves 26 releases at once, so without bounding BOTH dimensions ε
    * means nothing. This variant (the standard recipe, e.g. Google's DP
    * library's max_contributions_per_partition × max_partitions_contributed):
    *   1. caps each user's rows per group at `maxPerUser`
    *      (min(n, maxPerUser) — no ordering needed, counts are
    *      row-interchangeable);
    *   2. caps the GROUPS a user contributes to at `maxGroupsPerUser`,
    *      keeping the user's groups with the lowest md5 rank
    *      (deterministic, replayable — which groups survive must not
    *      depend on partitioning);
    *   3. releases with Laplace(maxPerUser·maxGroupsPerUser/ε) — the L1
    *      sensitivity of the WHOLE release to one user, so the mechanism
    *      is user-level (not merely per-group) under the same
    *      public-group-keys + secret-unreused-seed preconditions
    *      documented on [[dpCounts]] (they apply verbatim here: groups a
    *      lone user creates still appear/vanish with that user).
    * Two hash aggregations + one per-user window over (user, group) rows
    * (one row per cell, never per event). */
  def dpCountsBounded(df: DataFrame, userCol: String, groupCols: Seq[String],
                      maxPerUser: Int, maxGroupsPerUser: Int,
                      epsilon: Double, seed: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(maxPerUser >= 1, s"maxPerUser must be >= 1: $maxPerUser")
    require(maxGroupsPerUser >= 1, s"maxGroupsPerUser must be >= 1: $maxGroupsPerUser")
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    import org.apache.spark.sql.expressions.Window
    val capped = df
      .groupBy(col(userCol) +: groupCols.map(col): _*)
      .agg(least(count(lit(1)), lit(maxPerUser.toLong)).as("__c"))
    val rk = md5(concat(md5(lit(seed)),
      tupleKey(col(userCol) +: groupCols.map(col))))
    val selected = capped
      .withColumn("__gr", row_number().over(Window.partitionBy(col(userCol))
        .orderBy(rk, tupleKey(groupCols.map(col)))))
      .filter(col("__gr") <= maxGroupsPerUser)
    val scale = maxPerUser.toDouble * maxGroupsPerUser / epsilon
    selected.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__c")).as("__true"))
      .select(groupCols.map(col) :+
        round(col("__true") + laplaceNoise(groupCols, seed, scale), 6)
          .as("noisy_count"): _*)
  }

  /** ε-DP SUM release with value clipping — the third member of the
    * release family (counts, bounded counts, sums): each row's value is
    * CLIPPED into [lo, hi] before summing (the sensitivity bound — without
    * it one outlier row moves the sum arbitrarily and ε is meaningless),
    * then Laplace(max(|lo|,|hi|)/ε) noise is added via the same
    * deterministic inverse-CDF draw. The scale is max(|lo|,|hi|), NOT
    * hi−lo: the family's adjacency is add/remove-one-row (dpCounts'
    * sensitivity-1 calibration assumes it), and adding or removing one
    * clipped row moves the sum by up to max(|lo|,|hi|) — for a range
    * excluding zero (say [100,200]) that is 200 while hi−lo is only 100,
    * so the hi−lo convention would under-noise 2×. (Same convention as
    * Google's DP library BoundedSum.) Values are quantized to 6dp scaled
    * longs so the clipped sum is exact and partition-order-independent;
    * row-level sensitivity — compose with the [[dpCountsBounded]] cap
    * upstream for user-level; [[dpCounts]]'s public-group-keys and
    * secret-seed preconditions apply verbatim. One hash aggregation. */
  def dpSums(df: DataFrame, valueCol: String, groupCols: Seq[String],
             lo: Double, hi: Double, epsilon: Double, seed: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(lo < hi, s"need lo < hi: [$lo, $hi]")
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    val clipped = least(greatest(col(valueCol).cast("double"), lit(lo)), lit(hi))
    val vq = round(clipped * 1000000.0).cast("long")
    df.select(groupCols.map(col) :+ vq.as("__v"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__v")).as("__s"))
      .select(groupCols.map(col) :+
        round(col("__s").cast("double") / 1000000.0 +
          laplaceNoise(groupCols, seed,
            math.max(math.abs(lo), math.abs(hi)) / epsilon), 6)
          .as("noisy_sum"): _*)
  }
}
