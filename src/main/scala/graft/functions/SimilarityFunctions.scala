package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity primitives: Jaro-Winkler (entity match, fuzzy mapping), MinHash /
  * SimHash / n-gram Jaccard (dedup), cosine (embedding near-dup + ANN).
  *
  * Everything that runs per-row at scale is a codegen'd expression — either a
  * built-in / higher-order-function composition or a native Catalyst kernel
  * (graft.functions.expressions) for the shapes built-ins can't express
  * (Jaro-Winkler, SimHash, minhash signatures, shingle hashing, dot products).
  * Zero Scala UDFs remain on any hot path.
  */
object SimilarityFunctions {

  // ---------------------------------------------------------------- Jaro-Winkler

  /** Standard Jaro similarity in [0,1]. */
  def jaro(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val (a, b) = (s1, s2)
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(a.length, b.length) / 2 - 1
    val aMatched = new Array[Boolean](a.length)
    val bMatched = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatched(j) && a(i) == b(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a(i) != b(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions = floor(mismatched-position count / 2) — the Commons/
    // DuckDB convention (standard Jaro uses the exact half; they differ only
    // when the mismatch count is odd).
    (m / a.length + m / b.length + (m - transpositions / 2) / m) / 3.0
  }

  /** Jaro-Winkler: Jaro boosted by shared prefix (≤4 chars, scale 0.1). The
    * boost applies only when jaro > `boostThreshold` (0.7 default — the classic
    * Winkler definition, matching DuckDB's jaro_winkler_similarity; the
    * reference's match thresholds are ≥0.85 where the gate is irrelevant).
    * Ref use: etl_consume_entity_match.py:198-283. */
  def jaroWinkler(s1: String, s2: String, boostThreshold: Double = 0.7): Double = {
    val j = jaro(s1, s2)
    if (j <= boostThreshold) return j
    val maxPrefix = math.min(4, math.min(s1.length, s2.length))
    var l = 0
    while (l < maxPrefix && s1(l) == s2(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Native codegen expression ([[graft.functions.expressions]]); the SQL
    * name is injected by GraftExtensions. */
  def jaro_winkler(a: Column, b: Column): Column =
    graft.functions.expressions.HashExpressions.jaro_winkler(a, b)

  // ------------------------------------------------------------------- Shingles

  /** Lowercased whitespace tokens (full-whitespace trim — Spark's trim
    * strips only ' ', and a leading tab would yield a phantom empty token). */
  def tokens(c: Column): Column = {
    val t = graft.functions.TextFunctions.wsTrim(lower(c))
    when(t === "", array().cast(ArrayType(StringType))).otherwise(split(t, "\\s+"))
  }

  /** Word n-gram shingles as strings ("w1 w2 ... wn"), distinct, first-
    * occurrence order — the codegen'd [[graft.functions.expressions.Kernels
    * .shingleStrings]] kernel. The original HOF form (transform over
    * sequence, slice+array_join per position) re-evaluated the token split
    * per ELEMENT — Catalyst does no CSE across lambda boundaries — and was
    * measured at ~10 s for a 5k-doc corpus build (the q107/q95 lesson, again:
    * no interpreted HOF on a hot path). NULL text → NULL (nullIntolerant),
    * matching the old when()-guard behavior for non-null inputs. */
  def wordShingles(c: Column, n: Int): Column =
    graft.functions.expressions.HashExpressions.shingle_strings(c, n)

  /** n-gram Jaccard similarity between two already-computed shingle arrays —
    * native one-pass kernel (no intersection-array allocation; the verify hot
    * path of the similarity joins); [[jaccardHof]] kept as the value
    * cross-check. The when() guard handles nulls EXPLICITLY so the top-level
    * expression is not null-intolerant: otherwise InferFiltersFromConstraints
    * pushes an isnotnull(<whole shingle expression>) predicate below the
    * projection and the O(text) shingle kernel runs twice per row. */
  def jaccard(a: Column, b: Column): Column =
    when(a.isNull.or(b.isNull), lit(null).cast(DoubleType))
      .otherwise(graft.functions.expressions.HashExpressions.jaccard(a, b))

  /** HOF formulation of [[jaccard]] — spec cross-check only. */
  def jaccardHof(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val uni = size(a) + size(b) - size(array_intersect(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter / uni.cast(DoubleType))
  }

  // -------------------------------------------------------------------- MinHash

  /** Deterministic per-permutation hash parameters (LCG from a fixed seed);
    * values in [1, 2^31) so a*h+b stays < 2^63 (no ANSI overflow). */
  private def minhashParams(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; math.abs(x % 2147483629L) + 1 }
    Seq.fill(numHashes)((next(), next()))
  }

  /** MinHash signature (array of `numHashes` longs) over a shingle array.
    * h_i(x) = (a_i * (xxhash64(x) mod p) + b_i) mod p with p = 2^31-1; 31-bit
    * domain keeps the universal-hash multiply inside a long. Empty shingle
    * set → signature of p (sentinel max). Delegates to the native Catalyst
    * expression (one array scan); [[minHashSignatureHof]] is the pure-built-in
    * formulation kept for cross-checking. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.expressions.HashExpressions.minhash_signature(shingles, numHashes)

  def minHashSignatureHof(shingles: Column, numHashes: Int): Column = {
    val p = 2147483647L // 2^31-1
    val sigs = minhashParams(numHashes).map { case (a, b) =>
      coalesce(
        array_min(transform(shingles, s => pmod(pmod(xxhash64(s), lit(p)) * a + b, lit(p)))),
        lit(p))
    }
    array(sigs: _*)
  }

  /** LSH band keys from a signature: split into `bands` bands of `rowsPerBand`
    * and hash each band; a doc lands in `bands` buckets. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(array_join(slice(signature, b * rowsPerBand + 1, rowsPerBand), ",")).as("bucket"))
    }: _*)

  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * components. */
  def minhashJaccardEstimate(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast(DoubleType) /
      size(sigA).cast(DoubleType)

  // -------------------------------------------------------------------- SimHash

  /** 64-bit SimHash over tokens: per-token xxhash64; each bit position
    * accumulates +1/-1 by bit value; sign → fingerprint bit. Delegates to the
    * native Catalyst expression (one array scan); [[simHash64Hof]] is the
    * pure-built-in formulation kept for cross-checking. */
  def simHash64(tokensCol: Column): Column =
    graft.functions.expressions.HashExpressions.simhash64(tokensCol)

  def simHash64Hof(tokensCol: Column): Column = {
    val hs = transform(tokensCol, t => xxhash64(t))
    val bitCols = (0 until 64).map { b =>
      val vote = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // --------------------------------------------------------------------- Cosine

  /** Dot product of two float/double-array columns (computed in double,
    * sequential order). Native expression; [[dotHof]] is the built-in
    * formulation (bit-identical result) kept for cross-checking. */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.HashExpressions.dot_product(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two vector columns; 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }
}
