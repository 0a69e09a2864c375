package graft.operators

import graft.functions.{SimilarityFunctions => S, TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every variant is a hash-partitioned groupBy or a bucket-join —
  * no cross join ever touches the full corpus. MinHash/SimHash candidate
  * generation explodes each doc into a bounded number of bucket keys, so the
  * shuffle volume is O(docs × bands), and within-bucket pairing is bounded by
  * bucket size; verification (exact Jaccard / hamming) runs only on candidate
  * pairs.
  */
object Dedup {

  /** Exact dedup: keep the first row (min of `idCol`) per exact value of
    * `keyCols`. One hash-partitioned aggregation; at 100 TB this is the plain
    * shuffle-on-content-hash dedup. Dedup on a long text column should pass
    * `sha2(col,256)` as the key to shrink shuffle rows. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Near-whitespace dedup via normalized-text fingerprint (SHA-256). */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("fingerprint", T.fingerprint(col(textCol)))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** MinHash+LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * shingle → minhash signature → band keys → self-join per bucket (id<id) →
    * distinct pairs → verify n-gram Jaccard ≥ threshold.
    *
    * Returns (idA, idB, jaccard). Both sides shuffle on the band bucket key —
    * never a full cross join. `shingleN`=word-shingle width; bands×rows = total
    * hashes.
    */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                   threshold: Double = 0.7): DataFrame = {
    // Shingles are verified as 64-bit hashes (same Jaccard modulo ~2^-64
    // collisions) so the band join shuffles only (band,bucket,id) — the heavy
    // shingle arrays are joined back exactly once per DISTINCT candidate pair,
    // not once per shared bucket.
    val hashed = df.select(col(idCol).as("id"),
        graft.functions.expressions.HashExpressions
          .hashed_shingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", S.minHashSignature(col("sh"), bands * rowsPerBand))
    val buckets = hashed
      .select(col("id"), explode(S.lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val candidates = buckets.alias("a")
      .join(buckets.alias("b"), Seq("band", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(hashed.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(hashed.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), S.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash dedup: drop every doc that near-dups an earlier (lower-id) doc.
    * Survivors = all ids minus the right side of candidate pairs. */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                   threshold: Double = 0.7): DataFrame = {
    val dupIds = minhashPairs(df, textCol, idCol, shingleN, bands, rowsPerBand, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup: 64-bit fingerprint; candidates share one of 4 16-bit
    * bands (tolerates hamming ≤ 3 by pigeonhole when split 4 ways); verified by
    * full hamming distance ≤ maxHamming. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"), S.simHash64(S.tokens(col(textCol))).as("fp"))
    val banded = fp.select(col("id"), col("fp"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), shiftright(col("fp"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("bk"))
      .select(col("id"), col("fp"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), S.hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Per-stage outcome of [[dedupPipeline]]. */
  case class DedupStage(stage: String, docsIn: Long, docsOut: Long)

  /** The standard document-dedup recipe, composed: exact text → normalized
    * fingerprint → MinHash near-dup, each stage feeding the survivors of the
    * previous (cheapest filters first, so the expensive LSH pass sees the
    * smallest corpus). Returns survivors plus a per-stage report. */
  def dedupPipeline(df: DataFrame, textCol: String, idCol: String,
                    shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                    threshold: Double = 0.7): (DataFrame, Seq[DedupStage]) = {
    val report = scala.collection.mutable.ListBuffer.empty[DedupStage]
    val n0 = df.count()

    val afterExact = df.join(
      df.groupBy(textCol).agg(min(col(idCol)).as(idCol)).drop(textCol)
        .select(col(idCol)), Seq(idCol), "left_semi")
    val n1 = afterExact.count()
    report += DedupStage("exact", n0, n1)

    val afterFp = afterExact.join(
      byFingerprint(afterExact, textCol, idCol).select(col(idCol)), Seq(idCol), "left_semi")
    val n2 = afterFp.count()
    report += DedupStage("fingerprint", n1, n2)

    val afterMinhash = minhashDedup(afterFp, textCol, idCol,
      shingleN, bands, rowsPerBand, threshold)
    val n3 = afterMinhash.count()
    report += DedupStage("minhash", n2, n3)

    (afterMinhash, report.toSeq)
  }

  /** Embedding-cosine near-dup pairs: LSH-bucketed by random-hyperplane sign
    * bits (shared deterministic planes), verified by exact cosine ≥ threshold.
    * Candidate generation is a bucket equi-join; no full cross join. */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            dim: Int, planes: Int = 12,
                            threshold: Double = 0.95): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", Ann.hyperplaneBucket(col("v"), dim, planes))
    val a = keyed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = keyed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), S.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
