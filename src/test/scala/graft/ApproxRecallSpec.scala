package graft

import org.apache.spark.sql.functions._

/** Recall contracts for the lossy regimes of the approximate family — the
  * oracle-green queries (q26/q27/q29/q41) pin the exactly-checkable regimes;
  * these assert the probabilistic ones against exact ground truth. */
class ApproxRecallSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Ann, Dedup}
  import graft.functions.{SimilarityFunctions => S}

  test("minhash lossy regime (t=0.5, 16x4): subset of exact pairs, recall bounded") {
    val docs = sf("documents").select(col("doc_id"), col("text"))
    val toks = docs.select(col("doc_id"),
      graft.functions.expressions.HashExpressions.hashed_shingles(col("text"), 2).as("sh"))
    val exact = Dedup.jaccardSelfJoin(toks, "sh", "doc_id", Seq.empty, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashPairs(docs, "text", "doc_id",
        shingleN = 2, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh.subsetOf(exact)) // exact verification => zero false positives
    assert(exact.nonEmpty)
    val recall = mh.size.toDouble / exact.size
    // per-pair catch prob at j=0.5 is 1-(1-0.5^4)^16 ~ 0.64 and rises
    // steeply with j; the corpus's near-dup pairs sit mostly well above 0.5
    assert(recall >= 0.6, s"recall $recall (${mh.size}/${exact.size})")
  }

  test("simhash hamming<=3 recall is EXACTLY 1 (4x16-bit pigeonhole)") {
    val docs = sf("documents").select(col("doc_id"), col("text"))
    val fps = docs.select(col("doc_id"), S.simHash64(S.tokens(col("text"))).as("fp"))
      .as[(Long, Long)].collect()
    val truth = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ia, ib)).toSet
    val got = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    assert(got == truth, // a pair within hamming 3 MUST share one of 4 bands
      s"missed=${(truth -- got).size} extra=${(got -- truth).size}")
  }

  test("lshTopK recall@5 vs brute force: planes knob trades recall for compute") {
    val emb = sf("embeddings")
    val q = emb.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"embedding")
    val exact = Ann.bruteForceTopK(emb, q, "embedding", "vec_id", "qid", 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def recallAt(planes: Int): Double = {
      val lsh = Ann.lshTopK(emb, q, "embedding", "vec_id", "qid",
          dim = 64, k = 5, planes = planes)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      lsh.intersect(exact).size.toDouble / exact.size
    }
    // natural neighbors here sit at cosine ~0.4 — the hard regime for
    // hyperplane LSH; fewer planes widen buckets and must raise recall
    val r4 = recallAt(4); val r8 = recallAt(8)
    assert(r4 >= 0.55, s"recall@planes=4 $r4")
    assert(r4 > r8, s"recall knob inverted: planes=4 $r4 <= planes=8 $r8")
  }
}
