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

  test("PQ: encode is deterministic, codes in range; trained ADC recall@5 vs brute force") {
    val emb = sf("embeddings")
    val q = emb.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"embedding")
    val books = Ann.pqTrain(emb, "embedding", dim = 64, m = 16, k = 16, iters = 3)
    assert(books.length == 16 && books.forall(b => b.length == 16 && b.forall(_.length == 4)))
    val codes = Ann.pqEncode(emb, "embedding", books)
    val c = codes.select($"vec_id", $"code").as[(Long, Seq[Int])].collect()
    assert(c.forall(_._2.length == 16) && c.forall(_._2.forall(i => i >= 0 && i < 16)))
    // deterministic: a second encode produces identical codes
    val c2 = Ann.pqEncode(emb, "embedding", books)
      .select($"vec_id", $"code").as[(Long, Seq[Int])].collect()
    assert(c.sortBy(_._1).toSeq == c2.sortBy(_._1).toSeq)
    // ADC ranks by quantized L2; brute force ranks by cosine — vectors here
    // aren't normalized, so compare against exact EUCLIDEAN top-k ground truth
    val qv = q.select($"qid", $"embedding".as("__qv"))
    val exact = emb.select($"vec_id", $"embedding".as("__cv"))
      .join(broadcast(qv))
      .withColumn("d2", expr(
        "aggregate(zip_with(__qv, __cv, (a, b) -> CAST(a - b AS DOUBLE) * (a - b)), 0D, (acc, x) -> acc + x)"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"d2".asc, $"vec_id")))
      .filter($"rank" <= 5).select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val pq5 = Ann.pqTopK(codes, q, "embedding", "vec_id", "qid", books, k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall5 = pq5.intersect(exact).size.toDouble / exact.size
    // shortlist contract (the production shape: ADC shortlist -> exact
    // rerank): the exact top-5 must sit inside the PQ top-20 shortlist
    val pq20 = Ann.pqTopK(codes, q, "embedding", "vec_id", "qid", books, k = 20)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall20 = pq20.intersect(exact).size.toDouble / exact.size
    // 16 bytes per vector instead of 256 on a near-random unnormalized
    // corpus (the hard regime for PQ — no cluster structure to exploit)
    assert(recall5 >= 0.4, s"PQ direct recall@5 $recall5")
    assert(recall20 >= 0.8, s"PQ shortlist recall (exact top-5 in ADC top-20) $recall20")
    // the production read path: exact rerank of the ADC shortlist recovers
    // (at least) everything the shortlist contains, and must not fall below
    // the direct ADC ranking — rerank can only promote true neighbors.
    // Euclidean ground truth again (rerank here scores cosine; on this
    // unnormalized corpus compare via its own exact-cosine top-5)
    val exactCos = Ann.bruteForceTopK(emb, q, "embedding", "vec_id", "qid", 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val rr = Ann.pqTopKRerank(emb, codes, q, "embedding", "vec_id", "qid",
        books, k = 5, shortlist = 50)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val rrRecall = rr.intersect(exactCos).size.toDouble / exactCos.size
    assert(rrRecall >= 0.6, s"PQ rerank recall@5 $rrRecall")
  }

  test("IVF-PQ with full probe equals plain PQ ADC; partial probe is a subset ranking") {
    val emb = sf("embeddings")
    val q = emb.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding")
    val cents = Ann.trainIvfCentroids(emb, "embedding", nlist = 8)
    val books = Ann.pqTrain(emb, "embedding", dim = 64, m = 8, k = 16, iters = 2)
    val full = Ann.ivfPqTopK(emb, q, "embedding", "vec_id", "qid",
        cents, books, k = 5, nprobe = 8) // probe EVERY list
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val plain = Ann.pqTopK(Ann.pqEncode(emb, "embedding", books), q,
        "embedding", "vec_id", "qid", books, k = 5)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    // probing all lists = no candidate is routed away -> identical ranking
    assert(full == plain)
    // partial probe must return ONLY members of the query's nprobe nearest
    // lists — verify routing against a driver-side recomputation of both
    // the probe sets (max-dot over centroids, ties by index, same order as
    // probeListsColumn) and each corpus vector's assigned list
    import graft.functions.expressions.HashExpressions.nearest_centroid
    def dot(v: Seq[Float], c: Array[Double]) =
      v.iterator.zip(c.iterator).map { case (a, b) => a * b }.sum
    val qVecs = q.select($"qid", $"embedding").as[(Long, Seq[Float])].collect()
    val probed: Map[Long, Set[Int]] = qVecs.map { case (qid, v) =>
      qid -> cents.indices.sortBy(i => (-dot(v, cents(i)), i)).take(2).toSet
    }.toMap
    val assignedList = emb.select($"vec_id",
        nearest_centroid($"embedding", cents).as("l"))
      .as[(Long, Int)].collect().toMap
    val part = Ann.ivfPqTopK(emb, q, "embedding", "vec_id", "qid",
        cents, books, k = 5, nprobe = 2)
      .select($"qid", $"vec_id", $"rank", $"adc").as[(Long, Long, Int, Double)].collect()
    assert(part.nonEmpty)
    part.foreach { case (qid, vid, _, _) =>
      assert(probed(qid).contains(assignedList(vid)),
        s"query $qid returned vec $vid from unprobed list ${assignedList(vid)}")
    }
    // and ADC is non-decreasing in rank per query
    assert(part.groupBy(_._1).forall { case (_, rows) =>
      rows.sortBy(_._3).map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1))
    })
  }
}
