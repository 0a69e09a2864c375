package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index (Ann.ivfPqIndex / ivfPqAppend / ivfPqSearch /
  * model frame round-trip): the retrieval analog of minhashIndex — build
  * once, append encode-only, search codes-only. */
class AnnIndexSpec extends SparkSpec {

  private lazy val emb = sf("embeddings").select(col("vec_id"), col("embedding"))
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding"))

  private def fixedModel() = {
    val centroids =
      graft.functions.expressions.HashExpressions.fixedCentroids(100, 16, 64)
    val fc = graft.functions.expressions.HashExpressions.fixedCentroids(200, 128, 8)
    (centroids, Array.tabulate(8)(j => fc.slice(j * 16, j * 16 + 16)))
  }

  test("model frame round-trip is exact (doubles bit-preserved, order restored)") {
    val (cs, cb) = fixedModel()
    val (cs2, cb2) = Ann.ivfPqModelFromDf(Ann.ivfPqModelToDf(spark, cs, cb))
    assert(cs2.length == cs.length && cs2.zip(cs).forall { case (a, b) => a.sameElements(b) })
    assert(cb2.length == cb.length && cb2.zip(cb).forall { case (a, b) =>
      a.length == b.length && a.zip(b).forall { case (x, y) => x.sameElements(y) } })
  }

  test("build(A) then append(B) equals the one-shot index over A∪B") {
    val (cs, cb) = fixedModel()
    val a = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val b = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val appended = Ann.ivfPqAppend(
      Ann.ivfPqIndex(a, "embedding", "vec_id", cs, cb),
      b, "embedding", "vec_id", cs, cb)
    val oneShot = Ann.ivfPqIndex(emb, "embedding", "vec_id", cs, cb)
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(key(appended) == key(oneShot))
  }

  test("search over appended index equals from-scratch ivfPqTopK (same model)") {
    val (cs, cb) = fixedModel()
    val appended = Ann.ivfPqAppend(
      Ann.ivfPqIndex(emb.filter(pmod(col("vec_id"), lit(2)) === 0),
        "embedding", "vec_id", cs, cb),
      emb.filter(pmod(col("vec_id"), lit(2)) === 1), "embedding", "vec_id", cs, cb)
    val viaIndex = Ann.ivfPqSearch(appended, queries, "embedding", "vec_id",
      "query_id", cs, cb, k = 10, nprobe = 4)
    val scratch = Ann.ivfPqTopK(emb, queries, "embedding", "vec_id",
      "query_id", cs, cb, k = 10, nprobe = 4)
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(key(viaIndex) == key(scratch))
  }

  test("index and model round-trip through parquet: search from disk is identical") {
    val (cs, cb) = fixedModel()
    val base = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    Ann.ivfPqIndex(emb, "embedding", "vec_id", cs, cb)
      .write.mode("overwrite").parquet(s"$base/index")
    Ann.ivfPqModelToDf(spark, cs, cb).write.mode("overwrite").parquet(s"$base/model")
    val (cs2, cb2) = Ann.ivfPqModelFromDf(spark.read.parquet(s"$base/model"))
    val fromDisk = Ann.ivfPqSearch(spark.read.parquet(s"$base/index"), queries,
      "embedding", "vec_id", "query_id", cs2, cb2, k = 10, nprobe = 4)
    val fromMem = Ann.ivfPqTopK(emb, queries, "embedding", "vec_id",
      "query_id", cs, cb, k = 10, nprobe = 4)
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(key(fromDisk) == key(fromMem))
  }

  test("SemDeDup over the index: tau=inf reduces to semanticDedupPairs; SDC filter is monotone") {
    import graft.operators.Dedup
    val (cs, cb) = fixedModel()
    val idx = Ann.ivfPqIndex(emb, "embedding", "vec_id", cs, cb)
    def pairsAt(tau: Double): Set[(Long, Long)] =
      Dedup.semanticDedupPairsIndexed(idx, emb, "embedding", "vec_id", cb,
          sdcMax = tau, threshold = 0.2, maxBucketSize = 1 << 20)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val unfiltered = pairsAt(Double.MaxValue)
    val plain = Dedup.semanticDedupPairs(emb, "embedding", "vec_id", cs,
        threshold = 0.2, maxBucketSize = 1 << 20)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the index's inverted list IS the nearest-centroid cluster: with the
    // prefilter open, the codes-first path must equal the raw-vector path
    assert(unfiltered == plain)
    val mid = pairsAt(80.0)
    val tight = pairsAt(40.0)
    assert(tight.subsetOf(mid) && mid.subsetOf(unfiltered),
      "SDC prefilter must be monotone in tau")
    assert(mid.nonEmpty && mid.size < unfiltered.size,
      s"tau=80 must bite in this regime (${mid.size} of ${unfiltered.size})")
  }

  test("stale-model append: recall vs brute force within 0.15 of a full retrain") {
    // model TRAINED on the initial half only, the batch encoded under it —
    // the honest daily shape. Recall@10 against exact brute force must stay
    // within 0.15 of the from-scratch retrain over the union (the codebook-
    // drift cost on this distribution); a periodic rebuild is the remedy.
    val a = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val b = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val csA = Ann.trainIvfCentroids(a, "embedding", nlist = 8, sampleSize = 256, iters = 4)
    val cbA = Ann.pqTrain(a, "embedding", dim = 64, m = 8, k = 16,
      iters = 3, sampleSize = 256)
    val csU = Ann.trainIvfCentroids(emb, "embedding", nlist = 8, sampleSize = 256, iters = 4)
    val cbU = Ann.pqTrain(emb, "embedding", dim = 64, m = 8, k = 16,
      iters = 3, sampleSize = 256)
    val appended = Ann.ivfPqAppend(
      Ann.ivfPqIndex(a, "embedding", "vec_id", csA, cbA),
      b, "embedding", "vec_id", csA, cbA)
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Ann.bruteForceTopK(emb, queries, "embedding", "vec_id",
      "query_id", k = 10))
    // nprobe = nlist: every list probed, so the comparison isolates CODEBOOK
    // staleness (the append-path drift term) from IVF routing loss — on the
    // near-unclusterable synthetic embeddings, routing recall at small
    // nprobe is noise-dominated and would swamp the signal being pinned
    val stale = hits(Ann.ivfPqSearch(appended, queries, "embedding", "vec_id",
      "query_id", csA, cbA, k = 10, nprobe = 8))
    val fresh = hits(Ann.ivfPqTopK(emb, queries, "embedding", "vec_id",
      "query_id", csU, cbU, k = 10, nprobe = 8))
    val recallStale = (stale & truth).size.toDouble / truth.size
    val recallFresh = (fresh & truth).size.toDouble / truth.size
    assert(recallStale >= recallFresh - 0.15,
      s"stale-model recall $recallStale collapsed vs retrain $recallFresh")
    assert(recallStale >= 0.3, s"stale-model recall $recallStale below floor")
  }

  test("marginMine: matches a plain-Scala margin reference; hub-normalized; leg-agnostic") {
    import spark.implicits._
    val x = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val y = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val got = Ann.marginMine(x, y, "embedding", "vec_id", k = 4, threshold = 1.02)
      .select("x_id", "y_id", "cosine", "margin")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

    // independent plain-Scala reference over the collected vectors
    def vecs(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }
    val xv = vecs(x); val yv = vecs(y)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def topk(qs: Array[(Long, Array[Double])], cs: Array[(Long, Array[Double])]) =
      qs.map { case (qid, qv) =>
        qid -> cs.map { case (cid, cv) => (cid, cos(qv, cv)) }
          .sortBy { case (cid, c) => (-c, cid) }.take(4)
      }.toMap
    val xk = topk(xv, yv); val yk = topk(yv, xv)
    val ax = xk.view.mapValues(l => l.map(_._2).sum / l.size).toMap
    val ay = yk.view.mapValues(l => l.map(_._2).sum / l.size).toMap
    val expect = xk.flatMap { case (xid, nn) =>
      val (yid, c) = nn.head
      val m = c / (ax(xid) / 2 + ay(yid) / 2)
      if (BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 1.02)
        Some(xid -> ((xid, yid, c, m))) else None
    }
    assert(got.keySet == expect.keySet,
      s"pair sets differ: only-got=${(got.keySet -- expect.keySet).take(3)} " +
        s"only-ref=${(expect.keySet -- got.keySet).take(3)}")
    got.foreach { case (xid, (_, yid, c, m)) =>
      assert(yid == expect(xid)._2 && math.abs(c - expect(xid)._3) < 1e-9 &&
        math.abs(m - expect(xid)._4) < 1e-9, s"x $xid")
    }
    // every mined y is its x's top-1, and margin demotes raw cosine: some
    // top-1 pairs must FAIL the margin cut (otherwise the ratio is inert)
    assert(got.nonEmpty && got.size < xv.length)

    // leg-agnostic: explicit brute-force legs through marginFromKnn are
    // identical to the convenience wrapper
    val qx = x.select(col("vec_id").as("__qid"), col("embedding"))
    val qy = y.select(col("vec_id").as("__qid"), col("embedding"))
    val viaLegs = Ann.marginFromKnn(
      Ann.bruteForceTopK(y, qx, "embedding", "vec_id", "__qid", 4),
      Ann.bruteForceTopK(x, qy, "embedding", "vec_id", "__qid", 4),
      "__qid", "vec_id", threshold = 1.02)
      .select("x_id", "y_id", "cosine", "margin")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(viaLegs == got)
  }

  test("marginFromKnn: a leg not covering a top-1 neighbor fails loudly; requireCoverage=false null-propagates") {
    import spark.implicits._
    val x = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val y = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val qx = x.select(col("vec_id").as("__qid"), col("embedding"))
    val qy = y.select(col("vec_id").as("__qid"), col("embedding"))
    val xy = Ann.bruteForceTopK(y, qx, "embedding", "vec_id", "__qid", 4)
    val yxFull = Ann.bruteForceTopK(x, qy, "embedding", "vec_id", "__qid", 4)
    // drop some y ids from the Y→X leg — the filtered/truncated-index shape
    val someTop1 = xy.filter(col("rank") === 1).select(col("vec_id")).limit(2)
      .as[Long].collect().toSet
    assert(someTop1.nonEmpty)
    val yxHoley = yxFull.filter(!col("__qid").isin(someTop1.toSeq: _*))
    val e = intercept[Exception] {
      Ann.marginFromKnn(xy, yxHoley, "__qid", "vec_id", threshold = 1.02).collect()
    }
    assert(e.getMessage != null || e.getCause != null) // Spark wraps raise_error
    // null-propagation path: mismatched pairs surface with a NULL margin
    // instead of silently vanishing; covered pairs are unchanged
    val lenient = Ann.marginFromKnn(xy, yxHoley, "__qid", "vec_id",
        threshold = 1.02, requireCoverage = false)
    val nullRows = lenient.filter(col("margin").isNull)
      .select(col("y_id")).as[Long].collect().toSet
    assert(nullRows == someTop1,
      s"every uncovered top-1 pair must surface as a null-margin row: $nullRows vs $someTop1")
    val strictFull = Ann.marginFromKnn(xy, yxFull, "__qid", "vec_id", threshold = 1.02)
      .select("x_id", "y_id").as[(Long, Long)].collect().toSet
    val lenientCovered = lenient.filter(col("margin").isNotNull)
      .select("x_id", "y_id").as[(Long, Long)].collect().toSet
    assert(lenientCovered == strictFull.filterNot(p => someTop1.contains(p._2)))
  }
}
