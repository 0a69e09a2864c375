package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Deterministic distributed logistic regression: learnability on a
  * separable set, bit-exact partition invariance of the FIT (the exact-
  * integer gradient contract), and prediction sanity. */
class LogisticFitSpec extends SparkSpec {
  import spark.implicits._

  test("separable data: the fit finds the boundary (train accuracy 1.0)") {
    // centered feature (x in -10..10, boundary at 0) — plain batch GD on an
    // uncentered range oscillates for many iterations chasing the bias,
    // which is a property of GD, not of this implementation
    val df = (1 to 200).map(i => (i.toLong, i % 21 - 10, if (i % 21 - 10 > 0) 1 else 0))
      .toDF("id", "x", "y")
    val (w, preds) = Retrieval.logisticFit(df, Seq("x"), "id", "y",
      iters = 20, lrNum = 1, lrDen = 1)
    assert(w(1) > 0.0, s"slope must be positive: ${w.toSeq}")
    val acc = preds.filter(col("pred") === (col("y") === 1)).count().toDouble /
      preds.count()
    assert(acc == 1.0, s"separable set must fit exactly, got $acc")
  }

  test("the fit is bit-identical under adversarial repartitioning") {
    val df = (1 to 500).map(i =>
      (i.toLong, (i * 7919) % 37, (i * 104729) % 13, if ((i * 31) % 5 < 2) 1 else 0))
      .toDF("id", "x1", "x2", "y")
    val (w1, p1) = Retrieval.logisticFit(df.repartition(1), Seq("x1", "x2"),
      "id", "y", iters = 10, lrNum = 1, lrDen = 3)
    val (w13, p13) = Retrieval.logisticFit(df.repartition(13, col("id")),
      Seq("x1", "x2"), "id", "y", iters = 10, lrNum = 1, lrDen = 3)
    // exact double equality — the integer-gradient design, not a tolerance
    assert(w1.toSeq == w13.toSeq)
    assert(p1.orderBy(col("id")).collect().toSeq ==
      p13.orderBy(col("id")).collect().toSeq)
  }

  test("sparse fit: separable hashed-text set learns; the signal bucket gets the big weight") {
    val docs = ((1 to 100).map(i => (i.toLong, s"filler$i spam spam junk", 1)) ++
      (101 to 200).map(i => (i.toLong, s"filler$i clean text here", 0)))
      .toDF("doc_id", "text", "y")
    val labels = docs.select(col("doc_id"), col("y"))
    val feats = Retrieval.hashedTokenFeatures(docs, "text", "doc_id", 512)
    val (w, preds) = Retrieval.logisticFitSparse(feats, labels, "doc_id", "y",
      iters = 30, lrNum = 2, lrDen = 1)
    val acc = preds.filter(col("pred") === (col("y") === 1)).count().toDouble /
      preds.count()
    assert(acc == 1.0, s"separable set must fit exactly, got $acc")
    // the 'spam' bucket (cnt 2 in every positive, 0 in every negative) must
    // carry the largest positive non-bias weight
    val spamBucket = feats.join(docs.filter(col("doc_id") === 1L), Seq("doc_id"))
      .filter(col("cnt") === 2L).select(col("feature")).as[Long].head()
    val top = w.filter(col("feature") =!= -1L)
      .orderBy(col("wq").desc).select(col("feature")).as[Long].head()
    assert(top == spamBucket, s"expected bucket $spamBucket on top, got $top")
  }

  test("sparse fit is bit-identical under adversarial repartitioning") {
    val docs = (1 to 300).map(i =>
      (i.toLong, s"tok${i % 7} tok${(i * 13) % 11} tok${(i * 29) % 5}",
        if ((i * 31) % 5 < 2) 1 else 0))
      .toDF("doc_id", "text", "y")
    val labels = docs.select(col("doc_id"), col("y"))
    val feats = Retrieval.hashedTokenFeatures(docs, "text", "doc_id", 64)
    def run(f: org.apache.spark.sql.DataFrame): (Seq[(Long, Long)], Seq[String]) = {
      val (w, p) = Retrieval.logisticFitSparse(f, labels, "doc_id", "y",
        iters = 8, lrNum = 1, lrDen = 3)
      (w.select(col("feature"), col("wq")).as[(Long, Long)].collect().sortBy(_._1).toSeq,
        p.orderBy(col("doc_id")).collect().map(_.toString).toSeq)
    }
    val (w1, p1) = run(feats.repartition(1))
    val (w17, p17) = run(feats.repartition(17, col("feature")))
    // exact equality of the QUANTIZED weights — integer sums + scalar IEEE
    // updates leave partitioning no way in
    assert(w1 == w17)
    assert(p1 == p17)
  }

  test("predictions carry calibrated-ish probabilities (monotone in z)") {
    val df = (1 to 100).map(i => (i.toLong, i, if (i > 50) 1 else 0)).toDF("id", "x", "y")
    val (_, preds) = Retrieval.logisticFit(df, Seq("x"), "id", "y",
      iters = 20, lrNum = 1, lrDen = 1)
    val rows = preds.orderBy(col("z_r")).select(col("p_r")).collect().map(_.getDouble(0))
    assert(rows.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
  }
}
