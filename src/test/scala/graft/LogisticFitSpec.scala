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

  test("predictions carry calibrated-ish probabilities (monotone in z)") {
    val df = (1 to 100).map(i => (i.toLong, i, if (i > 50) 1 else 0)).toDF("id", "x", "y")
    val (_, preds) = Retrieval.logisticFit(df, Seq("x"), "id", "y",
      iters = 20, lrNum = 1, lrDen = 1)
    val rows = preds.orderBy(col("z_r")).select(col("p_r")).collect().map(_.getDouble(0))
    assert(rows.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
  }
}
