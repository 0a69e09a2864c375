package graft

import graft.functions.expressions.{KllBuffer, SketchAggregates => SK}
import org.apache.spark.sql.functions._

/** KLL quantile sketch: exact-regime identity, deterministic rank-error
  * bound, partition invariance (exact regime), merge associativity, and the
  * SQL registration path. */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: n < k → sketch is the sorted value list, quantiles exact") {
    val n = 500
    val vals = (0 until n).map(i => ((i * 7919) % n).toDouble) // permutation
    val df = vals.toDF("v")
    val sk = df.agg(SK.kll_sketch(col("v"), 1024).as("sk"))
    val pairs = sk.select(col("sk")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(_.getDouble(0)) == vals.sorted)
    assert(pairs.forall(_.getLong(1) == 1L))
    val sorted = vals.sorted
    Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0).foreach { q =>
      val got = sk.select(SK.kll_quantile(col("sk"), q)).head().getDouble(0)
      val target = math.min(math.floor(q * n).toLong + 1, n.toLong)
      assert(got == sorted((target - 1).toInt), s"q=$q")
    }
  }

  test("exact regime is partition-invariant bit-for-bit") {
    val df = (0 until 800).map(i => ((i * 5923) % 800).toDouble).toDF("v")
    val a = df.repartition(1).agg(SK.kll_sketch(col("v"), 1024)).head()
    val b = df.repartition(13).agg(SK.kll_sketch(col("v"), 1024)).head()
    assert(a == b)
  }

  test("deterministic rank-error bound holds at 100k values, k=200") {
    // direct driver-side exercise of the compactor ladder: a fixed
    // pseudo-random insertion order over 0..n-1, so the assertion pins a
    // DETERMINISTIC algorithm on DETERMINISTIC data (no flake margin needed)
    val n = 100000
    val b = new KllBuffer(200)
    var x = 1L
    val seen = new Array[Double](n)
    (0 until n).foreach { i =>
      x = (x * 6364136223846793005L + 1442695040888963407L) // LCG, full period
      val v = ((x >>> 16) % n + n) % n
      seen(i) = v.toDouble
      b.add(v.toDouble)
    }
    java.util.Arrays.sort(seen)
    val pairs = b.flattenSorted()
    val total = pairs.map(_._2).sum
    assert(total <= n, "compaction must never inflate total weight")
    // for each q: the estimated value's TRUE rank must sit within eps*n of
    // the target rank. MRL/KLL fixed-k theory gives O(log^2(n/k)/k); the
    // empirical error here is ~0.5% — assert 2.5% as a stable ceiling.
    val eps = 0.025
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { q =>
      val target = math.min(math.floor(q * total).toLong + 1, total)
      var cum = 0L
      var est = Double.NaN
      pairs.iterator.takeWhile(_ => cum < target).foreach { case (v, w) =>
        cum += w; est = v
      }
      // true rank of est within the full data (count of values <= est)
      val trueRank = {
        var lo = 0; var hi = n
        while (lo < hi) { val m = (lo + hi) / 2; if (seen(m) <= est) lo = m + 1 else hi = m }
        lo
      }
      val targetTrue = math.min(math.floor(q * n).toLong + 1, n.toLong)
      assert(math.abs(trueRank - targetTrue) <= eps * n,
        s"q=$q est=$est trueRank=$trueRank target=$targetTrue")
    }
  }

  test("merge of disjoint halves equals whole in the exact regime") {
    val a = new KllBuffer(512)
    val b = new KllBuffer(512)
    val whole = new KllBuffer(512)
    (0 until 200).foreach { i =>
      val v = ((i * 131) % 200).toDouble
      whole.add(v)
      if (i % 2 == 0) a.add(v) else b.add(v)
    }
    a.mergeIn(b)
    assert(a.flattenSorted().toSeq == whole.flattenSorted().toSeq)
  }

  test("serialization round-trips the ladder (levels + parity)") {
    val b = new KllBuffer(16)
    (0 until 5000).foreach(i => b.add(((i * 37) % 977).toDouble))
    val r = KllBuffer.fromBytes(16, b.toBytes)
    assert(r.flattenSorted().toSeq == b.flattenSorted().toSeq)
    // parity survives: further identical adds keep the two in lockstep
    (0 until 500).foreach { i => b.add(i.toDouble); r.add(i.toDouble) }
    assert(r.flattenSorted().toSeq == b.flattenSorted().toSeq)
  }

  test("SQL registration: kll_sketch usable from plain SQL") {
    GraftExtensions.register(spark)
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("kll_in")
    val est = spark.sql(
      "SELECT kll_sketch(v, 64) AS sk FROM kll_in")
      .select(SK.kll_quantile(col("sk"), 0.5)).head().getDouble(0)
    assert(est == 51.0) // target = floor(0.5*100)+1 = 51st of 1..100
  }

  test("sketchQuantiles: exact regime matches per-group order statistics") {
    val docs = sf("documents").select(col("lang"), col("n_chars"))
    val got = graft.operators.CorpusStats
      .sketchQuantiles(docs, "n_chars", Seq("lang"),
        Seq(("p50", 0.5), ("p90", 0.9)), k = 4096)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val truth = docs.collect().groupBy(_.getString(0)).map { case (lang, rows) =>
      val vs = rows.map(_.getLong(1).toDouble).sorted
      def at(q: Double) = vs(math.min(math.floor(q * vs.length).toInt, vs.length - 1))
      lang -> ((vs.length.toLong, at(0.5), at(0.9)))
    }
    assert(got == truth)
  }

  test("integer inputs just work; string and array inputs fail at analysis") {
    GraftExtensions.register(spark)
    (1 to 100).toDF("n").createOrReplaceTempView("kll_int_in")
    val est = spark.sql("SELECT kll_sketch(n, 64) AS sk FROM kll_int_in")
      .select(SK.kll_quantile(col("sk"), 0.5)).head().getDouble(0)
    assert(est == 51.0)
    // strings must NOT silently coerce (non-numeric values would become
    // skipped nulls — a garbage sketch with no error anywhere)
    Seq("a", "b").toDF("s").createOrReplaceTempView("kll_bad")
    val es = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kll_sketch(s, 64) FROM kll_bad").collect()
    }
    assert(es.getMessage.toLowerCase.contains("numeric"))
    Seq(Seq(1.0), Seq(2.0)).toDF("a").createOrReplaceTempView("kll_bad2")
    val ea = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kll_sketch(a, 64) FROM kll_bad2").collect()
    }
    assert(ea.getMessage.toLowerCase.contains("numeric"))
  }

  test("nulls are skipped; weights stay powers of two") {
    val df = Seq[java.lang.Double](1.0, null, 2.0, null, 3.0).toDF("v")
    val pairs = df.agg(SK.kll_sketch(col("v"), 8).as("sk"))
      .select(col("sk")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(_.getDouble(0)) == Seq(1.0, 2.0, 3.0))
  }
}
