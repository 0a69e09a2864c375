package graft

import graft.functions.{SimilarityFunctions => S}
import graft.operators.{Dedup, Retrieval, Sampling}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 additions: directed containment join, reciprocal-rank fusion,
  * stratified curriculum interleave. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- containment join

  test("containment: subset qualifies toward superset, not the reverse") {
    val docs = Seq(
      (1L, Seq("w", "x", "y", "z")),
      (2L, Seq("w", "x", "y", "z", "q", "r", "s", "t"))
    ).toDF("doc_id", "toks")
    val out = Dedup.containmentJoin(docs, "toks", "doc_id", Nil, 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // C(1→2) = 4/4 = 1.0 in; C(2→1) = 4/8 = 0.5 out
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("containment: exact-boundary pair (C = τ) is kept") {
    val docs = Seq(
      (1L, Seq("p", "q", "r", "s")),
      (2L, Seq("p", "q", "r", "zz"))
    ).toDF("doc_id", "toks")
    val out = Dedup.containmentJoin(docs, "toks", "doc_id", Nil, 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // both directions are 3/4 = 0.75 exactly
    assert(out.sorted.toSeq == Seq((1L, 2L, 0.75), (2L, 1L, 0.75)))
  }

  test("containment: prefix-filter result equals brute force on a corpus") {
    // deterministic pseudo-random token sets with planted subsets
    val base = (0L until 30L).map { i =>
      val toks = (0 until 12).map(j => s"t${(i * 7 + j * j) % 40}")
      (i, toks)
    }
    val planted = base.filter(_._1 % 5 == 0).map { case (i, toks) =>
      (i + 1000L, toks.take(8)) // 8 of its source's tokens
    }
    val df = (base ++ planted).toDF("doc_id", "toks")
    val fast = Dedup.containmentJoin(df, "toks", "doc_id", Nil, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over distinct sets
    val sets = (base ++ planted).map { case (i, t) => (i, t.distinct.toSet) }
    val truth = (for {
      (ia, ta) <- sets; (ib, tb) <- sets
      if ia != ib && ta.nonEmpty
      if ta.intersect(tb).size.toDouble / ta.size >= 0.7
    } yield (ia, ib)).toSet
    assert(fast == truth)
    assert(truth.nonEmpty) // planted subsets guarantee a non-vacuous check
  }

  test("containment plan: no cartesian/nested-loop pair generation") {
    val docs = Seq((1L, Seq("a", "b")), (2L, Seq("b", "c"))).toDF("doc_id", "toks")
    val p = Dedup.containmentJoin(docs, "toks", "doc_id", Nil, 0.8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  // --------------------------------------------------------- RRF fusion

  test("rrf: fused score sums 1/(c+rank) across legs; absent docs get one term") {
    val leg1 = Seq(("q", 1L, 1L), ("q", 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val leg2 = Seq(("q", 2L, 1L), ("q", 3L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(leg1, leg2), "query_id", "doc_id", "rank", k = 10)
      .orderBy(col("rank")).collect()
    def t(r: Long) = 1.0 / (60.0 + r)
    val expect = Map(1L -> t(1), 2L -> (t(2) + t(1)), 3L -> t(2))
      .map { case (k, v) => k -> math.rint(v * 1e9) / 1e9 }
    // doc 2 appears in both legs → highest fused score
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 1L, 3L))
    out.foreach(r => assert(r.getDouble(2) == expect(r.getLong(1))))
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
  }

  test("rrf: k caps the fused list; ties break by id ascending") {
    val leg1 = Seq(("q", 10L, 1L), ("q", 20L, 2L), ("q", 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val leg2 = Seq(("q", 20L, 1L), ("q", 10L, 2L), ("q", 40L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(leg1, leg2), "query_id", "doc_id", "rank", k = 3)
      .orderBy(col("rank")).collect()
    assert(out.length == 3)
    // docs 10 and 20 both score 1/61 + 1/62 → tie broken by doc_id
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 20L, 30L))
  }

  // ------------------------------------------- stratified interleave

  test("interleave: global_pos is a bijection matching the (pos, stratum) order") {
    val rows = (0L until 40L).map(i => (i, s"dom${i % 3}")) ++
      (100L until 104L).map(i => (i, "tiny")) // skewed 4th stratum
    val df = rows.toDF("id", "dom")
    val out = Sampling.stratifiedInterleave(df, "id", "dom", "s1")
    val got = out.orderBy(col("global_pos")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._4).toSeq == (0L until 44L).toSeq) // bijection onto [0, N)
    // closed form == literal global row_number over (pos, stratum)
    val literal = out
      .withColumn("gp2", row_number().over(
        Window.orderBy(col("pos"), col("dom"))).cast("long") - lit(1L))
      .filter(col("global_pos") =!= col("gp2")).count()
    assert(literal == 0L)
    // round-robin: the first 4 global positions hold one row of each stratum
    assert(got.take(4).map(_._2).sorted.toSeq == Seq("dom0", "dom1", "dom2", "tiny"))
  }

  // ------------------------------------------------------- HLL sketch

  test("hll: registers match hand-computed md5 bucket/rho; merge is partition-order independent") {
    import graft.functions.expressions.{SketchAggregates => SK}
    val toks = (0 until 500).map(i => s"tok$i")
    val df = toks.toDF("t")
    def regsOf(parts: Int) = df.repartition(parts)
      .agg(SK.hll_sketch(col("t"), 8)).collect()(0).getSeq[Int](0)
    val regs = regsOf(1)
    assert(regs == regsOf(7)) // merge-order independence
    // replay the exact register definition on the driver
    val expect = Array.fill(256)(0)
    toks.foreach { t =>
      val h = SK.md5Hash60(t)
      val bucket = (h >>> 52).toInt
      val w = h & ((1L << 52) - 1L)
      val rho = if (w == 0L) 53 else java.lang.Long.numberOfLeadingZeros(w) - 12 + 1
      if (rho > expect(bucket)) expect(bucket) = rho
    }
    assert(regs == expect.toSeq)
  }

  test("hll: estimate branches — linear counting at low cardinality, raw within 3σ at high") {
    import graft.functions.expressions.{SketchAggregates => SK}
    val small = (0 until 20).map(i => s"s$i").toDF("t")
      .agg(round(SK.hll_estimate(SK.hll_sketch(col("t"), 8), 8), 4))
      .collect()(0).getDouble(0)
    // 20 distinct → V zeros > 0 and raw tiny → m·ln(m/V) branch; the
    // correction is tight at this range: within ±2 of truth
    assert(math.abs(small - 20.0) < 2.0, s"small-range estimate $small")
    val n = 5000
    val big = (0 until n).map(i => s"b$i").toDF("t")
      .agg(SK.hll_estimate(SK.hll_sketch(col("t"), 8), 8))
      .collect()(0).getDouble(0)
    // σ = 1.04/√256 = 6.5%; 3σ = 19.5%
    assert(math.abs(big - n) / n < 0.195, s"raw estimate $big for $n")
  }

  test("hll: SQL registration builds the same sketch") {
    val df = (0 until 100).map(i => (s"v$i", i % 2)).toDF("t", "g")
    df.createOrReplaceTempView("hlltest")
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT g, hll_sketch(t, 8) AS r FROM hlltest GROUP BY g ORDER BY g")
      .collect().map(_.getSeq[Int](1))
    import graft.functions.expressions.{SketchAggregates => SK}
    val viaApi = df.groupBy(col("g")).agg(SK.hll_sketch(col("t"), 8).as("r"))
      .orderBy(col("g")).collect().map(_.getSeq[Int](1))
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("interleave: seeded determinism — same seed same order, new seed new order") {
    val df = (0L until 60L).map(i => (i, s"d${i % 2}")).toDF("id", "dom")
    def order(seed: String) = Sampling.stratifiedInterleave(df, "id", "dom", seed)
      .orderBy(col("global_pos")).collect().map(_.getLong(0)).toSeq
    val a = order("ep0")
    assert(a == order("ep0"))
    assert(a != order("ep1"))
  }
}
