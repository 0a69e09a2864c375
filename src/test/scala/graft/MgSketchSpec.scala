package graft

import graft.functions.expressions.{SketchAggregates => SK}
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: exact-regime identity, the deterministic
  * n/(k+1) undercount bound in the lossy regime, survival of truly frequent
  * keys under any merge tree, and SQL registration. */
class MgSketchSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame, k: Int): Seq[(String, Long)] =
    df.agg(SK.mg_sketch(col("t"), k).as("sk")).select(col("sk"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))

  test("exact regime: distinct <= k -> the sketch IS the count table") {
    val df = Seq.tabulate(300)(i => s"t${i % 7}").toDF("t")
    val got = pairs(df, 16)
    // 300 rows over 7 keys: t0,t1 get 43; t2..t6 get 42... compute exactly
    val truth = (0 until 7).map(i => s"t$i" -> (0 until 300).count(_ % 7 == i).toLong)
      .sortBy { case (t, c) => (-c, t) }
    assert(got == truth)
  }

  test("exact regime is partition-invariant") {
    val df = Seq.tabulate(500)(i => s"k${(i * 31) % 11}").toDF("t")
    val a = df.repartition(1).agg(SK.mg_sketch(col("t"), 32)).head()
    val b = df.repartition(13).agg(SK.mg_sketch(col("t"), 32)).head()
    assert(a == b)
  }

  test("lossy regime: undercount bounded by n/(k+1); hot keys never evicted") {
    // 10k rows: one hot key at 15%, one at 5%, the rest a long tail of
    // near-unique keys. k=64 -> bound n/(k+1) = 154 -> both hot keys MUST
    // survive (1500, 500 > 154) with counts within the bound.
    val n = 10000
    val rows = (0 until n).map { i =>
      if (i % 20 < 3) "hot_a" else if (i % 20 == 3) "hot_b" else s"tail_${i}"
    }
    val df = rows.toDF("t")
    val got = pairs(df, 64).toMap
    val bound = n / 65
    assert(got.contains("hot_a") && got.contains("hot_b"))
    assert(got("hot_a") <= 1500 && got("hot_a") >= 1500 - bound, s"got ${got("hot_a")}")
    assert(got("hot_b") <= 500 && got("hot_b") >= 500 - bound, s"got ${got("hot_b")}")
    assert(got.size <= 64)
    // estimates are LOWER bounds for every surviving key
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (t, c) => assert(c <= truth(t), s"$t overcounted") }
  }

  test("merge of disjoint halves equals whole in the exact regime") {
    val whole = Seq.tabulate(400)(i => s"m${i % 9}").toDF("t")
    val half1 = Seq.tabulate(200)(i => s"m${i % 9}").toDF("t")
    val half2 = Seq.tabulate(200)(i => s"m${(i + 200) % 9}").toDF("t")
    val merged = half1.unionByName(half2)
    assert(pairs(merged, 16) == pairs(whole, 16))
  }

  test("count ties break in UTF-8 binary (code-point) order, not UTF-16") {
    // U+FF21 FULLWIDTH A (BMP, utf16 0xFF21) vs U+1D400 MATHEMATICAL BOLD A
    // (supplementary, utf16 surrogate pair starting 0xD835): code-point
    // order puts U+FF21 FIRST, UTF-16 code-unit order puts it LAST — the
    // exact divergence the DuckDB oracle would trip on.
    val bmp = "Ａ"
    val supp = new String(Character.toChars(0x1D400))
    assert(bmp.compareTo(supp) > 0, "fixture must diverge: UTF-16 says bmp > supp")
    val got = pairs(Seq(bmp, supp, bmp, supp).toDF("t"), 8)
    assert(got == Seq((bmp, 2L), (supp, 2L)), s"got $got")
  }

  test("wrong-typed SQL call fails at analysis, not with an executor CCE") {
    GraftExtensions.register(spark)
    Seq(1, 2, 2, 3).toDF("n").createOrReplaceTempView("mg_bad")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT mg_sketch(n, 8) FROM mg_bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  test("SQL registration: mg_sketch from plain SQL") {
    GraftExtensions.register(spark)
    Seq("a", "a", "b", "a", "c", "b").toDF("t").createOrReplaceTempView("mg_in")
    val top = spark.sql("SELECT mg_sketch(t, 8) AS sk FROM mg_in")
      .select(element_at(col("sk"), 1)).head().getStruct(0)
    assert(top.getString(0) == "a" && top.getLong(1) == 3L)
  }
}
