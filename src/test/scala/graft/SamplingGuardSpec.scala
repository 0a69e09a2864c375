package graft

import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.functions._

/** Round-9 sampling guards: leak-safe splitting (near-dup clusters never
  * straddle a split boundary) and weighted sampling (deterministic,
  * weight-respecting). */
class SamplingGuardSpec extends SparkSpec {
  import spark.implicits._

  test("leakSafeSplit: every near-dup pair lands on one side; plain split straddles") {
    val docs = sf("documents").select(col("doc_id"), col("lang"), col("source"),
      array_distinct(graft.functions.SimilarityFunctions.tokens(col("text"))).as("toks"))
    val pairs = Dedup.jaccardSelfJoin(docs, "toks", "doc_id",
      Seq("lang", "source"), 0.5).select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    assert(pairs.count() > 0, "fixture needs near-dup pairs")
    val safe = Sampling.leakSafeSplit(docs.select(col("doc_id")), "doc_id",
      pairs, "id_a", "id_b", Seq("train" -> 0.5, "test" -> 0.5))
    def straddles(split: org.apache.spark.sql.DataFrame): Long = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("s_a")), Seq("id_a"))
      .join(split.select(col("doc_id").as("id_b"), col("split").as("s_b")), Seq("id_b"))
      .filter(col("s_a") =!= col("s_b")).count()
    assert(straddles(safe) == 0L, "a near-dup pair crossed the split boundary")
    // the plain doc-keyed split DOES straddle on the same data — the bug
    // this operator exists to prevent (50/50 split: ~half the cross pairs)
    val plain = Sampling.splitByHash(docs.select(col("doc_id")), "doc_id",
      Seq("train" -> 0.5, "test" -> 0.5))
    assert(straddles(plain) > 0L, "fixture too easy: plain split never straddled")
  }

  test("leakSafeSplit: singletons split exactly like plain splitByHash") {
    val docs = sf("documents").select(col("doc_id"))
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val safe = Sampling.leakSafeSplit(docs, "doc_id", noPairs, "id_a", "id_b",
        Seq("train" -> 0.8, "test" -> 0.2))
      .select(col("doc_id"), col("split")).collect().toSet
    val plain = Sampling.splitByHash(docs, "doc_id",
        Seq("train" -> 0.8, "test" -> 0.2))
      .select(col("doc_id"), col("split")).collect().toSet
    assert(safe == plain)
  }

  test("weightedSample: deterministic, k-bounded, and weight-respecting") {
    val df = (1 to 400).map { i =>
      // two weight classes: heavy (logw = ln 50) vs light (logw = 0)
      (i.toLong, if (i % 4 == 0) math.log(50.0) else 0.0)
    }.toDF("id", "logw")
    val a = Sampling.weightedSample(df, "id", "logw", 60, "s1")
      .select(col("id"), col("rank")).collect().toSeq
    val b = Sampling.weightedSample(df.repartition(7), "id", "logw", 60, "s1")
      .select(col("id"), col("rank")).collect().toSeq
    assert(a == b, "weighted sample must be partition-deterministic")
    assert(a.size == 60)
    // heavy items are 25% of the population but 50x-weighted — they must
    // dominate the sample (deterministic fixture, no flake margin)
    val heavy = a.count(_.getLong(0) % 4 == 0)
    assert(heavy > 45, s"50x-weighted quarter must dominate, got $heavy/60")
    // a different seed draws a different sample
    val c = Sampling.weightedSample(df, "id", "logw", 60, "s2")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(c != a.map(_.getLong(0)).toSet)
  }
}
