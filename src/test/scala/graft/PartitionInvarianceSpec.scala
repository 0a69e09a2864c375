package graft

import graft.functions.{SimilarityFunctions => S}
import graft.functions.expressions.{SketchAggregates => SK}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-independence stress: every round-8 second-wave operator must
  * produce IDENTICAL results under adversarial partitioning (1 partition vs
  * a prime-count repartition) — the property the oracle gate checks against
  * DuckDB is only meaningful if Spark's own answer is partition-stable. */
class PartitionInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private def docs = sf("documents").select(col("doc_id"), col("lang"),
    col("source"), col("text"), col("n_chars"))

  private def invariant(tag: String)(f: DataFrame => DataFrame): Unit = {
    val a = f(docs.coalesce(1)).collect().toSet
    val b = f(docs.repartition(7, col("doc_id"))).collect().toSet
    assert(a == b, s"$tag differs across partitioning")
    assert(a.nonEmpty, s"$tag produced nothing")
  }

  test("second-wave operators are partition-invariant") {
    invariant("kmv sketch") { d =>
      d.select(col("lang"), explode(S.tokens(col("text"))).as("t"))
        .select(col("lang"), conv(substring(md5(col("t")), 1, 15), 16, 10)
          .cast("long").as("h"))
        .groupBy(col("lang")).agg(SK.kmv_sketch(col("h"), 16).as("sk"))
    }
    invariant("hll sketch") { d =>
      d.select(col("lang"), explode(S.tokens(col("text"))).as("t"))
        .groupBy(col("lang")).agg(SK.hll_sketch(col("t"), 8).as("sk"))
    }
    invariant("bottom-k sample") { d =>
      graft.operators.Sampling.groupSample(d, "doc_id", "source", 5, "pi")
    }
    invariant("bin packing") { d =>
      graft.operators.Sampling.binPackDocs(d, "doc_id", "n_chars", 2048, 8, "pi")
    }
    invariant("divergence") { d =>
      graft.operators.CorpusStats.tokenDivergence(
        d.select(col("lang"), pmod(col("doc_id"), lit(2)).as("side"),
          S.tokens(col("text")).as("toks")), "toks", "lang", "side")
        .select(col("lang"), round(col("kl_ab"), 9), round(col("chi2"), 9))
    }
    invariant("canonicalize") { d =>
      val toks = d.select(col("doc_id"), col("lang"), col("source"),
        S.tokens(col("text")).as("toks"))
      val pairs = graft.operators.Dedup.jaccardSelfJoin(
        toks, "toks", "doc_id", Seq("lang", "source"), 0.5)
      graft.operators.ConnectedComponents.canonicalize(
        d.select(col("doc_id"), col("n_chars")), pairs, "doc_id", "n_chars")
    }
    invariant("token dropout") { d =>
      graft.operators.Augment.tokenDropout(d, "doc_id", "text", "pi", 200)
    }
    invariant("ngram diversity") { d =>
      graft.operators.CorpusStats.ngramDiversity(d, "text", "source", Seq(1, 2))
    }
  }
}
