package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Persisted BM25 index (Retrieval.bm25Index / bm25Append / bm25Search):
  * append-only postings + lengths, search equality with the one-shot path. */
class Bm25IndexSpec extends SparkSpec {

  private lazy val docs = sf("documents").select(col("doc_id"), col("text"))
  private val queries = Seq("qa" -> "spark join merge", "qb" -> "customer order value")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Double, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("build(A) + append(B) searches identically to the one-shot path over A∪B") {
    val (p0, l0) = Retrieval.bm25Index(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text", "doc_id")
    val (p1, l1) = Retrieval.bm25Append(p0, l0,
      docs.filter(pmod(col("doc_id"), lit(2)) === 1), "text", "doc_id")
    val viaIndex = Retrieval.bm25Search(p1, l1, "doc_id", queries, k = 10)
    val oneShot = Retrieval.bm25TopK(docs, "text", "doc_id", queries, k = 10)
    assert(rows(viaIndex) == rows(oneShot))
  }

  test("append is append-only: stored postings rows are a subset of the appended index") {
    val a = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val b = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val (p0, l0) = Retrieval.bm25Index(a, "text", "doc_id")
    val (p1, l1) = Retrieval.bm25Append(p0, l0, b, "text", "doc_id")
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val stored = key(p0)
    val appended = key(p1)
    assert(stored.subsetOf(appended), "append must not rewrite stored postings")
    assert((appended -- stored).forall { case (id, _, _) => id % 2 == 1 },
      "new rows must come from the batch only")
    assert(l1.count() == docs.count())
  }

  test("postings and lengths round-trip through parquet: search from disk is identical") {
    val (p, l) = Retrieval.bm25Index(docs, "text", "doc_id")
    val base = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
    p.write.mode("overwrite").parquet(s"$base/postings")
    l.write.mode("overwrite").parquet(s"$base/lens")
    val fromDisk = Retrieval.bm25Search(spark.read.parquet(s"$base/postings"),
      spark.read.parquet(s"$base/lens"), "doc_id", queries, k = 10)
    val fromMem = Retrieval.bm25TopK(docs, "text", "doc_id", queries, k = 10)
    assert(rows(fromDisk) == rows(fromMem))
  }

  test("search result is invariant to how the corpus was split across appends") {
    val thirds = (0 until 3).map(i => docs.filter(pmod(col("doc_id"), lit(3)) === i))
    val (pa, la) = Retrieval.bm25Index(thirds(0), "text", "doc_id")
    val (pb, lb) = Retrieval.bm25Append(pa, la, thirds(1), "text", "doc_id")
    val (pc, lc) = Retrieval.bm25Append(pb, lb, thirds(2), "text", "doc_id")
    val threeAppends = Retrieval.bm25Search(pc, lc, "doc_id", queries, k = 10)
    val (pd, ld) = Retrieval.bm25Index(docs, "text", "doc_id")
    val oneBuild = Retrieval.bm25Search(pd, ld, "doc_id", queries, k = 10)
    assert(rows(threeAppends) == rows(oneBuild))
  }

  test("hardNegatives: positives never returned, ranks dense over the remaining ranking") {
    import spark.implicits._
    val full = Retrieval.bm25TopK(docs, "text", "doc_id", queries, k = 12)
    val positives = full.filter(col("rank") <= 2).select("query_id", "doc_id")
    val posSet = positives.as[(String, Long)].collect().toSet
    val neg = Retrieval.hardNegatives(docs, "text", "doc_id", queries, positives, k = 10)
    val negRows = rows(neg)
    // no positive survives
    assert(negRows.forall { case (q, id, _, _) => !posSet.contains((q, id)) })
    // ranks are dense 1..k per query (positives removed BEFORE ranking)
    negRows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).toSeq.sorted == (1L to rs.size).toSeq)
    }
    // and the negatives are exactly the full ranking shifted past the
    // positives: rank r negative == rank r+2 of the unfiltered list
    val fullMap = rows(full).map { case (q, id, s, r) => (q, r) -> ((id, s)) }.toMap
    negRows.foreach { case (q, id, s, r) =>
      assert(fullMap((q, r + 2)) == ((id, s)), s"query $q rank $r")
    }
    // empty positives frame degrades to plain bm25TopK
    val none = positives.filter(lit(false))
    assert(rows(Retrieval.hardNegatives(docs, "text", "doc_id", queries, none, k = 10)) ==
      rows(Retrieval.bm25TopK(docs, "text", "doc_id", queries, k = 10)))
  }
}
