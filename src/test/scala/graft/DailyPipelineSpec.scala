package graft

import graft.operators.{Dedup, Retrieval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed DAILY pipeline — the operational story the fixpoint
  * operators exist for: each day's batch is near-dedup'd against the stored
  * signature index (never re-tokenizing the corpus), the survivors join the
  * searchable BM25 index (append-only postings), and after N days the
  * system state must equal what a from-scratch build over the union would
  * produce — no drift, ever. */
class DailyPipelineSpec extends SparkSpec {

  test("three chained days: dedup→index state equals the from-scratch build") {
    val docs = sf("documents").select(col("doc_id"), col("text"))
    // day 0 seeds the corpus; days 1-3 arrive with id offsets and REPEAT
    // some earlier text (cross-day dups the incremental path must catch)
    val day0 = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    def day(i: Int): DataFrame = docs
      .filter(pmod(col("doc_id"), lit(4)) === i)
      .select((col("doc_id") + i * 100000L).as("doc_id"), col("text"))
    val t = 0.999 // exact regime: LSH recall provably 1 on identical shingle sets

    // the seed corpus is itself deduped first (an index of internal dups
    // would violate the stored-side-is-deduplicated premise)
    val day0d = Dedup.minhashDedup(day0, "text", "doc_id", threshold = t)
      .localCheckpoint(true)
    var index = Dedup.minhashIndex(day0d, "text", "doc_id").localCheckpoint(true)
    var (postings, lens) = Retrieval.bm25Index(day0d, "text", "doc_id")
    var corpus = day0
    (1 to 3).foreach { i =>
      val batch = day(i)
      val (report, nextIndex) = Dedup.incrementalMinhash(index, batch,
        "text", "doc_id", threshold = t)
      val kept = batch.join(report.filter(col("status") === "kept")
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
      val appended = Retrieval.bm25Append(postings, lens, kept, "text", "doc_id")
      postings = appended._1.localCheckpoint(true)
      lens = appended._2.localCheckpoint(true)
      index = nextIndex.localCheckpoint(true)
      corpus = corpus.unionByName(batch)
    }

    // from-scratch truth over the union of all four days
    val survivors = Dedup.minhashDedup(corpus, "text", "doc_id", threshold = t)
    val scratchIdx = Retrieval.bm25Index(survivors, "text", "doc_id")

    // 1. the incremental index tracks exactly the from-scratch survivor set
    val incIds = lens.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val truthIds = survivors.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(incIds == truthIds, s"survivor drift: only-inc=${incIds -- truthIds} " +
      s"only-scratch=${truthIds -- incIds}")

    // 2. searching the incrementally-built index equals searching the
    // from-scratch one, bit for bit
    val qs = Seq("qa" -> "spark join merge", "qb" -> "customer order value")
    val a = Retrieval.bm25Search(postings, lens, "doc_id", qs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val b = Retrieval.bm25Search(scratchIdx._1, scratchIdx._2, "doc_id", qs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(a == b)

    // 3. the minhash index fixpoint: replaying day 3 against the final
    // state drops every doc as already-stored
    val (replay, _) = Dedup.incrementalMinhash(index, day(3), "text", "doc_id",
      threshold = t)
    assert(replay.collect().forall(_.getString(1) == "dup_of_stored"))
  }
}
