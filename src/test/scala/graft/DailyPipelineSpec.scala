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

  test("daily pipeline with model maintenance: dedup survivors feed the online model, bit-identically on replay") {
    import spark.implicits._
    val t = 0.999
    // three daily batches of labeled docs: spam carries a signal phrase;
    // each day also re-delivers one of the previous day's docs (a dup the
    // dedup stage must stop from double-training the model)
    def mkDay(i: Int): DataFrame = {
      val fresh = (1 to 30).map { j =>
        val id = i * 1000L + j
        if (j % 3 == 0) (id, s"buy cheap pills now offer$i$j extra tokens", 1)
        else (id, s"a sensible document about topic$i$j with words", 0)
      }
      val redelivered = if (i == 0) Nil
      else Seq(((i - 1) * 1000L + 777000L,
        s"a sensible document about topic${i - 1}1 with words", 0))
      (fresh ++ redelivered).toDF("doc_id", "text", "y")
    }
    def runChain(): (Seq[(Long, Long)], Double) = {
      var index = Dedup.minhashIndex(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", "doc_id")
        .localCheckpoint(true)
      var w = Seq.empty[(Long, Long)].toDF("feature", "wq")
      (0 to 2).foreach { i =>
        val day = mkDay(i).localCheckpoint(true)
        val (report, nextIndex) = Dedup.incrementalMinhash(index,
          day.select(col("doc_id"), col("text")), "text", "doc_id", threshold = t)
        val kept = day.join(report.filter(col("status") === "kept")
          .select(col("doc_id")), Seq("doc_id"), "left_semi")
          .localCheckpoint(true)
        val labels = kept.select(col("doc_id"), col("y"))
        val allFeats = Retrieval.withBias(
          Retrieval.hashedTokenFeatures(kept, "text", "doc_id", 128),
          labels, "doc_id").localCheckpoint(true)
        w = Retrieval.sparseGdStep(allFeats, labels, w, "doc_id", "y",
          labels.count(), lrNum = 4, lrDen = 1).localCheckpoint(true)
        index = nextIndex.localCheckpoint(true)
      }
      // score a held-out planted set with the final model
      val holdout = Seq((900001L, "buy cheap pills now final", 1),
        (900002L, "a sensible document with words", 0)).toDF("doc_id", "text", "y")
      val hf = Retrieval.withBias(
        Retrieval.hashedTokenFeatures(holdout, "text", "doc_id", 128),
        holdout.select(col("doc_id"), col("y")), "doc_id")
      val scored = hf.join(w, Seq("feature"), "left")
        .groupBy(col("doc_id"))
        .agg((sum(coalesce(col("wq"), lit(0L)) * col("cnt")).cast("double") / 1e6).as("z"))
        .join(holdout.select(col("doc_id"), col("y")), Seq("doc_id"))
      val acc = scored.filter((col("z") > 0.0) === (col("y") === 1)).count().toDouble /
        scored.count()
      (w.as[(Long, Long)].collect().sortBy(_._1).toSeq, acc)
    }
    val (w1, acc1) = runChain()
    val (w2, acc2) = runChain()
    assert(w1 == w2, "the composed chain must replay bit-identically")
    assert(acc1 == 1.0 && acc2 == 1.0,
      s"three days of online steps must separate the planted classes, got $acc1")
  }
}
