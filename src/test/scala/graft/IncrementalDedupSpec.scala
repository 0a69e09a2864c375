package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch incremental dedup: precedence, canonical selection, and the
  * fixpoint contract (survivors ∪ stored re-processed = all dups). */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text").select(col("doc_id"), lit("b").as("blk"),
      array_distinct(split(lower(trim(col("text"))), "\\s+")).as("toks"))

  private def run(stored: DataFrame, batch: DataFrame): Map[Long, (String, Option[Long])] =
    Dedup.incrementalDedup(stored, batch, "toks", "doc_id", Seq("blk"), 0.7)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap

  test("stored match wins over within-batch; attribution is the smallest stored id") {
    val stored = toks(Seq(5L -> "a b c d e", 9L -> "a b c d e f"))
    // 100 matches stored 5 AND 9 (-> smallest, 5) AND batch-mate 101
    val batch = toks(Seq(100L -> "a b c d e", 101L -> "a b c d e",
      102L -> "x y z w"))
    val got = run(stored, batch)
    assert(got(100L) == (("dup_of_stored", Some(5L))))
    assert(got(101L) == (("dup_of_stored", Some(5L))))
    assert(got(102L) == (("kept", None)))
  }

  test("within-batch near-dup component keeps the minimum id") {
    val stored = toks(Seq(1L -> "totally unrelated words here"))
    val batch = toks(Seq(200L -> "p q r s t", 201L -> "p q r s t",
      202L -> "p q r s t u", 300L -> "m n o"))
    val got = run(stored, batch)
    assert(got(200L) == (("kept", None)))
    assert(got(201L) == (("dup_in_batch", Some(200L))))
    assert(got(202L) == (("dup_in_batch", Some(200L))))
    assert(got(300L) == (("kept", None)))
  }

  test("fixpoint: survivors join the corpus; re-running the batch drops everything") {
    val stored = toks(Seq(5L -> "a b c d e"))
    val batch = toks(Seq(100L -> "a b c d e", 101L -> "p q r s t",
      102L -> "p q r s t", 103L -> "j k l m n"))
    val first = run(stored, batch)
    val keptIds = first.collect { case (id, ("kept", _)) => id }.toSeq
    assert(keptIds.sorted == Seq(101L, 103L))
    val nextStored = stored.unionByName(
      batch.filter(col("doc_id").isin(keptIds: _*)))
    val second = run(nextStored, batch)
    // every batch doc now dups the stored corpus (exact self-matches at
    // jaccard 1.0 for the survivors; transitive matches for the rest)
    assert(second.values.forall(_._1 == "dup_of_stored"),
      s"expected all dup_of_stored, got $second")
  }
}
