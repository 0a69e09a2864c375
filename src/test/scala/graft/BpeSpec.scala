package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** BPE training vs a straight single-threaded reference implementation of
  * Sennrich-style merge learning, plus merge-pass edge cases (greedy
  * non-overlap, multi-char cascades, mid-symbol boundaries).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: word-freq vocab of char symbols; per rank, argmax pair
    * (cnt desc, then (l, r) asc) merged left-to-right non-overlapping. */
  private def refBpe(words: Seq[String], numMerges: Int): Seq[(Int, String, String, Long)] = {
    def mergeVec(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { b += (l + r); i += 2 }
        else { b += syms(i); i += 1 }
      }
      b.result()
    }
    var vocab: Map[Vector[String], Long] = words.groupBy(identity).map {
      case (w, ws) => (w.toLowerCase.split("").filter(_.nonEmpty).toVector, ws.size.toLong)
    }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        out += ((rank, l, r, c))
        vocab = vocab.map { case (syms, f) => (mergeVec(syms, l, r), f) }
        rank += 1
      }
    }
    out.toSeq
  }

  test("applyMerges: greedy left-to-right non-overlap — 'aaa' under (a,a) is [aa, a]") {
    val v = Seq("aaa").toDF("text").transform(Bpe.wordVocab(_, "text"))
    val got = Bpe.applyMerges(v, Seq(("a", "a")))
      .select("symbols").as[Seq[String]].head()
    assert(got == Seq("aa", "a"))
  }

  test("applyMerges: multi-char cascade (t,a)(b,l)(bl,e) segments 'table' as [ta, ble]") {
    val v = Seq("table").toDF("text").transform(Bpe.wordVocab(_, "text"))
    val got = Bpe.applyMerges(v, Seq(("t", "a"), ("b", "l"), ("bl", "e")))
      .select("symbols").as[Seq[String]].head()
    assert(got == Seq("ta", "ble"))
  }

  test("applyMerges: merged symbols match whole symbols only, never substrings") {
    // after (a,b)->ab, the pair (a,ab) exists in 'aab' but NOT in 'ab' alone,
    // and (ab,b) must not fire on the 'ab' inside the merged 'aab'
    val v = Seq("aab", "ab").toDF("word")
      .withColumn("freq", lit(1L))
      .withColumn("symbols", expr("filter(split(word, ''), s -> s <> '')"))
    val got = Bpe.applyMerges(v, Seq(("a", "b"), ("a", "ab")))
      .orderBy("word").select("symbols").as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aab"), Seq("ab")))
  }

  test("train matches the reference implementation on the Sennrich-style corpus") {
    val words = Seq("low", "low", "low", "lower", "lower", "lowest",
      "newest", "newest", "newest", "widest", "widest", "aaa")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val got = Bpe.train(docs, "text", 8)
      .orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == refBpe(words, 8))
  }

  test("train stops early when the vocab is fully merged") {
    val docs = Seq("ab ab cd").toDF("text")
    val got = Bpe.train(docs, "text", 10)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    // only 2 possible merges: (a,b) freq 2 first, then (c,d) freq 1
    assert(got == Seq((1, "a", "b", 2L), (2, "c", "d", 1L)))
  }
}
