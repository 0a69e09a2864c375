package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** BPE training vs a straight single-threaded reference implementation of
  * Sennrich-style merge learning, plus merge-pass edge cases (greedy
  * non-overlap, multi-char cascades, mid-symbol boundaries), the
  * local/distributed cutover equality, codepoint (non-BMP) symbol handling,
  * and document encoding with a trained table.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: word-freq vocab of CODEPOINT symbols; per rank, argmax
    * pair (cnt desc, then (l, r) asc in UTF-8 binary order — Spark's string
    * sort) merged left-to-right non-overlapping. */
  private def refBpe(words: Seq[String], numMerges: Int): Seq[(Int, String, String, Long)] = {
    def codepoints(w: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp)); i += Character.charCount(cp)
      }
      b.result()
    }
    def cmpU8(a: String, b: String): Int =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
    def mergeVec(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { b += (l + r); i += 2 }
        else { b += syms(i); i += 1 }
      }
      b.result()
    }
    var vocab: Map[Vector[String], Long] = words.groupBy(identity).map {
      case (w, ws) => (codepoints(w.toLowerCase), ws.size.toLong)
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
        val best = counts.toSeq.reduceLeft { (x, y) =>
          val c = java.lang.Long.compare(y._2, x._2)
          val pick =
            if (c != 0) c > 0
            else {
              val cl = cmpU8(y._1._1, x._1._1)
              if (cl != 0) cl < 0 else cmpU8(y._1._2, x._1._2) < 0
            }
          if (pick) y else x
        }
        val ((l, r), c) = best
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
      .withColumn("symbols", expr("regexp_extract_all(word, '(?s).', 0)"))
    val got = Bpe.applyMerges(v, Seq(("a", "b"), ("a", "ab")))
      .orderBy("word").select("symbols").as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aab"), Seq("ab")))
  }

  test("wordVocab symbols are codepoints — supplementary-plane chars stay whole") {
    val got = Seq("a😀b").toDF("text") // a😀b
      .transform(Bpe.wordVocab(_, "text"))
      .select("symbols").as[Seq[String]].head()
    assert(got == Seq("a", "😀", "b"))
  }

  test("train (local path) matches the reference implementation on the Sennrich-style corpus") {
    val words = Seq("low", "low", "low", "lower", "lower", "lowest",
      "newest", "newest", "newest", "widest", "widest", "aaa")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val got = Bpe.train(docs, "text", 8)
      .orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == refBpe(words, 8))
  }

  test("train: local and distributed paths are value-identical") {
    val words = Seq("low", "low", "low", "lower", "lower", "lowest",
      "newest", "newest", "newest", "widest", "widest", "aaa", "banana",
      "bandana", "cabana")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val local = Bpe.train(docs, "text", 10)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    // localVocabBound = 0 forces every vocab above the bound -> distributed
    val dist = Bpe.train(docs, "text", 10, localVocabBound = 0L)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(local == dist)
    assert(local == refBpe(words, 10))
  }

  test("train on a non-BMP corpus: both paths match the codepoint reference") {
    // 😀😀 repeats -> (😀,😀) should be a learned merge, never lone surrogates
    val words = Seq("😀😀x", "😀😀x",
      "😀y", "x😁", "x😁")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val local = Bpe.train(docs, "text", 4)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val dist = Bpe.train(docs, "text", 4, localVocabBound = 0L)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(local == dist)
    assert(local == refBpe(words, 4))
    // no lone surrogates anywhere in the merge table (UTF-16-unit splitting
    // would produce them)
    def wellFormed(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isHighSurrogate(c)) {
          if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1))) return false
          i += 2
        } else if (Character.isLowSurrogate(c)) return false
        else i += 1
      }
      true
    }
    assert(local.forall { case (_, l, r, _) => wellFormed(l) && wellFormed(r) })
  }

  test("train stops early when the vocab is fully merged (both paths)") {
    val docs = Seq("ab ab cd").toDF("text")
    val got = Bpe.train(docs, "text", 10)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    // only 2 possible merges: (a,b) freq 2 first, then (c,d) freq 1
    assert(got == Seq((1, "a", "b", 2L), (2, "c", "d", 1L)))
    val dist = Bpe.train(docs, "text", 10, localVocabBound = 0L)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(dist == got)
  }

  test("encode segments documents with a trained merge table") {
    val docs = Seq("low lower", "lowest low").toDF("text")
    val merges = Bpe.train(docs, "text", 3)
      .orderBy("rank").select("pair_left", "pair_right")
      .as[(String, String)].collect().toSeq
    val enc = Bpe.encode(docs, "text", merges)
      .select(col("text"), col("segments"))
      .as[(String, Seq[String])].collect().toMap
    // every word's segmentation must equal applyMerges on its vocab row
    val vocabSeg = Bpe.applyMerges(
      Bpe.wordVocab(docs, "text"), merges)
      .select(col("word"), array_join(col("symbols"), " "))
      .as[(String, String)].collect().toMap
    for ((text, segs) <- enc) {
      val words = text.toLowerCase.split("\\s+").toSeq
      assert(segs == words.map(vocabSeg))
    }
  }

  test("native bpe_apply kernel is value-identical to the mergeOnce fold chain") {
    // the kernel replaced the chained aggregate() folds in applyMerges/encode;
    // mergeOnce stays as the independent spec reference (like the ViaExplode
    // twins). Merges chosen to exercise cascades, non-overlap, and no-op
    // entries; words exercise repeats and supplementary-plane codepoints.
    val merges = Seq(("a", "a"), ("t", "a"), ("b", "l"), ("bl", "e"),
      ("aa", "a"), ("x", "y"), ("😀", "😀"))
    val v = Seq("aaaa", "table", "stables", "a😀😀b", "blend aaab")
      .toDF("text").transform(Bpe.wordVocab(_, "text"))
    val viaKernel = Bpe.applyMerges(v, merges)
      .select("word", "symbols").as[(String, Seq[String])].collect().toMap
    val viaFold = merges.foldLeft(v) { case (d, (l, r)) =>
      d.withColumn("symbols", Bpe.mergeOnce(col("symbols"), l, r))
    }.select("word", "symbols").as[(String, Seq[String])].collect().toMap
    assert(viaKernel == viaFold)
    // (a,a) pairs greedily non-overlapping -> [aa, aa]; (aa,a) then finds
    // no lone "a" to its right, so it must NOT fire inside the merged pair
    assert(viaKernel("aaaa") == Seq("aa", "aa"))
  }
}
