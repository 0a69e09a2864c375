package graft

import graft.operators.SuffixArray
import org.apache.spark.sql.functions._

/** Character-exact substring dedup: hand-checked spans, the
  * arbitrary-length-vs-gram contrast, within-doc repeats, and cross-doc
  * window safety. */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minLen: Int) =
    SuffixArray.scrubRepeatedCharSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)

  test("hand-checked: a shared 12-char substring is scrubbed from both docs, unique text survives") {
    val banner = "AAAABBBBCCCC" // 12 chars
    val out = run(Seq(
      (1L, s"xy${banner}z"),   // banner at pos 2..13
      (2L, s"qq${banner}"),    // banner at pos 2..13
      (3L, "totally unique doc")), minLen = 12)
    assert(out(0) == ((1L, 15L, 12L, "xyz")))
    assert(out(1) == ((2L, 14L, 12L, "qq")))
    assert(out(2) == ((3L, 18L, 0L, "totally unique doc")))
  }

  test("arbitrary length: a repeat LONGER than minLen is fully covered (maximal span, not one window)") {
    val long = "0123456789abcdefghij" // 20 chars, repeated verbatim
    val out = run(Seq((1L, s"L${long}R"), (2L, s"x$long")), minLen = 8)
    // every char of the 20-char repeat is inside some hot 8-window
    assert(out(0)._3 == 20L && out(0)._4 == "LR")
    assert(out(1)._3 == 20L && out(1)._4 == "x")
  }

  test("the gram scrub provably misses what the char scrub catches: few long tokens") {
    // 4 tokens, 47 chars — an 8-TOKEN gram can never align on it
    val banner = "supercalifragilistic expialidocious corporate boilerplate"
    val docs = Seq((1L, s"alpha beta $banner"), (2L, s"gamma delto $banner"))
    val gram = graft.operators.Repetition.scrubRepeatedSpans(
      docs.toDF("doc_id", "text"), "doc_id", "text", n = 8, minDocs = 2)
    val gramMasked = gram.agg(sum(col("n_removed"))).head().getLong(0)
    assert(gramMasked == 0L, "8-token grams cannot align on a 4-token banner")
    val out = run(docs, minLen = 40)
    assert(out.forall(_._3 >= banner.length.toLong),
      s"char-level scrub must cover the banner: ${out.mkString(", ")}")
    // the maximal repeat is " supercal..." (the shared leading space rides
    // along), so the kept prefix is exactly the distinct words
    assert(out(0)._4 == "alpha beta" && !out(0)._4.contains("boilerplate"))
  }

  test("within-doc repeats count; windows never match across the doc boundary") {
    val out = run(Seq(
      (1L, "abcdefghij-MIDDLE-abcdefghij"),  // 10-char repeat twice in ONE doc
      // doc 2 ends with 'WXYZab', doc 3 starts with 'cdefgh' — the
      // concatenation-adjacent text must NOT form a phantom repeat with
      // doc 1's 'abcdefghij' (texts otherwise share no 10-char substring)
      (2L, "zz quiet tail WXYZab"),
      (3L, "cdefgh calm head qq")), minLen = 10)
    assert(out(0)._3 == 20L && out(0)._4 == "-MIDDLE-")
    assert(out(1)._3 == 0L && out(2)._3 == 0L, "no cross-doc phantom windows")
  }

  test("docs shorter than minLen pass through untouched") {
    val out = run(Seq((1L, "short"), (2L, "short")), minLen = 10)
    assert(out.forall(r => r._3 == 0L && r._4 == (if (r._1 == 1L) "short" else "short")))
    // but at minLen <= len they do dedup
    val out2 = run(Seq((1L, "short"), (2L, "short")), minLen = 5)
    assert(out2.forall(r => r._3 == 5L && r._4 == ""))
  }

  test("multibyte (BMP) text: code-point positions stay aligned") {
    val zh = "机器学习模型训练数据去重"
    val out = run(Seq((1L, s"前缀$zh"), (2L, s"另外$zh")), minLen = 12)
    assert(out(0) == ((1L, 14L, 12L, "前缀")))
    assert(out(1) == ((2L, 14L, 12L, "另外")))
  }

  test("empty documents pass through with zero phantom rows") {
    val out = run(Seq((1L, ""), (2L, ""), (3L, "some real text here that is long")), minLen = 5)
    assert(out(0) == ((1L, 0L, 0L, "")))
    assert(out(1) == ((2L, 0L, 0L, "")))
    assert(out(2)._3 == 0L && out(2)._4 == "some real text here that is long")
  }

  test("keepFirst: the corpus-first occurrence survives, all later copies scrub") {
    val banner = "AAAABBBBCCCCDDDD" // 16 chars
    def runKF(docs: Seq[(Long, String)], minLen: Int) =
      graft.operators.SuffixArray.scrubRepeatedCharSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", minLen, keepFirst = true)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val out = runKF(Seq(
      (1L, s"xx$banner"),      // first occurrence: kept
      (2L, s"yy$banner"),      // later copy: scrubbed
      (3L, s"$banner$banner")), minLen = 16) // within-doc copies after doc 1: both scrubbed
    assert(out(0) == ((1L, 18L, 0L, s"xx$banner")), out(0).toString)
    assert(out(1) == ((2L, 18L, 16L, "yy")), out(1).toString)
    assert(out(2)._3 == 32L && out(2)._4 == "", out(2).toString)
    // and the default mode scrubs doc 1 too
    val all = run(Seq((1L, s"xx$banner"), (2L, s"yy$banner")), minLen = 16)
    assert(all(0)._3 == 16L && all(1)._3 == 16L)
  }

  test("supplementary-plane text: kernel code-point positions align with SQL substring") {
    // U+1F680 is 2 UTF-16 units; a kernel counting UTF-16 chars would
    // mis-align verify extraction and the rebuild after the first emoji
    val core = "🚀launch🚀sequence" // 18 UTF-16 units, 16 code points
    val out = run(Seq((1L, s"aa$core"), (2L, s"bb$core")), minLen = 16)
    assert(out(0) == ((1L, 18L, 16L, "aa")), out(0).toString)
    assert(out(1) == ((2L, 18L, 16L, "bb")), out(1).toString)
  }

  test("rolling-hash production path bit-equals the prefix-doubling reference, both modes") {
    // a fixture hitting every edge at once: exact dup docs, a shared
    // banner, within-doc repeats, multibyte text, empties, sub-minLen
    // docs, and a doc that is one long self-repeat
    val banner = "supercalifragilisticexpialidocious corporate-boilerplate!!"
    val rep = "0123456789abcdef"
    val docs = Seq(
      (0L, s"alpha beta $banner gamma"),
      (1L, s"delta $banner epsilon"),
      (2L, "totally unique text with nothing repeated anywhere at all ok"),
      (3L, s"$rep-MID-$rep tail"),
      (4L, ""),
      (5L, "shorty"),
      (6L, "机器学习模型训练数据去重是一个重要的问题 机器学习模型训练数据去重是一个重要的问题"),
      (7L, rep * 5),
      (8L, s"alpha beta $banner gamma")) // exact dup of doc 0
    for (minLen <- Seq(12, 16); kf <- Seq(false, true)) {
      val fast = SuffixArray.scrubRepeatedCharSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", minLen, keepFirst = kf)
      val ref = SuffixArray.scrubRepeatedCharSpansPrefixDoubling(
        docs.toDF("doc_id", "text"), "doc_id", "text", minLen, keepFirst = kf)
      assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty,
        s"minLen=$minLen keepFirst=$kf: rolling-hash result must bit-equal " +
          "the prefix-doubling reference")
    }
  }

  test("negative doc ids are rejected (the positional encoding requires non-negative ids)") {
    intercept[IllegalArgumentException] {
      run(Seq((-1L, "some text"), (2L, "some text")), minLen = 5)
    }
  }
}
