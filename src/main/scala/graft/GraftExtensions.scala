package graft

import graft.functions.expressions.HashExpressions._
import graft.functions.expressions.TextStatsExpressions.{DropRepeatedLinesExpr, LineStatsExpr, ScrubSpansExpr, TopNgramExpr}
import graft.functions.SimilarityFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native Catalyst
  * expressions (and the Jaro-Winkler UDF) as SQL functions so the consume
  * stage's user SQL can call them directly:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * SELECT simhash64(tokens), minhash_signature(shingles, 64),
  *        hyperplane_bucket(vec, 64, 12), dot_product(a, b) FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) — 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles, n) — n-component MinHash signature"),
      (args: Seq[Expression]) => MinHashSignatureExpr(args.head, intArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("hashed_shingles"),
      info("hashed_shingles", "hashed_shingles(text, n) — distinct xxhash64'd word n-grams"),
      (args: Seq[Expression]) => HashedShinglesExpr(args.head, intArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("hyperplane_bucket"),
      info("hyperplane_bucket", "hyperplane_bucket(vec, dim, planes) — LSH sign bucket"),
      (args: Seq[Expression]) => HyperplaneBucketExpr(args.head, intArg(args(1)), intArg(args(2)))))

    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) — sequential double dot product"),
      (args: Seq[Expression]) => DotProductExpr(args.head, args(1))))

    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) — Jaro-Winkler similarity in [0,1]"),
      (args: Seq[Expression]) => JaroWinklerExpr(args.head, args(1))))

    ext.injectFunction((FunctionIdentifier("line_stats"),
      info("line_stats", "line_stats(text) — [n_lines, n_distinct, chars, dup_chars]"),
      (args: Seq[Expression]) => LineStatsExpr(args.head)))

    ext.injectFunction((FunctionIdentifier("drop_repeated_lines"),
      info("drop_repeated_lines", "drop_repeated_lines(text) — first occurrence of each line, in order"),
      (args: Seq[Expression]) => DropRepeatedLinesExpr(args.head)))

    ext.injectFunction((FunctionIdentifier("top_ngram"),
      info("top_ngram", "top_ngram(text, n) — struct(cnt, cov, gram) of the most frequent word n-gram"),
      (args: Seq[Expression]) => TopNgramExpr(args.head, intArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("gram_hash_pairs"),
      info("gram_hash_pairs", "gram_hash_pairs(text, n) — positional 128-bit word-n-gram hashes, array<struct<h1,h2>>"),
      (args: Seq[Expression]) => GramHashPairsExpr(args.head, intArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("scrub_spans"),
      info("scrub_spans", "scrub_spans(text, starts, n) — struct(n_tokens, n_removed, scrubbed_text)"),
      (args: Seq[Expression]) => ScrubSpansExpr(args.head, args(1), intArg(args(2)))))

    ext.injectFunction((FunctionIdentifier("fix_mojibake"),
      info("fix_mojibake", "fix_mojibake(text) — repair cp1252 mojibake, strict round trip"),
      (args: Seq[Expression]) => FixMojibakeExpr(args.head)))

    ext.injectFunction((FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize", "unicode_normalize(text, form) — NFC/NFD/NFKC/NFKD normalization"),
      (args: Seq[Expression]) =>
        UnicodeNormalizeExpr(args.head, stringArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("mask_terms"),
      info("mask_terms", "mask_terms(text, array(terms...), token) — Aho-Corasick blocklist masking"),
      (args: Seq[Expression]) =>
        MaskTermsExpr(args.head, stringSeqArg(args(1)), stringArg(args(2)))))

    ext.injectFunction((FunctionIdentifier("count_terms"),
      info("count_terms", "count_terms(text, array(terms...)) — count of maskable regions"),
      (args: Seq[Expression]) => CountTermsExpr(args.head, stringSeqArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("shingle_strings"),
      info("shingle_strings", "shingle_strings(text, n) — distinct word n-gram strings, first-occurrence order"),
      (args: Seq[Expression]) => ShingleStringsExpr(args.head, intArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count", "sorted_intersect_count(a, b) — intersection size of two ascending array<bigint>"),
      (args: Seq[Expression]) => SortedIntersectCountExpr(args.head, args(1))))

    ext.injectFunction((FunctionIdentifier("hilbert_index"),
      info("hilbert_index", "hilbert_index(x, y, bits) — 2-D Hilbert curve index"),
      (args: Seq[Expression]) => HilbertIndexExpr(args.head, args(1), intArg(args(2)))))

    // Aggregates: the analyzer wraps a returned AggregateFunction in its
    // AggregateExpression, so GROUP BY sketch building works from plain SQL.
    ext.injectFunction((FunctionIdentifier("kmv_sketch"),
      info("kmv_sketch", "kmv_sketch(hash, k) AGG — k smallest distinct hashes, ascending"),
      (args: Seq[Expression]) =>
        graft.functions.expressions.SketchAggregates.KmvSketchAgg(args.head, intArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("cms_sketch"),
      info("cms_sketch", "cms_sketch(token, depth, width) AGG — flattened count-min matrix"),
      (args: Seq[Expression]) => graft.functions.expressions.SketchAggregates
        .CmsSketchAgg(args.head, intArg(args(1)), intArg(args(2)))))

    ext.injectFunction((FunctionIdentifier("bloom_sketch"),
      info("bloom_sketch", "bloom_sketch(gram, mBits, kHashes) AGG — Bloom bitset as BINARY"),
      (args: Seq[Expression]) => graft.functions.expressions.SketchAggregates
        .BloomSketchAgg(args.head, intArg(args(1)), intArg(args(2)))))

    ext.injectFunction((FunctionIdentifier("bottom_k_struct"),
      info("bottom_k_struct", "bottom_k_struct(struct, k) AGG — k smallest structs, ascending"),
      (args: Seq[Expression]) => graft.functions.expressions.SketchAggregates
        .BottomKStructAgg(args.head, intArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("hll_sketch"),
      info("hll_sketch", "hll_sketch(token, p) AGG — 2^p HLL registers as ARRAY<INT>"),
      (args: Seq[Expression]) => graft.functions.expressions.SketchAggregates
        .HllSketchAgg(args.head, intArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("kll_sketch"),
      info("kll_sketch", "kll_sketch(v, k) AGG — quantile sketch as ARRAY<STRUCT<v,w>>"),
      (args: Seq[Expression]) => graft.functions.expressions.SketchAggregates
        .KllSketchAgg(args.head, intArg(args(1)))))

    ext.injectFunction((FunctionIdentifier("mg_sketch"),
      info("mg_sketch", "mg_sketch(v, k) AGG — Misra-Gries heavy hitters as ARRAY<STRUCT<t,c>>"),
      (args: Seq[Expression]) => graft.functions.expressions.SketchAggregates
        .MgSketchAgg(args.head, intArg(args(1)))))
  }

  private def stringArg(e: Expression): String = e.eval(null) match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case other => throw new IllegalArgumentException(s"expected string literal, got $other")
  }

  private def stringSeqArg(e: Expression): Seq[String] = e.eval(null) match {
    case a: org.apache.spark.sql.catalyst.util.ArrayData =>
      a.toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    case other => throw new IllegalArgumentException(s"expected array literal, got $other")
  }

  private def intArg(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
  }
}

/** Session-local registration for sessions created without the conf (tests,
  * REPL): registers the same functions on an existing SparkSession. */
object GraftExtensions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      args => SimHash64Expr(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      args => MinHashSignatureExpr(args.head, args(1).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("hashed_shingles",
      args => HashedShinglesExpr(args.head, args(1).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_bucket",
      args => HyperplaneBucketExpr(args.head,
        args(1).eval(null).toString.toInt, args(2).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      args => DotProductExpr(args.head, args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler",
      args => JaroWinklerExpr(args.head, args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("line_stats",
      args => LineStatsExpr(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("drop_repeated_lines",
      args => DropRepeatedLinesExpr(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("top_ngram",
      args => TopNgramExpr(args.head, args(1).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("gram_hash_pairs",
      args => GramHashPairsExpr(args.head, args(1).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("scrub_spans",
      args => ScrubSpansExpr(args.head, args(1), args(2).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("fix_mojibake",
      args => FixMojibakeExpr(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("unicode_normalize",
      args => UnicodeNormalizeExpr(args.head, args(1).eval(null).toString), "scala_udf")
    reg.createOrReplaceTempFunction("mask_terms",
      args => MaskTermsExpr(args.head,
        args(1).eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType).map(_.toString).toSeq,
        args(2).eval(null).toString), "scala_udf")
    reg.createOrReplaceTempFunction("count_terms",
      args => CountTermsExpr(args.head,
        args(1).eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType).map(_.toString).toSeq), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_strings",
      args => ShingleStringsExpr(args.head, args(1).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_intersect_count",
      args => SortedIntersectCountExpr(args.head, args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hilbert_index",
      args => HilbertIndexExpr(args.head, args(1), args(2).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("kmv_sketch",
      args => graft.functions.expressions.SketchAggregates
        .KmvSketchAgg(args.head, args(1).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("cms_sketch",
      args => graft.functions.expressions.SketchAggregates.CmsSketchAgg(args.head,
        args(1).eval(null).toString.toInt, args(2).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("bloom_sketch",
      args => graft.functions.expressions.SketchAggregates.BloomSketchAgg(args.head,
        args(1).eval(null).toString.toInt, args(2).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("bottom_k_struct",
      args => graft.functions.expressions.SketchAggregates
        .BottomKStructAgg(args.head, args(1).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("hll_sketch",
      args => graft.functions.expressions.SketchAggregates
        .HllSketchAgg(args.head, args(1).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("kll_sketch",
      args => graft.functions.expressions.SketchAggregates
        .KllSketchAgg(args.head, args(1).eval(null).toString.toInt), "scala_udf")
    reg.createOrReplaceTempFunction("mg_sketch",
      args => graft.functions.expressions.SketchAggregates
        .MgSketchAgg(args.head, args(1).eval(null).toString.toInt), "scala_udf")
  }
}
