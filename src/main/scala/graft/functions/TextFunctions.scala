package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis functions for large-scale training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure Column expressions
  * over codegen'd built-ins — no UDFs — so they run inside whole-stage codegen
  * and scale linearly with no shuffle.
  */
object TextFunctions {

  /** Trim ALL whitespace (Spark's trim strips only ' ' — a leading tab
    * would otherwise produce a phantom empty token after split). */
  def wsTrim(c: Column): Column = regexp_replace(c, "^\\s+|\\s+$", "")

  /** Repair cp1252/Latin-1 mojibake ("Ã©" → "é", "â€™" → "'") via a strict
    * round trip — text whose bytes don't form the mojibake pattern passes
    * through untouched. Native codegen'd expression
    * ([[graft.functions.expressions.Kernels.fixMojibake]]); the standard
    * web-scrape cleanup pass before tokenization/quality scoring. */
  def fixMojibake(c: Column): Column =
    graft.functions.expressions.HashExpressions.fix_mojibake(c)

  /** Mask Luhn-VALID payment-card numbers (13–19 digits, optionally
    * space/dash separated) as `[CARD-<last4>]`, leaving checksum-failing
    * digit runs (phone numbers, ids, timestamps) untouched — the
    * precision-preserving PII pass regex-only maskers can't express.
    * Native codegen'd expression
    * ([[graft.functions.expressions.Kernels.maskCardNumbers]]). */
  def maskCardNumbers(c: Column): Column =
    graft.functions.expressions.HashExpressions.mask_card_numbers(c)

  /** Unicode-normalize text (default NFC — composed canonical form): the
    * tokenizer-prep pass that makes decomposed accents, compatibility
    * ligatures (NFKC), and width variants hash/join/dedup as one spelling.
    * Native codegen'd expression with an already-normalized fast path. */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    graft.functions.expressions.HashExpressions.unicode_normalize(c, form)

  /** Whitespace token count. Empty/blank text counts 0. */
  def tokenCount(c: Column): Column =
    when(wsTrim(c) === "", lit(0)).otherwise(size(split(wsTrim(c), "\\s+")))

  // ---------------------------------------------- dictionary-term masking

  /** Blocklist scrub: mask every dictionary-term occurrence (multi-word
    * phrases included) with `token`, leftmost-longest non-overlapping.
    * Native Aho-Corasick expression — linear in text length regardless of
    * dictionary size, where a regex alternation of N terms backtracks. */
  def maskTerms(c: Column, dict: Seq[String],
                token: String = "[REDACTED]"): Column =
    graft.functions.expressions.HashExpressions.mask_terms(c, dict, token)

  /** Count of regions [[maskTerms]] masks (audit surface). */
  def maskTermCount(c: Column, dict: Seq[String]): Column =
    graft.functions.expressions.HashExpressions.count_terms(c, dict)

  // ------------------------------------------------- HTML text extraction
  // Markup removal + entity unescape — the ingestion step between a raw web
  // crawl and every text operator above. Tag strip runs FIRST so an escaped
  // literal ("&lt;b&gt;") unescapes to visible text instead of becoming a
  // strippable tag; `&amp;` unescapes LAST so "&amp;lt;" yields "&lt;" (one
  // level of unescaping, never two).

  val HtmlTagPattern = "<[^>]+>"
  private val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ")

  /** Strip tags, unescape the common entity set, collapse the whitespace the
    * removed block tags leave behind. Codegen'd replace/regexp chain. */
  def stripHtml(c: Column): Column = {
    val noTags = regexp_replace(c, HtmlTagPattern, "")
    val unescaped = HtmlEntities.foldLeft(noTags) { case (acc, (ent, ch)) =>
      replace(acc, lit(ent), lit(ch))
    }
    wsTrim(regexp_replace(replace(unescaped, lit("&amp;"), lit("&")),
      "\\s{2,}", " "))
  }

  /** Markup density (tag count on the raw text) — the quality signal that a
    * "document" is really a nav page or boilerplate shell. */
  def htmlTagCount(c: Column): Column =
    regexp_count(c, lit(HtmlTagPattern)).cast(LongType)

  // ------------------------------------- Gopher-style quality-rule filter
  // The repetition-free subset of the Gopher (Rae et al. 2021) document
  // rules, formulated so every rule is EXACT under a hash-compare oracle:
  // counts are integers and each ratio threshold is an integer
  // cross-multiplication — no floating-point ratio ever materializes.

  /** Per-document rule columns: raw counts plus one boolean per rule and the
    * conjunction `pass`. All codegen'd built-ins, one projection, no shuffle:
    *  - ok_word_count:   5 <= words <= 100000
    *  - ok_mean_word_len: mean word length in [3, 10]  (3w <= chars <= 10w)
    *  - ok_symbol_ratio: '#' symbols <= 10% of words
    *  - ok_bullet_ratio: <= 90% of lines start with "- " or "* "
    *  - ok_ellipsis_ratio: <= 30% of lines end with "..."
    *  - ok_alpha_ratio:  >= 80% of words contain a letter
    *  - has_stopword:    contains one of the/and/of as a whole word
    */
  def gopherFlags(c: Column): Seq[Column] = {
    val words = regexp_count(c, lit("\\S+")).cast(LongType)
    val alphaWords = regexp_count(c, lit("\\S*[A-Za-z]\\S*")).cast(LongType)
    val nonWsChars = length(regexp_replace(c, "\\s", "")).cast(LongType)
    val hashes = regexp_count(c, lit("#")).cast(LongType)
    val lines = split(c, "\n")
    val nLines = size(lines).cast(LongType)
    val bulletLines = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("* "))).cast(LongType)
    val ellipsisLines = size(filter(lines, l => l.endsWith("..."))).cast(LongType)
    val stop = regexp_like(c, lit("\\bthe\\b|\\band\\b|\\bof\\b"))
    val okWc = words >= 5 && words <= 100000
    val okMwl = lit(3) * words <= nonWsChars && nonWsChars <= lit(10) * words
    val okSym = lit(10) * hashes <= words
    val okBul = lit(10) * bulletLines <= lit(9) * nLines
    val okEll = lit(10) * ellipsisLines <= lit(3) * nLines
    val okAlpha = lit(5) * alphaWords >= lit(4) * words
    Seq(
      words.as("n_words"), nLines.as("n_lines"),
      bulletLines.as("n_bullet_lines"), ellipsisLines.as("n_ellipsis_lines"),
      alphaWords.as("n_alpha_words"),
      okWc.as("ok_word_count"), okMwl.as("ok_mean_word_len"),
      okSym.as("ok_symbol_ratio"), okBul.as("ok_bullet_ratio"),
      okEll.as("ok_ellipsis_ratio"), okAlpha.as("ok_alpha_ratio"),
      stop.as("has_stopword"),
      (okWc && okMwl && okSym && okBul && okEll && okAlpha && stop).as("pass"))
  }

  // --------------------------------------------- URL canonicalization
  // Canonical form for dedup/per-domain stats: lowercase scheme+host, strip
  // `www.`, drop `utm_*` tracking params, drop the fragment, strip the
  // trailing path slash. Split once with one anchored regex, rebuild from
  // the normalized parts — every step a codegen'd built-in shared verbatim
  // with the oracle.

  // (?i:) on the scheme only: crawls carry "HTTP://" — the host/path split
  // must not reject them (lowercasing happens during reassembly)
  val UrlSplitPattern = "^((?i:https?))://([^/?#]+)([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Registrable host: lowercased, `www.`-stripped. Empty for non-URLs. */
  def urlDomain(u: Column): Column =
    regexp_replace(lower(regexp_extract(u, UrlSplitPattern, 2)), "^www\\.", "")

  /** Canonical URL (see above). Non-matching input canonicalizes to the empty
    * string — callers filter or quarantine those rows. */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, UrlSplitPattern, 1))
    val path = regexp_replace(regexp_extract(u, UrlSplitPattern, 3), "/+$", "")
    val rawQuery = regexp_extract(u, UrlSplitPattern, 4)
    val noUtm = regexp_replace(rawQuery, "utm_[A-Za-z]+=[^&#]*(&|$)", "")
    val query = regexp_replace(noUtm, "[?&]+$", "")
    when(scheme === "", lit(""))
      .otherwise(concat(scheme, lit("://"), urlDomain(u), path, query))
  }

  /** BPE-ish token-count estimate: counts maximal runs of letters, digits, or
    * other non-space symbols (each optionally preceded by one space) — the
    * GPT-2-style pre-tokenizer shape, minus lookaheads so the same regex runs on
    * Java regex and RE2. */
  val BpeishPattern = " ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"
  def bpeishTokenCount(c: Column): Column = regexp_count(c, lit(BpeishPattern))

  /** Stopword sets for the n-gram language-ID heuristic: score each language by
    * occurrences of its most frequent function words, take the argmax
    * (ties → earlier language in this list). Deterministic and SQL-expressible. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "con", "para"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"),
  )

  /** All languages' stopword scores in ONE Aho-Corasick scan
    * (dict_scores): whole-word (\b) counting for ASCII-word stopwords,
    * substring counting for CJK (where Java's ASCII \b never matches) —
    * count-for-count identical to the per-word regexp_count formulation the
    * oracles replay (MultiDictCounter documents the equivalence proof), but
    * one text pass instead of 40 regex families (~2.5 s → ~0.2 s per
    * langid pass at sf0.1). */
  def langScores(c: Column): Column =
    graft.functions.expressions.HashExpressions
      .dict_scores(c, LangStopwords.map(_._2))

  /** Per-language stopword score (sum of stopword hit counts). */
  def langScore(c: Column, lang: String): Column =
    element_at(langScores(c), LangStopwords.indexWhere(_._1 == lang) + 1)

  /** Language-ID: argmax over [[LangStopwords]]; "und" (undetermined) when no
    * stopword of any language appears. */
  def langId(c: Column): Column = {
    val sc = langScores(c)
    val scores = LangStopwords.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(sc, i + 1)
    }
    val best = scores.map(_._2).reduce(greatest(_, _))
    val pick = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight means the FIRST language in list order wins ties (each earlier
    // when() shadows later ones).
    pick
  }

  /** Quality-score components + weighted score in [0,1]:
    * alpha ratio, whitespace sanity, mean word length in a sane band, doc length
    * band, stopword presence. Mirrors the shape of published heuristic filters
    * (C4/Gopher-style length+symbol+stopword rules) with exact integer counts so
    * any SQL engine reproduces it bit-for-bit. */
  def qualityScore(c: Column): Column = {
    val chars = length(c).cast(DoubleType)
    val alpha = regexp_count(c, lit("[\\p{L}]")).cast(DoubleType)
    val spaces = regexp_count(c, lit("\\s")).cast(DoubleType)
    val words = tokenCount(c).cast(DoubleType)
    val alphaRatio = when(chars > 0, alpha / chars).otherwise(lit(0.0))
    val meanWordLen = when(words > 0, (chars - spaces) / words).otherwise(lit(0.0))
    val lenOk = when(chars >= 50 && chars <= 100000, lit(1.0)).otherwise(lit(0.0))
    val wordLenOk = when(meanWordLen >= 2.0 && meanWordLen <= 12.0, lit(1.0)).otherwise(lit(0.0))
    val stopOk = when(langScore(c, "en") > 0, lit(1.0)).otherwise(lit(0.0))
    alphaRatio * 0.4 + lenOk * 0.2 + wordLenOk * 0.2 + stopOk * 0.2
  }

  /** PII patterns for detect/scrub passes over free text — the document-level
    * complement of the column-level hash/redact/tokenize transforms. Patterns
    * avoid lookarounds so the same regex runs on Java regex and RE2. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    // Order is the scrub contract: emails first, so their dotted domains are
    // never half-eaten by the dotted-phone or IPv4 rules; IPv4 last.
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn"   -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
    "ip"    -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
  )

  /** Count of PII matches of one kind. */
  def piiCount(c: Column, kind: String): Column =
    regexp_count(c, lit(PiiPatterns.toMap.apply(kind)))

  /** Scrub all PII kinds, replacing each match with `[<KIND>]`. */
  def piiScrub(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (kind, pat)) =>
      regexp_replace(acc, pat, s"[${kind.toUpperCase}]")
    }

  /** Token-window chunks for pretraining prep: split a document into windows
    * of `chunkTokens` whitespace tokens advancing by `chunkTokens - overlap`,
    * the last (possibly short) window included. Returns
    * array<struct<chunk_id int, chunk>> — explode for one row per chunk.
    * Pure HOF expression: no UDF, no shuffle. */
  def chunkTokens(c: Column, chunkTokens: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < chunkTokens, "0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = split(wsTrim(c), "\\s+")
    val n = size(toks)
    // number of windows: ceil(max(n - overlap, 1) / stride), at least 1
    val numChunks = greatest(ceil((n - overlap).cast("double") / stride).cast("int"), lit(1))
    transform(sequence(lit(0), numChunks - 1), i =>
      struct(i.as("chunk_id"),
        array_join(slice(toks, i * stride + 1, lit(chunkTokens)), " ").as("chunk")))
  }

  /** Content fingerprint: SHA-256 of normalized text (lowercase, whitespace
    * collapsed, trimmed). Equal fingerprints == exact near-whitespace dup. */
  def fingerprint(c: Column): Column =
    sha2(trim(regexp_replace(lower(c), "\\s+", " ")), 256)

  /** Rolling polynomial hash (Rabin-Karp, base 257 mod 2^31-1) of each
    * char-k-gram, as an array column — building block for winnowing-style
    * fingerprints. Native single-scan expression: the HOF rebuild
    * ([[rollingHashesHof]], kept as a value cross-check) costs O(n²·k) per
    * document because char-indexed substr on UTF8String is O(position). */
  def rollingHashes(c: Column, k: Int): Column =
    graft.functions.expressions.HashExpressions.rolling_hashes(c, k)

  /** HOF formulation of [[rollingHashes]] — spec cross-check only. */
  def rollingHashesHof(c: Column, k: Int): Column = {
    val n = length(c)
    val hashes = transform(sequence(lit(1), n - (k - 1)), i =>
      aggregate(
        transform(sequence(lit(0), lit(k - 1)), j => ascii(c.substr(i + j, lit(1)))),
        lit(0L),
        (acc, ch) => pmod(acc * 257L + ch.cast(LongType), lit(2147483647L))
      ))
    when(n >= k, hashes).otherwise(array().cast(ArrayType(LongType)))
  }
}
