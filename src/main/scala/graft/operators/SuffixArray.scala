package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact-substring dedup at CHARACTER granularity — the Lee et al.
  * ("Deduplicating Training Data Makes Language Models Better")
  * ExactSubstr contract: every character inside a substring of length ≥
  * `minLen` CHARACTERS that occurs ≥ 2 times anywhere in the corpus is
  * scrubbed. The token-n-gram scrubs ([[Repetition.scrubRepeatedSpans]],
  * q107/q176) need ≥ n whole tokens to align; a 60-character boilerplate of
  * four long tokens sails straight through an 8-token gram — this operator
  * is the character-exact complement. A repeat of ANY length M ≥ minLen is
  * exactly the union of its M−minLen+1 hot length-minLen windows, so
  * masking hot windows covers arbitrary-length repeats with no
  * gram-alignment loss.
  *
  * MECHANISM — rolling-hash nomination + exact verification:
  *   1. ONE codegen kernel pass emits a 64-bit rolling hash per
  *      length-`minLen` code-point window ([[graft.functions.expressions
  *      .Kernels.charWindowHashes]]); windows are per-document, so nothing
  *      can straddle a document boundary by construction.
  *   2. Hash classes with ≥ 2 members are HOT — a count aggregation over
  *      8-byte keys (map-side combinable, no giant rows even on a
  *      degenerate single-character corpus).
  *   3. Candidate positions (members of hot classes) re-extract their
  *      actual `minLen`-char window text and re-classify BY CONTENT — a
  *      hash collision dies here (its content class is a singleton), so
  *      collisions cost verify work, never a spurious mask. Every true
  *      repeat's windows share a hash, so no candidate is ever missed:
  *      the result is EXACT.
  *   4. Masked starts fold back per document and one kernel call rebuilds
  *      the scrubbed text ([[graft.functions.expressions.Kernels
  *      .maskCharSpans]]) — no per-character rows anywhere.
  *
  * SCALE: the corpus-sized stages shuffle one 8-byte hash per character
  * (the count) plus one 16-byte (gpos, h) row per character (the hot
  * semi-join) — ONE round, vs the log₂(minLen) ≈ 6 join+re-rank rounds of
  * the prefix-doubling construction this replaces
  * ([[scrubRepeatedCharSpansPrefixDoubling]], kept as the spec'd reference
  * implementation). Every later stage is CANDIDATE-sized: duplicated
  * characters plus the hash-collision tail (~m²/2⁶⁴ expected windows —
  * negligible even at 10¹³ windows), so the expensive joins track the
  * dedup signal, not the corpus.
  *
  * Positions live at `doc_id·C + cpos` (C > max doc length, no cumsum —
  * fully parallel); within-document repeats count (the reference
  * contract), unlike the ≥-2-distinct-docs gram scrubs.
  *
  * Determinism: classes are content classes, coverage is a set union, and
  * the rebuild is position-ordered — the whole operator is
  * oracle-replayable.
  *
  * @return (idCol, n_chars, n_masked, scrubbed_text) one row per doc. */
object SuffixArray {

  private def positionalC(lens: DataFrame, idCol: String): Long =
    lens.agg(max(col("__len")), min(col("__doc").cast(LongType))).head() match {
      case r if r.isNullAt(0) => 2L
      case r =>
        require(r.getLong(1) >= 0L,
          s"$idCol must be non-negative for the positional encoding, " +
            s"got ${r.getLong(1)}")
        r.getInt(0).toLong + 2L
    }

  /** @param keepFirst when true, each hot window's CORPUS-FIRST occurrence
    *        (minimum global position = lexicographic (doc, pos), the q176
    *        convention at character granularity) survives and only the
    *        other copies are scrubbed — the full Lee et al. keep-one
    *        contract. Default false = mask every occurrence (the
    *        boilerplate-removal posture of q107). */
  def scrubRepeatedCharSpans(docs: DataFrame, idCol: String, textCol: String,
                             minLen: Int, keepFirst: Boolean = false): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2: $minLen")
    import graft.functions.expressions.HashExpressions.{char_window_hashes, mask_char_spans}
    val base = docs.select(col(idCol).as("__doc"), col(textCol).as("__text"))
      .localCheckpoint(true)
    val lens = base.select(col("__doc"), length(col("__text")).as("__len"))
    // C (and the id-domain check): one scalar row over a narrow agg —
    // the driver reads two longs. Ids must be non-negative: the gpos
    // encode/decode uses truncating div/mod, which mis-attributes
    // positions of negative ids to other documents.
    val c = positionalC(lens, idCol)

    // 1. nomination: (gpos, h) per window — 1-based start positions so the
    // verify stage's SQL substring (1-based, code-point) lines up
    val winh = base.select(col("__doc"),
        posexplode(char_window_hashes(col("__text"), minLen)))
      .select((col("__doc") * c + col("pos") + lit(1L)).as("gpos"),
        col("col").as("h"))

    // 2. hot hash classes: count only (streaming agg — safe even when one
    // class holds most of the corpus)
    val hotH = winh.groupBy(col("h")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select(col("h"))

    // 3. candidates: members of hot classes, folded per document (list
    // size bounded by the doc's own length — the same order as its text)
    val candPerDoc = winh.join(hotH, Seq("h"), "left_semi")
      .select(expr(s"gpos div $c").as("__doc"), (col("gpos") % c).as("cpos"))
      .groupBy(col("__doc")).agg(collect_list(col("cpos")).as("__ps"))

    // 4. exact verify: candidate windows' literal text, re-classified by
    // content; a class that is only hash-hot (collision) is a content
    // singleton and drops out here. The candidate list is extracted in
    // WindowChunk slices so a wholly-duplicated huge document cannot
    // materialize all its windows' text in one row.
    val wins = base.join(candPerDoc, Seq("__doc"))
      .select(col("__doc"), col("__text"), explode(expr(
        s"transform(sequence(0, CAST((size(__ps) - 1) div $WindowChunk AS INT)), " +
          s"ci -> slice(__ps, ci * $WindowChunk + 1, $WindowChunk))")).as("__pc"))
      .select(col("__doc"), explode(expr(
        s"transform(__pc, p -> struct(p AS cpos, " +
          s"substring(__text, CAST(p AS INT), $minLen) AS w))")).as("x"))
      .select((col("__doc") * c + col("x.cpos")).as("gpos"), col("x.w").as("w"))
    val hotW = wins.groupBy(col("w"))
      .agg(count(lit(1)).as("__n"), min(col("gpos")).as("__first"))
      .filter(col("__n") >= 2)
    // keepFirst: the minimum gpos of each content class IS
    // lexicographic-first (doc, pos) because gpos = doc*C + pos with
    // pos < C — one aggregation, no window sort
    val maskedStarts = wins.join(hotW, Seq("w"))
      .filter(if (keepFirst) col("gpos") =!= col("__first") else lit(true))
      .select(expr(s"gpos div $c").as("__doc"), (col("gpos") % c).as("s"))

    // 5. per-doc rebuild: sorted span starts -> one kernel call
    val spansPerDoc = maskedStarts.groupBy(col("__doc"))
      .agg(sort_array(collect_list(col("s"))).as("__starts"))
    base.join(spansPerDoc, Seq("__doc"), "left")
      .select(col("__doc"), col("__text"),
        mask_char_spans(col("__text"),
          coalesce(col("__starts"), lit(Array.empty[Long])), minLen).as("__m"))
      .select(col("__doc").as(idCol),
        length(col("__text")).cast(LongType).as("n_chars"),
        col("__m.n_masked").as("n_masked"),
        col("__m.scrubbed").as("scrubbed_text"))
  }

  /** Window starts per kernel call / per extraction row — bounds the
    * per-row memory of the (hash, text) window materializations to
    * ~chunk × minLen bytes, so a single multi-megabyte document cannot
    * build a gigabyte array before explode splits it. */
  private val WindowChunk = 1 << 16

  /** The per-position window frame `(__doc, cpos, h, w)` the index builds
    * and the incremental scrub share — public so a caller driving BOTH (the
    * streaming gate) can run the kernel ONCE, checkpoint, and hand the same
    * frame to each. */
  def batchWindows(docs: DataFrame, idCol: String, textCol: String,
                   minLen: Int): DataFrame =
    windowsOf(docs, idCol, textCol, minLen)

  private def windowsOf(docs: DataFrame, idCol: String, textCol: String,
                        minLen: Int): DataFrame = {
    import graft.functions.expressions.HashExpressions.char_windows
    // long documents are SLICED before the kernel: chunk i covers window
    // starts [i·C, (i+1)·C) via a substring of C+minLen−1 code points, so
    // every window lands in exactly one chunk and per-row memory is
    // bounded whatever the document length
    val lastChunk = greatest(lit(0),
      expr(s"CAST((length(__text) - $minLen) div $WindowChunk AS INT)"))
    docs.select(col(idCol).as("__doc"), col(textCol).as("__text"))
      .select(col("__doc"), col("__text"),
        explode(sequence(lit(0), lastChunk)).as("__ci"))
      .select(col("__doc"), (col("__ci").cast(LongType) * WindowChunk).as("__off"),
        expr(s"substring(__text, CAST(__ci * $WindowChunk + 1 AS INT), " +
          s"${WindowChunk + minLen - 1})").as("__slice"))
      .select(col("__doc"), col("__off"),
        posexplode(char_windows(col("__slice"), minLen)))
      .select(col("__doc"), (col("__off") + col("pos") + 1).as("cpos"),
        col("col.h").as("h"), col("col.w").as("w"))
  }

  /** The persisted HOT-WINDOW INDEX the daily form of the exact-substring
    * scrub consumes: one row per DISTINCT `minLen`-window CONTENT in the
    * corpus — `(h, w, cnt, first_doc, first_pos)` where `h` is the
    * window's rolling hash (the narrow probe/bucket key — declare it a
    * [[graft.catalog.FileStats]] bloom column to file-skip the index on
    * daily probes), `w` the window text itself (the index is keyed by
    * CONTENT, so hash collisions can never merge distinct windows), `cnt`
    * its corpus occurrence count, and `(first_doc, first_pos)` its
    * lexicographically-first occurrence (the keep-one exemption). This is
    * a sufficient statistic for the union-corpus masking of ANY future
    * batch: hotness needs only counts, and keep-first needs only the
    * global minimum — neither needs the stored text again. */
  def charWindowIndex(docs: DataFrame, idCol: String, textCol: String,
                      minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2: $minLen")
    windowsOf(docs, idCol, textCol, minLen)
      .groupBy(col("w"))
      .agg(max(col("h")).as("h"), // h is a function of w — any row's value
        count(lit(1)).as("cnt"),
        min(struct(col("__doc").as("d"), col("cpos").as("p"))).as("__f"))
      .select(col("h"), col("w"), col("cnt"),
        col("__f.d").as("first_doc"), col("__f.p").as("first_pos"))
  }

  /** [[charWindowIndex]] at PER-DOCUMENT granularity: one row per
    * (document, distinct window content) — `(h, w, cnt, first_doc,
    * first_pos)` where `first_doc` IS the contributing document and
    * `cnt`/`first_pos` are within-document. A valid decomposition of the
    * union index (per-content sums and struct-mins recover it — what
    * [[incrementalScrubRepeatedCharSpans]] aggregates after its hash
    * cut), with one property the compact form cannot have: every row
    * belongs to exactly ONE document, so right-to-be-forgotten deletion
    * ([[graft.catalog.Retention.deleteRowsAll]] on `first_doc`) removes
    * exactly that document's contribution and the remaining aggregation
    * equals a never-contained build — the same row-per-id forgettability
    * contract as the minhash/BM25/IVF-PQ index tables. The streaming
    * gate appends THIS form. */
  def charWindowIndexPerDoc(docs: DataFrame, idCol: String, textCol: String,
                            minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2: $minLen")
    perDocIndexOfWindows(windowsOf(docs, idCol, textCol, minLen))
  }

  /** [[charWindowIndexPerDoc]] from an already-computed [[batchWindows]]
    * frame — the gate's one-kernel-pass path. */
  def perDocIndexOfWindows(windows: DataFrame): DataFrame =
    windows
      .groupBy(col("__doc"), col("w"))
      .agg(max(col("h")).as("h"), count(lit(1)).as("cnt"),
        min(col("cpos")).as("first_pos"))
      .select(col("h"), col("w"), col("cnt"),
        col("__doc").as("first_doc"), col("first_pos"))

  /** INCREMENTAL exact-substring scrub — the daily form of
    * [[scrubRepeatedCharSpans]], completing the fixpoint-index family
    * (minhash q168, BM25 q170, CC q171, LPA q208): scrub a BATCH of new
    * documents against stored ∪ batch, where the stored corpus
    * participates ONLY through its persisted [[charWindowIndex]] — no
    * stored text is re-read, and the index is cut to batch-touched hash
    * keys map-side (a guarded-broadcast semi-join) before anything joins,
    * so the daily pair work is batch-scoped by construction.
    *
    * CONTRACT — equal to the from-scratch run on the union corpus, sliced
    * to the batch: a batch window is masked iff its content occurs ≥ 2
    * times in stored ∪ batch, except (keepFirst) its occurrence IS the
    * union's lexicographically-first `(doc, pos)`. Exact because the index
    * is keyed by window CONTENT (`w`) — the hash only prunes. Stored
    * documents' already-released scrubs are not retroactively updated
    * (released data is released — the shared posture of every incremental
    * operator here); re-running from scratch over everything remains the
    * dataset-tier truth.
    *
    * @param index the `(h, w, cnt, first_doc, first_pos)` frame from
    *              [[charWindowIndex]] / previous calls' updated index
    * @return (report: `(idCol, n_chars, n_masked, scrubbed_text)` one row
    *         per batch doc, updatedIndex: the union corpus's index — the
    *         next day's input, making the operator its own fixpoint) */
  /** @param precomputedWindows a MATERIALIZED (localCheckpointed)
    *        [[batchWindows]] frame over `batch`, when the caller already
    *        built one (the streaming gate runs the window kernel once and
    *        shares the frame between the scrub and its index append);
    *        None ⇒ computed here.
    * @param needUpdatedIndex false when the caller DISCARDS the returned
    *        updated index (the streaming gate appends per-doc rows instead;
    *        q214 consumes only the report): the untouched-rows anti-join is
    *        then built fully LAZILY — no eager distinct/checkpoint/guard-
    *        count of the batch's window-content set, which was a full
    *        batch-window shuffle paid per call for a frame nobody executed
    *        (guide §1.2 — don't compute things you throw away). The frame
    *        returned is row-identical either way; only the physical
    *        strategy (checkpoint + guarded broadcast hint) differs. A
    *        caller that opts out but executes the index anyway is CORRECT
    *        but pays the operator's own anti-cost: the unhinted anti-join
    *        plans as a sort-merge that shuffles the ENTIRE stored index —
    *        exactly the O(index) exchange this operator exists to avoid —
    *        and recomputes touched/stats per action. Opt out ONLY when the
    *        index leg is discarded (`val (report, _) = …`). */
  def incrementalScrubRepeatedCharSpans(index: DataFrame, batch: DataFrame,
                                        idCol: String, textCol: String,
                                        minLen: Int, keepFirst: Boolean = false,
                                        broadcastMaxRows: Long = 2000000L,
                                        precomputedWindows: Option[DataFrame] = None,
                                        needUpdatedIndex: Boolean = true): (DataFrame, DataFrame) = {
    require(minLen >= 2, s"minLen must be >= 2: $minLen")
    import graft.functions.expressions.HashExpressions.mask_char_spans
    def hintIfSmall(df: DataFrame): DataFrame =
      Broadcasting.hintIfSmall(df, broadcastMaxRows)
    // base is consumed TWICE only when the windows are computed here (the
    // kernel pass + the report join) — with precomputedWindows the caller
    // already materialized the batch, and re-checkpointing its projection
    // was a second full materialization of the batch text per gate batch
    val baseLazy = batch.select(col(idCol).as("__doc"), col(textCol).as("__text"))
    val base =
      if (precomputedWindows.isDefined) baseLazy else baseLazy.localCheckpoint(true)
    val bwin = precomputedWindows.getOrElse(
      windowsOf(base, "__doc", "__text", minLen).localCheckpoint(true))
    // stored side: index rows of batch-touched HASH keys only, evaluated
    // map-side against the (small) batch key set — the stored index never
    // shuffles and stored-only windows never surface. The aggregation
    // AFTER the cut (batch-scoped, cheap) means the index may be any
    // DECOMPOSITION of the union index whose per-content sums/mins equal
    // it — e.g. the per-batch partitions a streaming gate appends
    // ([[graft.streaming.StreamingOps.ingestSubstringDedupGate]]) — not
    // only the one-row-per-content form charWindowIndex builds.
    // materialized before hintIfSmall: its guard count() would otherwise
    // recompute the batch-window distinct once for the guard and again in
    // the join (Broadcasting documents the checkpointed-input precondition)
    val bKeysH = bwin.select(col("h")).distinct().localCheckpoint(true)
    // touched flows only into stats (one consumer) — checkpointing it was
    // one extra materialization of the batch-scoped slice per gate batch
    val touched = index
      .join(hintIfSmall(bKeysH), Seq("h"), "left_semi")
      .groupBy(col("w"))
      .agg(sum(col("cnt")).as("__scnt"),
        min(struct(col("first_doc").as("d"), col("first_pos").as("p"))).as("__sf"))
    val bAgg = bwin.groupBy(col("w")).agg(max(col("h")).as("h"),
      count(lit(1)).as("__bcnt"),
      min(struct(col("__doc").as("d"), col("cpos").as("p"))).as("__bf"))
    val statsLazy = bAgg.join(touched, Seq("w"), "left")
      .select(col("w"), col("h"),
        (col("__bcnt") + coalesce(col("__scnt"), lit(0L))).as("__ucnt"),
        when(col("__scnt").isNull, col("__bf"))
          .otherwise(least(col("__sf"), col("__bf"))).as("__uf"))
    // masking + the index merge both read stats — materialize only when the
    // merge leg is live; otherwise masking is its single consumer
    val stats =
      if (needUpdatedIndex) statsLazy.localCheckpoint(true) else statsLazy
    val maskedStarts = bwin.join(stats.select(col("w"), col("__ucnt"), col("__uf")), Seq("w"))
      .filter(col("__ucnt") >= 2 &&
        (if (keepFirst)
           struct(col("__doc").as("d"), col("cpos").as("p")) =!= col("__uf")
         else lit(true)))
      .select(col("__doc"), col("cpos").as("s"))
    val spansPerDoc = maskedStarts.groupBy(col("__doc"))
      .agg(sort_array(collect_list(col("s"))).as("__starts"))
    val report = base.join(spansPerDoc, Seq("__doc"), "left")
      .select(col("__doc"), col("__text"),
        mask_char_spans(col("__text"),
          coalesce(col("__starts"), lit(Array.empty[Long])), minLen).as("__m"))
      .select(col("__doc").as(idCol),
        length(col("__text")).cast(LongType).as("n_chars"),
        col("__m.n_masked").as("n_masked"),
        col("__m.scrubbed").as("scrubbed_text"))
    // updated index: untouched stored rows pass through (content-keyed
    // anti-join, map-side via the batch's distinct window set); touched
    // and batch-new contents carry the merged count and first occurrence.
    // needUpdatedIndex=false ⇒ no checkpoint/guard-count of the window-
    // content set: the whole leg stays unexecuted unless someone runs it
    val bwAll = bwin.select(col("w")).distinct()
    val untouched =
      if (needUpdatedIndex)
        index.join(hintIfSmall(bwAll.localCheckpoint(true)), Seq("w"), "left_anti")
      else index.join(bwAll, Seq("w"), "left_anti")
    val merged = stats.select(col("h"), col("w"), col("__ucnt").as("cnt"),
      col("__uf.d").as("first_doc"), col("__uf.p").as("first_pos"))
    (report, untouched.select("h", "w", "cnt", "first_doc", "first_pos")
      .unionByName(merged))
  }

  /** Equality-class ids for (r1, r2) pairs: distinct pairs zipWithIndex —
    * the one RDD use (Spark's canonical distributed dense-id assignment);
    * values are meaningless beyond equality, so no global sort is paid. */
  private def rankPairs(pairs: DataFrame): DataFrame = {
    val ss = pairs.sparkSession
    val distinct = pairs.select(col("r1"), col("r2")).distinct()
    val rdd = distinct.rdd.zipWithIndex().map { case (row, i) =>
      Row(row.getLong(0), row.getLong(1), i + 1L)
    }
    ss.createDataFrame(rdd, StructType(Seq(StructField("r1", LongType),
      StructField("r2", LongType), StructField("rk", LongType))))
  }

  /** The REFERENCE implementation: distributed PREFIX-DOUBLING suffix
    * ranks (Manber–Myers truncated at `minLen` — position i's rank at
    * level k equality-classes the corpus substring [i, i+k); each round
    * one equi-join + one distinct-rank re-ranking, all keyed shuffles of
    * longs). Exact by construction with no hashing anywhere, which is why
    * it stays as the spec oracle for [[scrubRepeatedCharSpans]] — but it
    * shuffles the corpus log₂(minLen) times at one row per CHARACTER,
    * so the rolling-hash form above is the production path.
    *
    * Cross-document and cross-gap safety: one unique separator row per
    * document at `doc_id·C + len`; any window that leaves its document
    * contains that document's separator in its recursion leaves, so its
    * rank class is a singleton and can never be hot. */
  def scrubRepeatedCharSpansPrefixDoubling(docs: DataFrame, idCol: String,
                                           textCol: String, minLen: Int,
                                           keepFirst: Boolean = false): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2: $minLen")
    val base = docs.select(col(idCol).as("__doc"), col(textCol).as("__text"))
      .localCheckpoint(true)
    val lens = base.select(col("__doc"), length(col("__text")).as("__len"))
    val c = positionalC(lens, idCol)
    // character stream: substring-based (code-point aligned with SQL
    // engines' substr; split-by-empty-regex is edge-cased across JDKs).
    // Empty docs must yield ZERO char rows: sequence(1, 0) is [1, 0] (the
    // step defaults to -1 when start > stop), which would mint phantom
    // chars colliding with the separator slot — guard with an empty array.
    val chars = base.select(col("__doc"),
        posexplode(expr("CASE WHEN length(__text) >= 1 THEN " +
          "transform(sequence(1, length(__text)), i -> substring(__text, i, 1)) " +
          "ELSE array() END")))
      .select(col("__doc"), col("pos").cast(LongType).as("cpos"), col("col").as("ch"))
      .localCheckpoint(true)
    val seps = lens.select(col("__doc"), col("__len").cast(LongType).as("cpos"),
      concat(lit("\u0000"), col("__doc").cast("string")).as("ch"))
    val stream = chars.unionByName(seps)
      .select((col("__doc") * c + col("cpos")).as("gpos"), col("ch"))

    // level-1 ranks: equality classes of single characters (separators are
    // length-2+ strings, so they can never equal a real character)
    val alphabet = {
      val ss = stream.sparkSession
      val rdd = stream.select(col("ch")).distinct().rdd.zipWithIndex()
        .map { case (row, i) => Row(row.getString(0), i + 1L) }
      ss.createDataFrame(rdd, StructType(Seq(
        StructField("ch", org.apache.spark.sql.types.StringType),
        StructField("r", LongType))))
    }
    var ranks = stream.join(alphabet, Seq("ch")).select(col("gpos"), col("r"))
      .localCheckpoint(true)

    // prefix doubling, truncated at minLen (the last round uses the
    // overlapping-windows combine: rank[i, i+k) x rank[i+step, i+step+k)
    // equality-classes [i, i+k+step) for any step <= k)
    var k = 1
    while (k < minLen) {
      val step = math.min(k, minLen - k)
      val shifted = ranks.select((col("gpos") - step).as("gpos"), col("r").as("r2"))
      val paired = ranks.join(shifted, Seq("gpos"), "left")
        .select(col("gpos"), col("r").as("r1"), coalesce(col("r2"), lit(0L)).as("r2"))
      ranks = paired.join(rankPairs(paired), Seq("r1", "r2"))
        .select(col("gpos"), col("rk").as("r"))
        .localCheckpoint(true)
      k += step
    }

    // hot windows (LCP >= minLen runs) -> per-doc covered characters
    val hotR = ranks.groupBy(col("r")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select(col("r"))
    val hotStarts = ranks.join(hotR, Seq("r"), "left_semi")
    // keepFirst: the minimum gpos of each class IS lexicographic-first
    // (doc, pos) because gpos = doc*C + pos with pos < C — one aggregation,
    // no window sort
    val maskedStarts =
      if (!keepFirst) hotStarts
      else hotStarts.join(
        hotStarts.groupBy(col("r")).agg(min(col("gpos")).as("gpos")),
        Seq("r", "gpos"), "left_anti")
    val covered = maskedStarts
      .select(expr(s"gpos div $c").as("__doc"), (col("gpos") % c).as("s"))
      .select(col("__doc"),
        explode(sequence(col("s"), col("s") + (minLen - 1))).as("cpos"))
      .distinct()

    val kept = chars.join(covered, Seq("__doc", "cpos"), "left_anti")
    val agg = kept.groupBy(col("__doc")).agg(
      count(lit(1)).as("__kept"),
      expr("array_join(transform(array_sort(collect_list(struct(cpos, ch))), x -> x.ch), '')")
        .as("__scrubbed"))
    lens.join(agg, Seq("__doc"), "left")
      .select(col("__doc").as(idCol),
        col("__len").cast(LongType).as("n_chars"),
        (col("__len") - coalesce(col("__kept"), lit(0L))).cast(LongType).as("n_masked"),
        coalesce(col("__scrubbed"), lit("")).as("scrubbed_text"))
  }
}
