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

  test("incrementalMinhash: stored index reused, statuses and index update correct") {
    import Dedup.{incrementalMinhash, minhashIndex}
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val index0 = minhashIndex(corpus, "text", "doc_id").localCheckpoint(true)
    val batch = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of stored 1
      (101L, "red orange yellow green blue indigo violet pink"), // new, duplicated below
      (102L, "red orange yellow green blue indigo violet pink"),
      (103L, "completely fresh words nobody else uses today")).toDF("doc_id", "text")
    val (report, index1) = incrementalMinhash(index0, batch, "text", "doc_id",
      threshold = 0.9)
    val got = report.collect().map(r => r.getLong(0) ->
      ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got(100L) == (("dup_of_stored", Some(1L))))
    assert(got(101L) == (("kept", None)))
    assert(got(102L) == (("dup_in_batch", Some(101L))))
    assert(got(103L) == (("kept", None)))
    // index grew by exactly the kept docs
    assert(index1.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 101L, 103L))
    // fixpoint: the same batch against the updated index is all dups
    val (second, _) = incrementalMinhash(index1.localCheckpoint(true), batch,
      "text", "doc_id", threshold = 0.9)
    assert(second.collect().forall(_.getString(1) == "dup_of_stored"))
  }

  test("incrementalMinhash matches from-scratch minhashDedup survivors (exact regime)") {
    import Dedup.{incrementalMinhash, minhashIndex, minhashDedup}
    // exact copies only (threshold 0.999): LSH recall is provably 1, so
    // incremental survivors over (old ∪ new) must equal the from-scratch
    // dedup of the union — the no-drift contract for the daily pipeline
    val old = sf("documents").limit(60).select(col("doc_id"), col("text"))
    val oldDeduped = minhashDedup(old, "text", "doc_id", threshold = 0.999)
    val idx = minhashIndex(oldDeduped, "text", "doc_id").localCheckpoint(true)
    val batch = sf("documents").limit(100)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val (report, _) = incrementalMinhash(idx, batch, "text", "doc_id",
      threshold = 0.999)
    val incSurvivors = oldDeduped.select(col("doc_id")).collect().map(_.getLong(0)).toSet ++
      report.filter(col("status") === "kept").collect().map(_.getLong(0)).toSet
    val scratch = minhashDedup(oldDeduped.unionByName(batch), "text", "doc_id",
      threshold = 0.999).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(incSurvivors == scratch)
  }

  test("incrementalMinhash lossy regime: dup detection is a recall-bounded subset of exact") {
    import graft.functions.{SimilarityFunctions => S}
    // t=0.5 with 16x4 banding: the LSH path may MISS near-dups (lossy) but
    // must never invent them — every doc the LSH path drops, the exact
    // prefix-filter path drops too, and recall stays above the band bound
    val docs = sf("documents").select(col("doc_id"), col("lang"), col("source"), col("text"))
    val stored = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select((col("doc_id") + 50000).as("doc_id"), col("lang"), col("source"), col("text"))
    val idx = Dedup.minhashIndex(stored, "text", "doc_id", shingleN = 1)
    val (lshReport, _) = Dedup.incrementalMinhash(idx, batch, "text", "doc_id",
      shingleN = 1, threshold = 0.5)
    val toksOf = (df: DataFrame) => df.select(col("doc_id"),
      array_distinct(S.tokens(col("text"))).as("toks"))
    val exactReport = Dedup.incrementalDedup(toksOf(stored), toksOf(batch),
      "toks", "doc_id", Seq.empty, 0.5)
    val lshDropped = lshReport.filter(col("status") =!= "kept")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val exactDropped = exactReport.filter(col("status") =!= "kept")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(lshDropped.subsetOf(exactDropped),
      "LSH path dropped a doc the exact path kept (false positive)")
    assert(exactDropped.nonEmpty)
    val recall = lshDropped.size.toDouble / exactDropped.size
    assert(recall >= 0.6, s"recall $recall below the banding bound at t=0.5")
  }

  test("incrementalMinhash batch-scoped candidates: report equals the union-self-join formulation") {
    import graft.functions.{SimilarityFunctions => S}
    import graft.operators.ConnectedComponents
    import org.apache.spark.sql.expressions.Window
    // The implementation bands only the batch and semi-joins the stored
    // bucket rows down to batch-touched buckets; this reference reimplements
    // the original formulation — band the UNION, all-pairs within small
    // buckets, id-ordered chain in hot ones, then keep batch-touching pairs
    // — and the two reports must be identical, hot buckets included.
    def unionFormulationReport(storedIdx: DataFrame, batch: DataFrame,
                               threshold: Double, maxBucketSize: Int): DataFrame = {
      val (bands, rows) = (16, 4)
      val batchIdx = Dedup.minhashIndex(batch, "text", "doc_id", 3, bands, rows)
      val all = storedIdx.select(col("doc_id").as("id"), col("sh"), col("sig"))
        .unionByName(batchIdx.select(col("doc_id").as("id"), col("sh"), col("sig")))
      val buckets = all
        .select(col("id"), explode(S.lshBandKeys(col("sig"), bands, rows)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
      val W = Window.partitionBy(col("band"), col("bucket"))
      val sized = buckets.withColumn("bsz", count(lit(1)).over(W))
      val small = sized.filter(col("bsz") <= maxBucketSize)
      val smallPairs = small.select(col("band"), col("bucket"), col("id").as("id_a"))
        .join(small.select(col("band"), col("bucket"), col("id").as("id_b")),
          Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b")).select(col("id_a"), col("id_b"))
      val hotPairs = sized.filter(col("bsz") > maxBucketSize)
        .select(col("id").as("id_a"),
          lead(col("id"), 1).over(W.orderBy(col("id"))).as("id_b"))
        .filter(col("id_b").isNotNull).select(col("id_a"), col("id_b"))
      val bIds = batchIdx.select(col("doc_id").as("id"))
      val cand = smallPairs.unionByName(hotPairs).distinct()
        .join(bIds.select(col("id").as("id_a"), lit(1).as("la")), Seq("id_a"), "left")
        .join(bIds.select(col("id").as("id_b"), lit(1).as("lb")), Seq("id_b"), "left")
        .filter(col("la").isNotNull || col("lb").isNotNull)
        .select(col("id_a"), col("id_b"))
      val shOf = all.select(col("id"), col("sh"))
      val verified = cand
        .join(shOf.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(shOf.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .filter(S.jaccard(col("sh_a"), col("sh_b")) >= threshold)
        .select(col("id_a"), col("id_b"))
      val comps = ConnectedComponents.run(verified, "id_a", "id_b")
      val storedMin = comps
        .join(storedIdx.select(col("doc_id").as("vertex")), Seq("vertex"), "left_semi")
        .groupBy(col("component")).agg(min(col("vertex")).as("smin"))
      val already = batch.select(col("doc_id"))
        .join(storedIdx.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .withColumn("already", lit(1))
      batch.select(col("doc_id"))
        .join(already, Seq("doc_id"), "left")
        .join(comps.select(col("vertex").as("doc_id"), col("component")), Seq("doc_id"), "left")
        .join(storedMin, Seq("component"), "left")
        .select(col("doc_id"),
          when(col("already").isNotNull || col("smin").isNotNull, lit("dup_of_stored"))
            .when(col("component").isNotNull && col("component") =!= col("doc_id"),
              lit("dup_in_batch"))
            .otherwise(lit("kept")).as("status"),
          when(col("already").isNotNull, col("doc_id"))
            .when(col("smin").isNotNull, col("smin"))
            .when(col("component").isNotNull && col("component") =!= col("doc_id"),
              col("component"))
            .otherwise(lit(null).cast("long")).as("attributed_to"))
    }
    // fixture: an identical-text flood (6 stored + 6 batch docs) drives every
    // one of its band buckets over maxBucketSize=5 (hot chain), plus a
    // stored/batch near-pair, a batch-only dup pair, a re-delivered stored
    // id, and unique docs (small buckets)
    val flood = "storm storm again and again the same words exactly here"
    val storedDocs = (Seq(10L -> "alpha beta gamma delta epsilon zeta eta",
      20L -> "one two three four five six seven eight") ++
      (1L to 6L).map(i => i -> flood)).toDF("doc_id", "text")
    val batchDocs = (Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta", // re-delivered stored id
      100L -> "alpha beta gamma delta epsilon zeta eta", // copy of stored 10
      101L -> "red orange yellow green blue indigo violet",
      102L -> "red orange yellow green blue indigo violet",
      103L -> "completely fresh words nobody else uses today") ++
      (201L to 206L).map(i => i -> flood)).toDF("doc_id", "text")
    val idx = Dedup.minhashIndex(storedDocs, "text", "doc_id").localCheckpoint(true)
    val (got, _) = Dedup.incrementalMinhash(idx, batchDocs, "text", "doc_id",
      threshold = 0.9, maxBucketSize = 5)
    val want = unionFormulationReport(idx, batchDocs, 0.9, 5)
    val asSet = (df: DataFrame) => df.collect().map(r => (r.getLong(0),
      r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val (g, w) = (asSet(got), asSet(want))
    assert(g == w, s"reports diverge:\n got=$g\nwant=$w")
    // and the fixture really exercised the shapes it claims to
    val statuses = g.map(t => t._1 -> t._2).toMap
    assert(statuses(10L) == "dup_of_stored" && statuses(100L) == "dup_of_stored")
    assert((201L to 206L).forall(statuses(_) == "dup_of_stored"),
      "flood batch docs must connect to stored flood docs through the hot chain")
    assert(statuses(103L) == "kept")
  }

  test("minhash index round-trips through parquet: incremental run from the re-read index is identical") {
    import Dedup.{incrementalMinhash, minhashIndex}
    val docs = sf("documents").select(col("doc_id"), col("text"))
    val stored = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select((col("doc_id") + 70000).as("doc_id"), col("text"))
    val idx = minhashIndex(stored, "text", "doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_idx").toString
    idx.write.mode("overwrite").parquet(dir) // the PERSISTED index the daily path reads
    val reread = spark.read.parquet(dir)
    val asSet = (df: DataFrame) => df.collect().map(r => (r.getLong(0),
      r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val (rMem, _) = incrementalMinhash(idx, batch, "text", "doc_id", threshold = 0.9)
    val (rDisk, _) = incrementalMinhash(reread, batch, "text", "doc_id", threshold = 0.9)
    assert(asSet(rDisk) == asSet(rMem) && asSet(rDisk).nonEmpty)
  }

  test("incremental CC: chained daily batches equal from-scratch CC; merges handled") {
    import graft.operators.ConnectedComponents
    // deterministic graph with a planted MERGE case: components {1,2,3} and
    // {10,11} exist in the stored labeling; the batch bridges them (3-10)
    // and adds a brand-new component {100,101}
    val stored0 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("src", "dst")
    val batch1 = Seq((3L, 10L), (100L, 101L)).toDF("src", "dst")
    val labels0 = ConnectedComponents.run(stored0)
    val inc = ConnectedComponents.incremental(labels0, batch1)
    val scratch = ConnectedComponents.run(stored0.unionByName(batch1))
    val asMap = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asMap(inc) == asMap(scratch))
    assert(asMap(inc)(11L) == 1L, "bridged components must take the global min")
    assert(asMap(inc)(20L) == 20L && asMap(inc)(21L) == 20L,
      "untouched component keeps its label")
    // chain a second day on the FIRST day's output (the fixpoint shape),
    // on the distributed path too (localEdgeThreshold = 0)
    val batch2 = Seq((21L, 101L)).toDF("src", "dst")
    val inc2 = ConnectedComponents.incremental(inc, batch2,
      localEdgeThreshold = 0)
    val scratch2 = ConnectedComponents.run(
      stored0.unionByName(batch1).unionByName(batch2))
    assert(asMap(inc2) == asMap(scratch2))
    assert(asMap(inc2)(101L) == 20L)
  }

  test("incrementalWinnow: equals from-scratch winnowMatches on the cross pairs; index appends; misses nothing planted") {
    val docs = sf("documents").select(col("doc_id"), col("text"))
    val stored = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select((col("doc_id") + 70000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(3)) === 1).limit(20)
        .select((col("doc_id") + 90000L).as("doc_id"), col("text"))) // replicas
      .localCheckpoint(true)
    val idx = Dedup.winnowIndex(stored, "text", "doc_id").localCheckpoint(true)
    val (matches, updated) = Dedup.incrementalWinnow(idx, batch, "text", "doc_id")
    val inc = matches.select("batch_id", "stored_id", "shared")
      .as[(Long, Long, Long)].collect().toSet
    // every planted replica overlaps its stored original (winnowing is exact)
    val planted = docs.filter(pmod(col("doc_id"), lit(3)) === 1).limit(20)
      .filter(length(col("text")) >= 15 + 20) // long enough for >= 2 fingerprints
      .select("doc_id").as[Long].collect()
    planted.foreach { id =>
      assert(inc.exists(m => m._1 == id + 90000L && m._2 == id),
        s"replica of $id must match its original")
    }
    // equality with the from-scratch formulation restricted to cross pairs:
    // for batch-touched fps, full-corpus bucket counts equal touched∪batch
    // counts, so the guard and shared counts agree exactly
    val scratch = Dedup.winnowMatches(stored.unionByName(batch), "text", "doc_id")
      .filter(col("id_b") >= 70000L && col("id_a") < 70000L)
      .select(col("id_b").as("batch_id"), col("id_a").as("stored_id"), col("shared"))
      .as[(Long, Long, Long)].collect().toSet
    assert(inc == scratch, s"only-inc=${(inc -- scratch).take(3)} only-scratch=${(scratch -- inc).take(3)}")
    // the updated index is exactly stored ∪ batch fingerprints
    val expect = Dedup.winnowIndex(stored.unionByName(batch), "text", "doc_id")
    assert(updated.count() == expect.count() &&
      updated.exceptAll(expect).isEmpty && expect.exceptAll(updated).isEmpty)
  }

  test("two-day composition: day-2 copies of day-1 survivors dedup against them") {
    val docs = sf("documents").select(col("doc_id"), col("lang"),
      col("source"), array_distinct(
        split(lower(trim(col("text"))), "\\s+")).as("toks"))
    val stored0 = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val day1 = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
      .withColumn("doc_id", col("doc_id") + 20000)
    val day2 = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
      .withColumn("doc_id", col("doc_id") + 40000)
    def report(stored: DataFrame, batch: DataFrame) =
      Dedup.incrementalDedup(stored, batch, "toks", "doc_id",
          Seq("lang", "source"), 0.7)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    val r1 = report(stored0, day1)
    val kept1 = r1.collect { case (id, ("kept", _)) => id }.toSet
    val stored1 = stored0.unionByName(
      day1.filter(col("doc_id").isin(kept1.toSeq: _*)))
    val r2 = report(stored1, day2)
    // every day-2 copy of a day-1 SURVIVOR must come back dup_of_stored,
    // attributed to exactly that survivor (it matched nothing in stored0 on
    // day 1, so the +20000 twin is its only — and minimal — match)
    assert(kept1.nonEmpty)
    kept1.foreach { id =>
      assert(r2(id + 20000) == (("dup_of_stored", Some(id))),
        s"day-2 twin of survivor $id: ${r2(id + 20000)}")
    }
    // and nothing in day 2 is 'kept' with a twin that survived day 1
    val kept2 = r2.collect { case (id, ("kept", _)) => id }.toSet
    assert(kept2.forall(id => !kept1.contains(id - 20000)))
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
