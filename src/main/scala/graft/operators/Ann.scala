package graft.operators

import graft.functions.{SimilarityFunctions => S}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. Queries are broadcast (small side);
  *    the corpus streams map-side — no corpus shuffle, scales to any corpus size
  *    with bounded query-set size. Per-partition top-k then global top-k via a
  *    single narrow window on (query, rank).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus bucketed once (reusable,
  *    write-out-able), probes join only their own bucket. The scale path when the
  *    query set is large.
  */
object Ann {

  private val guardAdvisoryPending = new java.util.concurrent.atomic.AtomicBoolean(true)

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d)
    * from a fixed LCG — identical across engines and runs, no Math.random.
    * Actual range is [-1, 3) (53 mantissa bits over 2⁵², ×2−1): harmless for
    * sign-bucketing, where only the hyperplane DIRECTIONS matter, and pinned
    * as-is because every DuckDB replay oracle (q29/q30/q41/q89/q90)
    * reproduces this exact arithmetic (LcgPinSpec guards it). */
  private def planeComponent(p: Int, d: Int): Double = {
    var x = p.toLong * 1000003L + d.toLong * 7919L + 12345L
    x = x * 6364136223846793005L + 1442695040888963407L
    x = x * 6364136223846793005L + 1442695040888963407L
    (x >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Sign-bit bucket of a vector under `planes` fixed hyperplanes: a long whose
    * bit p is 1 iff dot(v, plane_p) > 0. Native Catalyst expression (one array
    * scan; the element_at formulation built a dim×planes expression tree). */
  def hyperplaneBucket(v: Column, dim: Int, planes: Int): Column =
    graft.functions.expressions.HashExpressions.hyperplane_bucket(v, dim, planes)

  /** Built-in-only formulation, kept for cross-checking the expression. */
  def hyperplaneBucketHof(v: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dotP = (0 until dim).map(d => element_at(v, d + 1) * lit(planeComponent(p, d))).reduce(_ + _)
      when(dotP > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact top-k by cosine: broadcast the query frame against the corpus.
    * Output: (queryIdCol, corpus idCol, cosine, rank). Ties broken by corpus id
    * for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, queryIdCol: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol), col(vecCol).as("__qv")))
    val scored = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .join(q)
      .withColumn("cosine", S.cosine(col("__qv"), col("__cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))))
      .filter(col("rank") <= k)
      .drop("__qv", "__cv")
  }

  /** IVF centroid training: deterministic k-means (k-means|| replaced by a
    * fixed farthest-point init over a driver-side sample — the standard IVF
    * "train on a sample" step; sample size is bounded regardless of corpus
    * size, so this scales to any corpus).
    *
    * The sample is the `sampleSize` rows with the smallest `xxhash64(vec)` —
    * a deterministic uniform sample over the WHOLE corpus. (A bare `limit()`
    * would take the first partitions: on a sorted/clustered corpus the
    * centroids would see one region of the distribution and recall would
    * degrade silently.) orderBy+limit plans as TakeOrderedAndProject —
    * map-side partial top-K, no full sort shuffle; murmur3 `hash` is the
    * tiebreak so equal-hash ties stay deterministic. */
  def trainIvfCentroids(corpus: org.apache.spark.sql.DataFrame, vecCol: String,
                        nlist: Int, sampleSize: Int = 2048,
                        iters: Int = 8): Array[Array[Double]] = {
    val sample = corpus.select(col(vecCol))
      .orderBy(xxhash64(col(vecCol)), hash(col(vecCol)))
      .limit(sampleSize).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    // farthest-point init (deterministic): start from sample(0)
    val centroids = scala.collection.mutable.ArrayBuffer(sample.head.clone())
    while (centroids.length < math.min(nlist, sample.length)) {
      var bestIdx = 0; var bestDist = -1.0
      var i = 0
      while (i < sample.length) {
        var minD = Double.MaxValue
        centroids.foreach { c =>
          var d = 0.0; var j = 0
          while (j < dim) { val t = sample(i)(j) - c(j); d += t * t; j += 1 }
          if (d < minD) minD = d
        }
        if (minD > bestDist) { bestDist = minD; bestIdx = i }
        i += 1
      }
      centroids += sample(bestIdx).clone()
    }
    // Lloyd iterations on the sample
    var cs = centroids.toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cs.length)(new Array[Double](dim))
      val counts = new Array[Int](cs.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var cI = 0
        while (cI < cs.length) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - cs(cI)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = cI }
          cI += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      cs = cs.indices.map { cI =>
        if (counts(cI) == 0) cs(cI)
        else sums(cI).map(_ / counts(cI))
      }.toArray
      it += 1
    }
    cs
  }

  /** IVF ANN: corpus assigned once to its nearest centroid (a persistable
    * partition key); each query probes its `nprobe` nearest centroid lists and
    * ranks candidates by exact cosine. Recall/compute tradeoff via
    * nlist/nprobe — the classic inverted-file layout, expressed as a bucket
    * equi-join exactly like the LSH path. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, queryIdCol: String,
              centroids: Array[Array[Double]], k: Int, nprobe: Int = 4): DataFrame = {
    import graft.functions.expressions.HashExpressions.nearest_centroid
    val assigned = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .withColumn("__list", nearest_centroid(col("__cv"), centroids))
    // query probes: nprobe nearest centroids via a small literal cross product
    val qProbes = queries.select(col(queryIdCol), col(vecCol).as("__qv"))
      .withColumn("__probes", probeListsColumn(col("__qv"), centroids, nprobe))
      .withColumn("__list", explode(col("__probes"))).drop("__probes")
    qProbes.join(assigned, Seq("__list"))
      .withColumn("cosine", S.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine"), col("rank"))
  }

  /** nprobe nearest centroid ids for a query vector, as an array column:
    * scores against each centroid (literal matrix) + sort take nprobe. */
  private def probeListsColumn(v: Column, centroids: Array[Array[Double]],
                               nprobe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val dot = graft.functions.expressions.HashExpressions.dot_product(
        v, array(c.toIndexedSeq.map(x => lit(x.toFloat)): _*))
      struct(dot.as("s"), lit(i).as("i"))
    }
    val arr = array_sort(array(scored.toIndexedSeq: _*),
      (a, b) => when(a.getField("s") > b.getField("s"), -1)
        .when(a.getField("s") < b.getField("s"), 1).otherwise(0))
    transform(slice(arr, 1, nprobe), x => x.getField("i"))
  }

  /** LSH ANN: corpus and queries bucketed by [[hyperplaneBucket]]; each query
    * joins only its bucket, then exact cosine + top-k within the candidates.
    * Recall is tunable via `planes` (fewer planes → bigger buckets → higher
    * recall, more compute). Multi-probe: also probe buckets at hamming
    * distance 1 when `probe1` (flips each bit once → planes+1 probes/query).
    *
    * `maxBucketSize` is an OPT-IN skew guard (default 0 = off): a degenerate
    * corpus bucket (e.g. a flood of boilerplate embeddings sharing all sign
    * bits) would otherwise multiply EVERY query probing it by the flood
    * size. When set, membership is capped by a deterministic hash-ordered
    * sample of the bucket (row_number over xxhash64(id)). UNLIKE the
    * pair-generation chain guard (Dedup.guardedBucketPairs), a capped row
    * here appears in NO candidate at all — on a uniform corpus with only
    * 2^planes buckets the cap binds once rows ≫ 2^planes × cap and recall
    * collapses silently. Leave it off unless a flood is known; size it
    * against corpus/2^planes, and prefer more `planes` for routine bucket
    * slimming (the flood case is exactly where near-identical survivors
    * score the same cosine, which is why the sample is sound THERE). */
  /** ONE distributed k-means (Lloyd) step: assign every vector to its
    * nearest centroid (max dot — [[graft.functions.expressions.Kernels
    * .nearestCentroid]], the same scorer [[ivfTopK]] probes with) and return
    * per-cluster (n, per-dimension mean). One codegen'd scan + one
    * hash-partitioned aggregation with map-side partial sums — the shape
    * that holds at any corpus size (no driver data path; `dim` fixed agg
    * columns). Empty clusters simply emit no row — callers keep the old
    * centroid ([[kmeansFit]] does). */
  def kmeansStep(corpus: DataFrame, vecCol: String,
                 centroids: Array[Array[Double]]): DataFrame = {
    import graft.functions.expressions.HashExpressions.nearest_centroid
    val dim = centroids.head.length
    val aggs = (0 until dim).map(i =>
      avg(element_at(col("__v"), i + 1).cast("double")).as(s"m$i"))
    // null vectors would surface as a cluster=null row of null means (the
    // assignment expression is null-intolerant) and crash/corrupt kmeansFit's
    // centroid readback — a dirty corpus must not poison the fit
    corpus.select(col(vecCol).as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("cluster", nearest_centroid(col("__v"), centroids))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Distributed k-means fit over the WHOLE corpus (vs [[trainIvfCentroids]]
    * which Lloyd-iterates a bounded driver-side sample): deterministic init
    * from the hash-ordered sample's farthest-point pass, then `iters`
    * full-corpus [[kmeansStep]]s — each one scan + one aggregation, k×dim
    * doubles to the driver per iteration (centroids are broadcast-sized by
    * definition). The semantic-clustering primitive for curation recipes
    * (cluster → per-cluster dedup/sample, SemDeDup-style). */
  def kmeansFit(corpus: DataFrame, vecCol: String, k: Int, iters: Int = 5,
                sampleSize: Int = 2048): Array[Array[Double]] = {
    var cs = trainIvfCentroids(corpus, vecCol, k, sampleSize, iters = 0)
    var it = 0
    while (it < iters) {
      val rows = kmeansStep(corpus, vecCol, cs).collect()
      val next = cs.map(_.clone())
      rows.foreach { r =>
        val c = r.getAs[Int]("cluster")
        // a SHORT vector yields null for the dims past its length — keep the
        // old centroid coordinates there rather than NPE on readback
        next(c) = Array.tabulate(cs.head.length)(i =>
          if (r.isNullAt(2 + i)) cs(c)(i) else r.getDouble(2 + i))
      }
      cs = next
      it += 1
    }
    cs
  }

  /** Per-bucket membership histogram under the same bucketing [[lshTopK]]
    * uses — the cheap pre-flight check for degenerate corpora (run it once
    * on a new corpus; a bucket ≫ corpus/2^planes means a boilerplate flood
    * that will multiply every probing query). */
  def bucketStats(corpus: DataFrame, vecCol: String, dim: Int,
                  planes: Int): DataFrame =
    corpus.select(hyperplaneBucket(col(vecCol), dim, planes).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("members"))
      .orderBy(col("members").desc)

  def lshTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, queryIdCol: String,
              dim: Int, k: Int, planes: Int = 10, probe1: Boolean = true,
              maxBucketSize: Int = 0): DataFrame = {
    if (maxBucketSize <= 0 && guardAdvisoryPending.compareAndSet(true, false))
      // no data pass here (a pre-aggregation would defeat the single-join
      // plan) — make the round-4 default flip (4096 -> 0/off) visible to
      // callers instead of letting a degenerate corpus regress silently;
      // once per JVM, not per call (this is the operator's normal hot path)
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"lshTopK skew guard is OFF (maxBucketSize=0, the default since the " +
          s"guard drops rows and collapses recall); a degenerate corpus " +
          s"bucket multiplies every probing query by its size — run " +
          s"Ann.bucketStats(corpus, ..., planes=$planes) once per new corpus " +
          s"to check, and prefer more planes over the cap for bucket slimming")
    val c0 = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .withColumn("bucket", hyperplaneBucket(col("__cv"), dim, planes))
    val c =
      if (maxBucketSize <= 0) c0
      else c0.withColumn("__rn", row_number().over(
          Window.partitionBy(col("bucket"))
            .orderBy(xxhash64(col(idCol)), col(idCol))))
        .filter(col("__rn") <= maxBucketSize).drop("__rn")
    val qb = queries.select(col(queryIdCol), col(vecCol).as("__qv"))
      .withColumn("bucket0", hyperplaneBucket(col("__qv"), dim, planes))
    val probes =
      if (!probe1) array(col("bucket0"))
      else array(col("bucket0") +: (0 until planes).map(p =>
        col("bucket0").bitwiseXOR(lit(1L << p))): _*)
    val q = qb.withColumn("bucket", explode(probes)).drop("bucket0")
    q.join(c, Seq("bucket"))
      .withColumn("cosine", S.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine"), col("rank"))
  }

  // ------------------------------------------------------- product quantization

  /** Squared-L2 distance between subvector j of `v` and a literal centroid,
    * as a sequential-order dot product of the difference vector — the SAME
    * accumulation order as the oracle's `list_dot_product(diff, diff)`, so
    * both engines produce bit-identical doubles and therefore identical
    * argmins. */
  private def subL2(v: Column, j: Int, centroid: Array[Double]): Column = {
    val sub = centroid.length
    val diffs = array((0 until sub).map(i =>
      element_at(v, j * sub + i + 1).cast("double") - lit(centroid(i))): _*)
    graft.functions.expressions.HashExpressions.dot_product(diffs, diffs)
  }

  /** Product-quantization codebook training: the vector's `dim` dimensions
    * split into `m` contiguous subspaces of dim/m; each subspace gets its own
    * `k`-centroid codebook via the distributed [[kmeansFit]] over sliced
    * subvectors. Returns codebooks(j)(c) = centroid c of subspace j.
    *
    * Scale shape: training cost is m small k-means fits (each one scan + one
    * k×(dim/m) aggregation per iteration); at 100 TB you train on a bounded
    * sample anyway — pass the sampled frame in. The payoff is downstream:
    * [[pqEncode]] compresses each vector to m small ints (m bytes at k ≤
    * 256), and [[pqTopK]] scans CODES, never raw vectors. */
  def pqTrain(corpus: DataFrame, vecCol: String, dim: Int, m: Int, k: Int,
              iters: Int = 5, sampleSize: Int = 2048): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    Array.tabulate(m) { j =>
      val sliced = corpus.select(slice(col(vecCol), j * sub + 1, sub).as("__sv"))
      kmeansFit(sliced, "__sv", k, iters, sampleSize)
    }
  }

  /** PQ encode: each vector becomes an array of m centroid indices (subspace
    * j's entry = argmin-L2 centroid of codebook j, lowest index on ties). One
    * fused native kernel call per row
    * ([[graft.functions.expressions.HashExpressions.pq_encode]] — distance
    * accumulation order matches the subL2/oracle arithmetic exactly), no
    * shuffle — at 100 TB this is the one full read of the raw vectors, after
    * which search touches only the m-byte codes (32× smaller at
    * dim=64/m=8/float32). */
  def pqEncode(df: DataFrame, vecCol: String,
               codebooks: Array[Array[Array[Double]]],
               codeCol: String = "code"): DataFrame =
    df.withColumn(codeCol,
      graft.functions.expressions.HashExpressions.pq_encode(col(vecCol), codebooks))

  /** PQ ANN search via asymmetric distance computation (ADC): each query
    * precomputes its m×k table of exact subspace distances to every codebook
    * centroid ONCE (broadcast-sized: m×k doubles per query), then every
    * corpus code scores as m table lookups summed left-to-right — never a
    * raw-vector read, never a shuffle of the corpus (queries broadcast, ADC
    * is map-side, only the per-query top-k window shuffles k rows per
    * query). Output: (queryIdCol, idCol, adc, rank), rank 1 = smallest
    * approximate distance, ties by corpus id. */
  /** Per-query ADC table: the m×k subspace distances flattened (j·k + c),
    * and the corresponding per-code score — an explicit LEFT-ASSOCIATED sum
    * of the m table lookups. ONE implementation shared by [[pqTopK]] and
    * [[ivfPqTopK]]: this arithmetic (subL2 ordering, j·k+code+1 indexing,
    * sum order) is pinned bit-for-bit by the q101/q103 oracles, and two
    * drifting copies could break one oracle while the other stays green. */
  private def adcTable(qv: Column, codebooks: Array[Array[Array[Double]]]): Column =
    array((for (j <- codebooks.indices; c <- codebooks(j).indices)
      yield subL2(qv, j, codebooks(j)(c))).toIndexedSeq: _*)
  private def adcSum(qtab: Column, codeCol: String,
                     codebooks: Array[Array[Array[Double]]]): Column = {
    val kk = codebooks(0).length
    codebooks.indices.map(j =>
        element_at(qtab, lit(j * kk) + element_at(col(codeCol), j + 1) + lit(1)))
      .reduce(_ + _)
  }

  def pqTopK(codes: DataFrame, queries: DataFrame, vecCol: String,
             idCol: String, queryIdCol: String,
             codebooks: Array[Array[Array[Double]]], k: Int,
             codeCol: String = "code"): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol), col(vecCol).as("__qv"))
      .withColumn("__qtab", adcTable(col("__qv"), codebooks)).drop("__qv"))
    codes.select(col(idCol), col(codeCol))
      .join(q)
      .withColumn("adc", adcSum(col("__qtab"), codeCol, codebooks))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol)).orderBy(col("adc").asc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("adc"), col("rank"))
  }

  /** Full IVF-PQ search (the FAISS-style composition): the corpus is
    * assigned ONCE to its nearest IVF centroid (max-dot, a persistable
    * partition key) and PQ-encoded ONCE; a query probes its `nprobe`
    * nearest lists and ADC-scores ONLY those lists' codes. Search cost is
    * (corpus/nlist)×nprobe code lookups per query instead of a full-corpus
    * scan — the 100 TB read path where the inverted lists are the partition
    * layout and the codes are the compressed payload. Output:
    * (queryIdCol, idCol, adc, rank), rank 1 = smallest approximate
    * distance, ties by corpus id. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                idCol: String, queryIdCol: String,
                centroids: Array[Array[Double]],
                codebooks: Array[Array[Array[Double]]], k: Int,
                nprobe: Int = 4, codeCol: String = "code"): DataFrame =
    ivfPqSearch(ivfPqIndex(corpus, vecCol, idCol, centroids, codebooks, codeCol),
      queries, vecCol, idCol, queryIdCol, centroids, codebooks, k, nprobe, codeCol)

  // ------------------------------------------------- persisted IVF-PQ index

  /** Build the persisted IVF-PQ INDEX: ONE raw-vector scan producing
    * (idCol, list, code) — the inverted-file assignment and the PQ codes,
    * exactly what [[ivfPqSearch]] reads. Write this frame (partitioned or
    * bucketed by `list` so a probe prunes to its lists' files) plus the
    * model frame ([[ivfPqModelToDf]]) and the raw vectors never need to be
    * touched again: at 100 TB the index build is the single full read, and
    * every later batch/search is codes-only. */
  def ivfPqIndex(corpus: DataFrame, vecCol: String, idCol: String,
                 centroids: Array[Array[Double]],
                 codebooks: Array[Array[Array[Double]]],
                 codeCol: String = "code"): DataFrame = {
    import graft.functions.expressions.HashExpressions.{nearest_centroid, pq_encode}
    corpus.select(col(idCol),
      nearest_centroid(col(vecCol), centroids).as("__list"),
      pq_encode(col(vecCol), codebooks).as(codeCol))
  }

  /** ENCODE-ONLY append — the daily-batch fixpoint: the batch is assigned
    * and encoded under the EXISTING model (no retrain, no re-encode of
    * stored rows — the stored index participates as-is), mirroring
    * [[graft.operators.Dedup.minhashIndex]]/`incrementalMinhash`'s contract.
    * Id uniqueness is the caller's (route re-deliveries through the
    * incremental-dedup report first); codebook drift under a shifting
    * distribution is the operator's documented tradeoff — recall vs a
    * from-scratch retrain is pinned in AnnIndexSpec, and a periodic rebuild
    * is the remedy, not a per-batch retrain. */
  def ivfPqAppend(index: DataFrame, batch: DataFrame, vecCol: String,
                  idCol: String, centroids: Array[Array[Double]],
                  codebooks: Array[Array[Array[Double]]],
                  codeCol: String = "code"): DataFrame =
    index.unionByName(ivfPqIndex(batch, vecCol, idCol, centroids, codebooks, codeCol))

  /** Search a persisted (idCol, `__list`, codeCol) index — the exact frame
    * [[ivfPqIndex]]/[[ivfPqAppend]] emit (the list column is literally
    * named `__list`; keep it when persisting): queries probe their `nprobe`
    * nearest lists and ADC-score ONLY those lists' codes — never a raw
    * vector, never a corpus shuffle (probes and ADC tables broadcast; the
    * only exchange is the per-query top-k window on candidate rows). */
  def ivfPqSearch(index: DataFrame, queries: DataFrame, vecCol: String,
                  idCol: String, queryIdCol: String,
                  centroids: Array[Array[Double]],
                  codebooks: Array[Array[Array[Double]]], k: Int,
                  nprobe: Int = 4, codeCol: String = "code"): DataFrame = {
    // probes broadcast SLIM (qid, list) — the m×k table attaches once per
    // query AFTER the explode join, not replicated nprobe× in the broadcast
    val qProbes = broadcast(queries
      .select(col(queryIdCol), col(vecCol).as("__qv"))
      .withColumn("__list",
        explode(probeListsColumn(col("__qv"), centroids, nprobe)))
      .select(col(queryIdCol), col("__list")))
    val qTabs = broadcast(queries
      .select(col(queryIdCol), col(vecCol).as("__qv"))
      .withColumn("__qtab", adcTable(col("__qv"), codebooks)).drop("__qv"))
    qProbes.join(index.select(col(idCol), col("__list"), col(codeCol)), Seq("__list"))
      .join(qTabs, Seq(queryIdCol))
      .withColumn("adc", adcSum(col("__qtab"), codeCol, codebooks))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol)).orderBy(col("adc").asc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("adc"), col("rank"))
  }

  /** IVF-PQ model (centroids + codebooks) as a persistable frame — rows
    * (part, i, j, v): ("ivf", listId, 0, centroid) and ("pq", subspace,
    * code, centroid). nlist + m×k rows — driver-bounded by definition. */
  def ivfPqModelToDf(spark: org.apache.spark.sql.SparkSession,
                     centroids: Array[Array[Double]],
                     codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    val rows =
      centroids.zipWithIndex.map { case (c, i) => ("ivf", i, 0, c.toSeq) }.toSeq ++
        (for (j <- codebooks.indices; c <- codebooks(j).indices)
          yield ("pq", j, c, codebooks(j)(c).toSeq))
    rows.toDF("part", "i", "j", "v")
  }

  /** Read the model frame back — the collect is nlist + m×k rows. */
  def ivfPqModelFromDf(df: DataFrame): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val rows = df.select(col("part"), col("i"), col("j"), col("v")).collect()
    val ivf = rows.filter(_.getString(0) == "ivf").sortBy(_.getInt(1))
      .map(_.getSeq[Double](3).toArray)
    val pq = rows.filter(_.getString(0) == "pq")
      .groupBy(_.getInt(1)).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_.getInt(2)).map(_.getSeq[Double](3).toArray) }
      .toArray
    (ivf, pq)
  }

  /** PQ search with exact rerank — the production IVF-PQ read path: ADC
    * shortlists `shortlist` candidates per query from the compressed codes
    * ([[pqTopK]]), then ONLY those rows join back to the raw vectors for an
    * exact-cosine rerank to final top-k. The expensive exact math touches
    * shortlist×queries rows, not the corpus; the join back to raw vectors is
    * an id equi-join (shuffle bounded by the shortlist). Output matches
    * [[bruteForceTopK]]'s shape: (queryIdCol, idCol, cosine, rank). */
  def pqTopKRerank(corpus: DataFrame, codes: DataFrame, queries: DataFrame,
                   vecCol: String, idCol: String, queryIdCol: String,
                   codebooks: Array[Array[Array[Double]]], k: Int,
                   shortlist: Int = 50, codeCol: String = "code"): DataFrame = {
    val short = pqTopK(codes, queries, vecCol, idCol, queryIdCol,
      codebooks, shortlist, codeCol).select(col(queryIdCol), col(idCol))
    val q = broadcast(queries.select(col(queryIdCol), col(vecCol).as("__qv")))
    short.join(corpus.select(col(idCol), col(vecCol).as("__cv")), Seq(idCol))
      .join(q, Seq(queryIdCol))
      .withColumn("cosine", S.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol)).orderBy(col("cosine").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cosine"), col("rank"))
  }

  /** Margin-criterion pair mining from two precomputed kNN legs (Artetxe &
    * Schwenk, ACL 2019 — the LASER/CCMatrix bitext-mining score):
    *
    *   margin(x, y) = cos(x, y) / (avgK(x)/2 + avgK(y)/2)
    *
    * where avgK(x) is the mean cosine of x's k nearest neighbors in Y and
    * avgK(y) the symmetric term — the RATIO margin that normalizes away
    * hub vectors whose raw cosine is high against everything. A pair is
    * emitted when y is x's top-1 neighbor (the paper's "max" retrieval
    * strategy) and its rounded margin clears `threshold` (≈1.05-1.06 in
    * CCMatrix practice).
    *
    * Leg-agnostic by design (the [[graft.operators.Retrieval.rrfFuse]]
    * posture): `xy` is X→Y top-k — (queryIdCol = x id, idCol = y id,
    * cosine, rank) — and `yx` the symmetric Y→X leg; feed [[bruteForceTopK]]
    * legs at small scale or [[ivfPqSearch]]+rerank legs at 100 TB, the
    * margin arithmetic never touches a raw vector. Everything downstream of
    * the legs is per-query averages (corpus × k rows, 8-byte keys) and two
    * id equi-joins. */
  def marginFromKnn(xy: DataFrame, yx: DataFrame, queryIdCol: String,
                    idCol: String, threshold: Double = 1.05,
                    requireCoverage: Boolean = true): DataFrame = {
    val ax = xy.groupBy(col(queryIdCol).as("x_id")).agg(avg(col("cosine")).as("__ax"))
    val ay = yx.groupBy(col(queryIdCol).as("y_id")).agg(avg(col("cosine")).as("__ay"))
    // LEFT joins: a top-1 neighbor absent from the opposite leg (possible
    // when the legs come from different indexes, filters, or truncated
    // IVF-PQ probes — never from marginMine's symmetric brute legs) is a
    // LEG INCONSISTENCY, not a non-pair. Default = fail loudly the moment
    // one surfaces; requireCoverage=false instead emits the pair with a
    // NULL margin so the caller can audit the mismatch.
    val joined = xy.filter(col("rank") === 1)
      .select(col(queryIdCol).as("x_id"), col(idCol).as("y_id"), col("cosine"))
      .join(ax, Seq("x_id"), "left")
      .join(ay, Seq("y_id"), "left")
    val covered =
      if (!requireCoverage) joined
      else joined.withColumn("__ay",
        when(col("__ay").isNotNull, col("__ay")).otherwise(raise_error(concat(
          lit("marginFromKnn: top-1 neighbor absent from the Y->X leg (y_id="),
          col("y_id").cast("string"),
          lit(") — the two kNN legs do not cover the same corpus; pass " +
            "requireCoverage=false to null-propagate instead")))))
      .withColumn("__ax",
        when(col("__ax").isNotNull, col("__ax")).otherwise(raise_error(concat(
          lit("marginFromKnn: query absent from the X->Y averages (x_id="),
          col("x_id").cast("string"), lit(")")))))
    covered
      .withColumn("margin", col("cosine") / (col("__ax") / 2 + col("__ay") / 2))
      .filter(col("margin").isNull || round(col("margin"), 6) >= threshold)
      .select(col("x_id"), col("y_id"), col("cosine"), col("margin"))
  }

  /** Deterministic Johnson-Lindenstrauss Rademacher matrix: R[i][j] =
    * ±1/√outDim with the sign from md5(seed|i|j)'s first byte — the
    * matrix is a pure function of (seed, dims), so every engine (and the
    * oracle) rebuilds it identically; no RNG state to ship. */
  def jlMatrix(dim: Int, outDim: Int, seed: String): Array[Array[Double]] = {
    val norm = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim, dim) { (i, j) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed|$i|$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((h(0) & 1) == 0) norm else -norm
    }
  }

  /** Johnson-Lindenstrauss projection: embeddings shrink dim → outDim via
    * one fused matVec kernel scan (no shuffle, no UDF) under the
    * deterministic [[jlMatrix]]. Pairwise distances are preserved within
    * (1±ε) w.h.p. for outDim = O(ln n / ε²) — the shrink-before-LSH/ANN
    * move that cuts a 100 TB embedding read by dim/outDim before any
    * bucketing. ApproxRecallSpec-style guarantees live in Round11OpsSpec
    * (top-k recall vs the exact space). */
  def jlProject(df: DataFrame, vecCol: String, outDim: Int, seed: String,
                dim: Int, outCol: String = "proj"): DataFrame =
    df.withColumn(outCol, graft.functions.expressions.HashExpressions
      .mat_vec(col(vecCol), jlMatrix(dim, outDim, seed)))

  /** [[marginFromKnn]] over brute-force legs — the exact-regime entry point
    * (and the oracle surface): mine aligned pairs between two embedding
    * sides X and Y. Broadcast posture inherited from [[bruteForceTopK]]
    * (each side broadcasts as the query side of one leg); swap in IVF-PQ
    * legs when both sides outgrow a broadcast. */
  def marginMine(x: DataFrame, y: DataFrame, vecCol: String, idCol: String,
                 k: Int = 4, threshold: Double = 1.05): DataFrame = {
    val qx = x.select(col(idCol).as("__qid"), col(vecCol))
    val qy = y.select(col(idCol).as("__qid"), col(vecCol))
    val xy = bruteForceTopK(y, qx, vecCol, idCol, "__qid", k)
    val yx = bruteForceTopK(x, qy, vecCol, idCol, "__qid", k)
    marginFromKnn(xy, yx, "__qid", idCol, threshold)
  }
}
