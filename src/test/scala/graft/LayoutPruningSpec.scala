package graft

import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The layout operators' REASON TO EXIST, measured: after a multi-dim
  * clustered write, a 2-D rectangle predicate overlaps far fewer files'
  * min/max footer boxes than after a random layout — the pruning parquet
  * readers (and Spark's row-group filtering) get from the stats. */
class LayoutPruningSpec extends SparkSpec {
  import spark.implicits._

  private def pts: DataFrame = spark.range(0, 40000).select(
    pmod(col("id") * 7919, lit(256L)).as("x"),
    pmod(col("id") * 104729, lit(256L)).as("y"))

  /** files whose [min,max] box on BOTH dims overlaps the query rectangle */
  private def filesTouched(dir: String, lo: Long, hi: Long): (Long, Long) = {
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
    val touched = stats.filter(
      col("x1") >= lo && col("x0") <= hi && col("y1") >= lo && col("y0") <= hi)
    (touched.count(), stats.count())
  }

  test("fragmented-then-compacted table regains its pruning (compaction closes the loop)") {
    // the full maintenance cycle: Z-ordered write → ~50 tiny CDC-ish appends
    // (each spanning the key space, so every new file's min/max box overlaps
    // every query rectangle) degrade pruning → compactTable with the curve
    // restores the ≤25%-files-touched bound, content untouched.
    val t = "layout_compact_t1"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Layout.zorderBy(pts, Seq(col("x"), col("y")), 8, 32).drop("zval")
      .write.saveAsTable(t)
    val (root, _) = graft.catalog.Compaction.listManifests(spark, t)
    val dir = root.toString
    val checksum = () => spark.table(t)
      .agg(count(lit(1)), sum(col("x") * 521 + col("y"))).collect().toSeq
    val (t0, n0) = filesTouched(dir, 100, 131)
    assert(t0 <= n0 / 4, s"fresh z-order layout must prune ($t0/$n0)")
    (0 until 50).foreach { i =>
      pts.filter(pmod(xxhash64(col("x") * 256 + col("y"), lit(i)), lit(50)) === 0)
        .coalesce(1).write.mode("append").saveAsTable(t)
    }
    spark.catalog.refreshTable(t)
    val before = checksum() // content INCLUDING the appends — what compaction must preserve
    val (tF, nF) = filesTouched(dir, 100, 131)
    assert(nF >= n0 + 50 && tF > nF / 4,
      s"appends must degrade pruning ($tF/$nF touched)")
    val curve = Layout.mortonCode(Seq(col("x"), col("y")), 8)
    val (_, manifests) = graft.catalog.Compaction.listManifests(spark, t)
    val target = math.max(1L, manifests.map(_.bytes).sum / 32)
    graft.catalog.Compaction.compactTable(spark, t, targetBytes = target,
      curve = Some(curve))
    val (t2, n2) = filesTouched(dir, 100, 131)
    assert(t2 <= n2 / 4, s"compaction must restore pruning ($t2/$n2 touched)")
    assert(checksum() == before, "compaction must not change content")
  }

  test("KLL-priced range bounds: partition masses within sketch rank error, not worse than sampling") {
    // lumpy duplicate-bearing value distribution; the mass split depends
    // only on rank estimation, where the one-pass KLL (k=4096, ~0.4 % rank
    // error) beats the range exchange's ~100-rows-per-partition reservoir
    val df = spark.range(0, 400000).select(
      (col("id") * col("id") % 7919L * (col("id") % 13L + 1L)).as("v"))
    val n = 16
    def maxDev(d: DataFrame, parts: Int): Double = {
      val m = d.withColumn("p", spark_partition_id()).groupBy("p").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
      val ideal = m.values.sum / parts
      (0 until parts).map(i => math.abs(m.getOrElse(i, 0.0) - ideal) / ideal).max
    }
    val klled = Layout.repartitionByKllRange(df, col("v"), n)
    assert(klled.rdd.getNumPartitions == n, "distinct bounds must yield n buckets here")
    val kllDev = maxDev(klled, n)
    val sampDev = maxDev(df.repartitionByRange(n, col("v")), n)
    assert(kllDev <= 0.05, s"KLL bounds spread too wide: $kllDev")
    assert(kllDev <= sampDev * 1.2 + 0.01,
      s"KLL bounds ($kllDev) must not be worse than sampled bounds ($sampDev)")
  }

  test("KLL range edge cases: empty/all-null input degrades to one partition; wide bound lists match the chain") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("v", LongType))))
    assert(Layout.repartitionByKllRange(empty, col("v"), 8).rdd.getNumPartitions == 1)
    val allNull = spark.range(100).select(lit(null).cast("long").as("v"))
    assert(Layout.repartitionByKllRange(allNull, col("v"), 8).count() == 100)
    // >64 bounds takes the HOF path — bucket ids must equal the chain's
    val bounds = (1 until 100).map(_.toDouble * 10).toArray
    val df = spark.range(0, 1000).select(col("id").cast("long").as("v"))
    val viaHof = df.select(col("v"), Layout.rangeBucket(col("v"), bounds).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    df.collect().map(_.getLong(0)).foreach { v =>
      val expect = bounds.count(v > _)
      assert(viaHof(v) == expect, s"v=$v")
    }
  }

  test("z-order and hilbert layouts prune most files for a 2-D box; random layout touches all") {
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    // 32 files each
    pts.repartition(32, pmod(col("x") * 31 + col("y"), lit(32L)))
      .write.mode("overwrite").parquet(s"$base/random")
    Layout.zorderBy(pts, Seq(col("x"), col("y")), 8, 32)
      .write.mode("overwrite").parquet(s"$base/zorder")
    Layout.hilbertBy(pts, col("x"), col("y"), 8, 32)
      .write.mode("overwrite").parquet(s"$base/hilbert")
    // a 32x32 box = 1.5% of the key space
    val (rT, rN) = filesTouched(s"$base/random", 100, 131)
    val (zT, zN) = filesTouched(s"$base/zorder", 100, 131)
    val (hT, hN) = filesTouched(s"$base/hilbert", 100, 131)
    assert(rT == rN, s"random layout must touch every file ($rT/$rN)")
    assert(zT <= zN / 4, s"zorder should prune >75% of files ($zT/$zN)")
    assert(hT <= hN / 4, s"hilbert should prune >75% of files ($hT/$hN)")
  }
}
