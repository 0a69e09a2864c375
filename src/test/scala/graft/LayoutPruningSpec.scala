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
