package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary instrumentation for the 100x stats-pruned delete-discovery
  * inversion (round-14 weak): fine-grained timers over the exact
  * ScaleCheck100 block-19 fixture. Not part of the library surface. */
object DebugDelete {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[dbg] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    import graft.catalog.{FileStats, Retention}
    val rows = 200000L * n
    val parts = 32 * n
    spark.sql("CREATE DATABASE IF NOT EXISTS dbgdel")
    def build(name: String): String = {
      val t = s"dbgdel.$name"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.range(rows).select(col("id").as("event_id"),
          col("id").as("user_id"),
          pmod(col("id"), lit(parts.toLong)).cast("int").as("bucket"))
        .repartition(parts, col("bucket"))
        .write.partitionBy("bucket").saveAsTable(t)
      t
    }
    val keys = spark.range(10).select((col("id") * 1777L + 13L).as("user_id"))
      .localCheckpoint(true)

    val tFull = timed("build full")(build("full"))
    timed("FULL-SCAN deleteRows total")(
      Retention.deleteRows(spark, tFull, "user_id", keys))

    val tIdx = timed("build idx")(build("idx"))
    val st = "dbgdel.idx_stats"
    spark.sql(s"DROP TABLE IF EXISTS $st")
    timed("refresh FULL build")(FileStats.refresh(spark, tIdx, st,
      FileStats.StatsSpec(Seq("user_id"), bloomCols = Seq("user_id"),
        bloomBits = 1 << 17)))
    timed("refresh steady-state (nothing changed)")(
      FileStats.refresh(spark, tIdx, st, FileStats.StatsSpec(
        Seq("user_id"), bloomCols = Seq("user_id"), bloomBits = 1 << 17)))
    timed("listDataFiles")(FileStats.listDataFiles(spark, tIdx))
    timed("statsSpecOf (uncached)")(FileStats.statsSpecOf(spark, st))
    val kvals = keys.collect().map(_.getLong(0)).toSeq
    // ---- pruneFiles internals replicated ----
    timed("st count (narrow)")(spark.table(st).count())
    timed("st full blob read: max octet_length(bloom)")(
      spark.table(st).agg(max(octet_length(col("bloom")))).collect())
    timed("st bloom_k distinct (narrow)")(
      spark.table(st).filter(col("bloom_k").isNotNull)
        .select(col("bloom_k")).distinct().collect())
    val (_, files) = FileStats.listDataFiles(spark, tIdx)
    import scala.jdk.CollectionConverters._
    val curDf = timed("curDf checkpoint")(spark.createDataFrame(
      files.map(f => org.apache.spark.sql.Row(f.rel, f.name, f.bytes)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rel", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("file", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("bytes", org.apache.spark.sql.types.LongType))))
      .localCheckpoint(true))
    val statsJ = spark.table(st).join(curDf, Seq("rel", "file", "bytes"))
    timed("stats join curDf + bloom probe filter + collect")({
      import graft.functions.expressions.HashExpressions
      val admit = !(col("col_name") === "user_id") ||
        (col("max_long").isNotNull &&
          col("max_long") >= lit(kvals.min) && col("min_long") <= lit(kvals.max) &&
          coalesce(HashExpressions.bloom_contains_any(col("bloom"),
            kvals.map(_.toString), 5), lit(true)))
      statsJ.filter(!admit).select("rel", "file").distinct().collect().length
    })
    timed("unknown count job")(
      curDf.join(statsJ.select("rel", "file").distinct(),
        Seq("rel", "file"), "left_anti").count())
    timed("pruneFiles keys")(FileStats.pruneFiles(spark, tIdx, st,
      Seq(FileStats.KeysPredicate("user_id", kvals))))
    timed("pruneFiles keys AGAIN (warm)")(FileStats.pruneFiles(spark, tIdx, st,
      Seq(FileStats.KeysPredicate("user_id", kvals))))
    val probe = timed("keysPrunedScan assemble")(FileStats.keysPrunedScan(
      spark, tIdx, st, "user_id", keys, 100000).get)
    timed("probe groupBy affected (the discovery read)")(
      probe.groupBy(col("bucket")).agg(count(lit(1))).collect())
    timed("SHOW PARTITIONS")(spark.sql(s"SHOW PARTITIONS $tIdx").count())
    timed("STATS-PRUNED deleteRows total")(
      Retention.deleteRows(spark, tIdx, "user_id", keys, statsTable = Some(st)))
    timed("post-delete refresh (what deleteRows just paid inside)")(
      FileStats.refresh(spark, tIdx, st, FileStats.StatsSpec(
        Seq("user_id"), bloomCols = Seq("user_id"), bloomBits = 1 << 17)))
    spark.stop()
  }
}
