package graft

import org.apache.spark.sql.SparkSession

/** Throwaway single-query dev harness (not part of the driver contract):
  * runMain graft.QDev <queryName> <sfDir> <outDir> — dumps one query's result
  * for a local DuckDB diff.
  */
object QDev {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(s"[qdev] wrote $outDir/$name")
    spark.stop()
  }
}
