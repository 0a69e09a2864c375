package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scratch locations for multi-step table rewrites. Placed UNDER the
  * warehouse dir so they live on the same (possibly distributed) filesystem
  * as the tables being rewritten — a driver-local java.io.tmpdir would be
  * invisible to executors on a real cluster. */
object Scratch {

  def newDir(spark: SparkSession, tag: String): String = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    s"$wh/_graft_scratch/${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
  }

  def delete(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** Run `write` into a fresh scratch dir, hand the re-read path to `use`,
    * then delete the scratch. */
  def withScratch[T](spark: SparkSession, tag: String)(body: String => T): T = {
    val dir = newDir(spark, tag)
    try body(dir) finally delete(spark, dir)
  }
}
