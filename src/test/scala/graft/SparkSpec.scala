package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (mirrors the reference's single
  * session per test run, glue_job_mocking_helper.py:111-119). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // a doGenCode bug must FAIL tests, not silently fall back to
      // interpreted eval (which would hide both the bug and the perf loss)
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  def sf(name: String) = spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
}
