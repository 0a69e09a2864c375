package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loader for the driver-generated parquet dirs (TESTDATA.md).
  *
  * `events.parquet` carries TIMESTAMP(NANOS) which Spark's vectorized reader
  * rejects; we read nanos as long (`spark.sql.legacy.parquet.nanosAsLong`) and
  * rebuild a microsecond TIMESTAMP_NTZ — same wall-clock values DuckDB sees. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
      df
    } else spark.read.parquet(s"$dir/$name.parquet")
}
