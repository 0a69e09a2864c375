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
      // restore the caller's prior conf value (hardcoding "false" would
      // clobber a session that legitimately runs with nanosAsLong=true);
      // note this flip is still not safe under concurrent plan construction
      val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      try spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
      finally prior match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
