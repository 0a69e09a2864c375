package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loader for the driver-generated parquet dirs (TESTDATA.md).
  *
  * `events.parquet` has carried TIMESTAMP(NANOS) — which Spark's vectorized
  * reader rejects — in some driver generations and TIMESTAMP(MICROS) in
  * others; we read nanos as long (`spark.sql.legacy.parquet.nanosAsLong`) and
  * rebuild a microsecond TIMESTAMP_NTZ, or just cast when already micros —
  * same wall-clock values DuckDB sees either way.
  *
  * Spark 4.1 has no per-read option for nanosAsLong (session conf only), so
  * the flip is made safe instead of per-read: it runs under a global lock and
  * only ONCE per (session, dir) — the resolved plan is memoized and reused.
  * The conf affects only schema inference of TIMESTAMP(NANOS) columns, so a
  * concurrent read of any OTHER table (none carry nanos) is unaffected by a
  * transient `true`; concurrent events reads are serialized by the memoizer.
  */
object Tables {
  // weak session keys: stopped sessions (and their memoized plans) become
  // collectable instead of pinned forever, and identity-keyed lookup cannot
  // hand a dead session's plan to a new one. The VALUES are WeakReferences
  // too — a DataFrame strongly references its session, so a strong value
  // would resurrect the key via the value→key path the WeakHashMap javadoc
  // warns about (losing a memoized plan to GC merely re-runs the read under
  // the lock). All access under one lock — it also serializes the conf flip.
  private val eventsCache = new java.util.WeakHashMap[
    SparkSession, java.util.HashMap[String, java.lang.ref.WeakReference[DataFrame]]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") this.synchronized {
      val perSession = {
        val m = eventsCache.get(spark)
        if (m != null) m
        else {
          val m2 = new java.util.HashMap[String, java.lang.ref.WeakReference[DataFrame]]()
          eventsCache.put(spark, m2); m2
        }
      }
      val cached = Option(perSession.get(dir)).flatMap(r => Option(r.get())).orNull
      if (cached != null) cached
      else {
        // restore the caller's prior conf value (hardcoding "false" would
        // clobber a session that legitimately runs with nanosAsLong=true)
        val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df =
          try {
            val raw = spark.read.parquet(s"$dir/events.parquet")
            // driver generations differ: ts arrives as TIMESTAMP(NANOS)
            // (surfaced as long under nanosAsLong) or already TIMESTAMP(MICROS)
            val tsIsLong = raw.schema("ts").dataType ==
              org.apache.spark.sql.types.LongType
            if (tsIsLong)
              raw.withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
            else raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
          } finally prior match {
            case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
            case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
          }
        perSession.put(dir, new java.lang.ref.WeakReference(df))
        df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
