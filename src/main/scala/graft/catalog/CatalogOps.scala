package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog-level physical-layout helpers.
  *
  * Bucketing is the batch answer to repeated co-located joins at 100 TB:
  * writing both fact tables bucketed (same column, same bucket count) lets
  * every subsequent equi-join on that column run with NO shuffle on either
  * side — the join becomes a per-bucket zip. Worth it whenever a join key is
  * hit repeatedly (here: orderkey between orders and lineitem). */
object CatalogOps {

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val parts = table.split("\\.")
    if (parts.length == 2)
      df.sparkSession.sql(s"CREATE DATABASE IF NOT EXISTS ${parts(0)}")
    var w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }
}
