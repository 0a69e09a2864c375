package graft

import graft.queries.{PipelineQueries, RefQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 (reference-faithful ETL
  * operators) plus the training-data-pipeline pack (dedup / similarity search /
  * text analysis). Every SQL-expressible query has a DuckDB oracle in
  * `oracleSql`; LSH-bucketed approximate variants are rows-only by design and
  * their exact counterparts ARE oracle-checked.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.queries("q06_consume_sql")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ TextQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    RefQueries.oracles ++ TextQueries.oracles ++ PipelineQueries.oracles
}
