package graft

import graft.config.Specs
import graft.operators.EntityMatch
import org.apache.spark.sql.SparkSession

/** CLI entry for the entity-match job — the analog of the reference's third
  * Glue job:
  *
  * {{{
  * runMain graft.RunEntityMatch <matchSpecJson> <incomingTableOrParquet> [rowKey,cols]
  * }}}
  *
  * First run seeds the primary entity table (uuid-filled); later runs do
  * exact + fuzzy matching and upsert. Uses the same persistent metastore as
  * RunPipeline/RunConsume.
  */
object RunEntityMatch {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunEntityMatch <matchSpecJson> <incomingTableOrParquet> [rowKey,cols]")
    val specJson = Specs.readJsonFile(args(0))
    val spec = EntityMatch.parseSpec(specJson)
    val rowKey = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq(spec.sourcePrimaryKey, spec.sourceSystemKey))

    val wh = sys.env.getOrElse("GRAFT_WAREHOUSE", "/tmp/graft_warehouse")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-entity-match")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$wh/tables")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$wh/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val incoming =
      if (args(1).endsWith(".parquet") || args(1).contains("/"))
        spark.read.parquet(args(1))
      else spark.table(args(1))
    val out = EntityMatch.run(spark, incoming, spec, rowKey)
    val primaryCount = spark.table(spec.primaryTable).count()
    println(s"[graft] entity match processed ${out.count()} incoming rows; " +
      s"primary table ${spec.primaryTable} now has $primaryCount entities")
    spark.stop()
  }
}
