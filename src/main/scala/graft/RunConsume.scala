package graft

import graft.config.Specs
import graft.pipeline.{JobArgs, PipelineRunner}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** CLI entry for the Cleanse→Consume stage — the analog of the reference's
  * second Glue job:
  *
  * {{{
  * runMain graft.RunConsume <sparkSqlFile> <db> <table> [dqJson|-] [viewSqlFile|-] [k=v ...]
  * }}}
  *
  * The Spark SQL file may use `{placeholder}` substitutions (filled from the
  * trailing k=v args) and a leading `CREATE TABLE <name> AS` to override the
  * target; the optional view file's ';'-separated statements run after the
  * publish (the Athena/Redshift passthrough as local views).
  */
object RunConsume {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: RunConsume <sparkSqlFile> <db> <table> [dqJson] [viewSqlFile] [k=v ...]")
    val Array(sqlPath, db, table) = args.take(3)
    def fileArg(i: Int): Option[String] =
      args.lift(i).filter(p => p.nonEmpty && p != "-" && !p.contains("="))
    val dq = fileArg(3).map(p => Specs.dqRules(Specs.readJsonFile(p)))
      .getOrElse(Map.empty[String, Map[String, Seq[String]]])
    val viewSql = fileArg(4)
      .map(p => Specs.sqlStatements(Files.readString(Paths.get(p)))).getOrElse(Seq.empty)
    val subs = args.drop(3).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap

    // same persistent catalog as RunPipeline (see there)
    val wh = sys.env.getOrElse("GRAFT_WAREHOUSE", "/tmp/graft_warehouse")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-consume")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$wh/tables")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$wh/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val runner = new PipelineRunner(spark)
    val jobArgs = JobArgs(db, table, "", java.util.UUID.randomUUID().toString,
      runner.partitionFor(java.time.LocalDate.now()), db,
      environment = sys.env.getOrElse("GRAFT_ENV", "Dev"))
    val out = runner.cleanseToConsume(jobArgs,
      Files.readString(Paths.get(sqlPath)), subs, dq, viewSql)
    println(s"[graft] consume published ${out.count()} rows")
    spark.stop()
  }
}
