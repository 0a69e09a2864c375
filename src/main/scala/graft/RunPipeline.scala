package graft

import graft.config.Specs
import graft.pipeline.{JobArgs, PipelineRunner}
import graft.stores.{LookupStore, TokenStore}
import graft.transforms.TransformContext
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** CLI entry point — one collect-to-cleanse run per invocation, the analog of
  * the reference's per-file Glue job submission:
  *
  * {{{
  * runMain graft.RunPipeline <sourceFile> <specJson> <db> <table> \
  *     [mappingCsv|-] [dqJson|-] [lookupDir|-] [yyyy-MM-dd]
  *
  * `-` skips an optional positional argument (sbt's runMain arg splitting
  * cannot pass an empty string).
  * }}}
  *
  * Config files use the reference dialects verbatim (transformation-spec
  * JSON, mapping CSV, dq-rules JSON), so a reference user's per-dataset
  * config carries over unchanged.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: RunPipeline <sourceFile> <specJson> <db> <table> [mappingCsv] [dqJson] [lookupDir] [yyyy-MM-dd]")
    val Array(sourceFile, specPath, db, table) = args.take(4)
    def opt(i: Int): Option[String] =
      args.lift(i).filter(p => p.nonEmpty && p != "-")
    val mapping = opt(4)
      .map(p => Specs.mappingCsv(Files.readString(Paths.get(p)))).getOrElse(Seq.empty)
    val dq = opt(5)
      .map(p => Specs.dqRules(Specs.readJsonFile(p))).getOrElse(Map.empty[String, Map[String, Seq[String]]])
    val lookupStore = opt(6)
      .map(LookupStore.fromDirectory).getOrElse(LookupStore.empty)
    val date = opt(7).map(java.time.LocalDate.parse)
      .getOrElse(java.time.LocalDate.now())

    // Persistent catalog (embedded Derby metastore) so cleanse tables written
    // by this JVM are visible to later consume/entity-match runs — the local
    // analog of the Glue Data Catalog.
    val wh = sys.env.getOrElse("GRAFT_WAREHOUSE", "/tmp/graft_warehouse")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$wh/tables")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$wh/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val runner = new PipelineRunner(spark)
    val executionId = java.util.UUID.randomUUID().toString
    val jobArgs = JobArgs(
      sourceSystem = db, tableName = table, sourcePath = sourceFile,
      executionId = executionId,
      partition = runner.partitionFor(date),
      databaseName = db,
      environment = sys.env.getOrElse("GRAFT_ENV", "Dev"),
      lineageSink = sys.env.get("GRAFT_LINEAGE_FILE"))
    val ctx = TransformContext(spark,
      filename = Paths.get(sourceFile).getFileName.toString,
      lookupStore = lookupStore,
      tokenStore = sys.env.get("GRAFT_TOKEN_STORE").map(new TokenStore(_)),
      lineage = Some(new graft.lineage.Lineage(executionId,
        sys.env.get("GRAFT_LINEAGE_FILE"))))

    val out = runner.collectToCleanse(jobArgs, Specs.datasetSpec(Specs.readJsonFile(specPath)),
      mapping, dq, ctx)
    println(s"[graft] wrote ${out.count()} rows to $db.$table " +
      s"partition ${jobArgs.partition.values.mkString("/")}")
    spark.stop()
  }
}
