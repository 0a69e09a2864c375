package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions => S}

/** Round-15 measurement tool (the r14 ScaleGraph precedent): ONLY the
  * incremental-dedup and q209 daily-ops chain sections of [[ScaleCheck]],
  * fixture-identical (same replication, same timers, same shuffle listener),
  * for minutes-scale iteration on the dedup-gate per-batch cost (VERDICT
  * r15 #1) without paying the full ScaleCheck run. Usage:
  *   runMain graft.ScaleOps [sfDir] [n]
  */
object ScaleOps {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val b = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleBytes.addAndGet(b)
        if (b > 5000000L) // temporary attribution aid: name the heavy stages
          println(f"[scale-stage] ${b / 1e6}%.1f MB <- ${s.stageInfo.name} :: " +
            s.stageInfo.details.linesIterator.take(3).mkString(" | "))
      }
    })
    def timed[A](tag: String)(f: => (A, Long)): A = {
      // untimed inter-row cleanup (Bench.runTimed's posture — see ScaleCheck)
      try { spark.catalog.clearCache() } catch { case _: Throwable => () }
      System.gc()
      Thread.sleep(200)
      val sb0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val (a, rows) = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val sMB = (shuffleBytes.get() - sb0) / 1e6
      println(f"[scale] $tag: $rows rows in $dt%.1f s (shuffle ~$sMB%.1f MB)")
      a
    }

    val docs = queries.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    docs.count() // warm
    val offset = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val rep = (0 until n).map(i => docs.select(
        (col("doc_id") + lit(i.toLong * offset)).as("doc_id"),
        col("lang"), col("source"), col("text")))
      .reduce(_ unionByName _)

    // ---- incremental dedup: FIXED daily batch vs growing stored corpus
    // (verbatim ScaleCheck section)
    locally {
      val toksOf = (df: DataFrame) => df.select(col("doc_id"), col("lang"),
        col("source"), array_distinct(S.tokens(col("text"))).as("toks"))
      val batch = toksOf(docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + lit(1000L * offset)).as("doc_id"),
          col("lang"), col("source"), col("text")))
        .localCheckpoint(true)
      Seq(docs -> "1x", rep -> s"${n}x").foreach { case (df, tag) =>
        timed(s"incremental dedup, fixed batch vs $tag stored corpus")(((),
          operators.Dedup.incrementalDedup(toksOf(df), batch, "toks",
            "doc_id", Seq("lang", "source"), 0.7)
            .groupBy(col("status")).count().collect().map(_.getLong(1)).sum))
      }
    }

    // ---- q209 daily-ops chain at 1x/Nx (verbatim ScaleCheck section)
    locally {
      import graft.catalog.{Compaction, Retention}
      import graft.streaming.{BatchCommitLog, StreamingOps}
      val d0 = queries.Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      val dOff = d0.agg(max(col("doc_id"))).head().getLong(0) + 1
      val e0 = queries.Tables(spark, sfDir, "embeddings")
      val eOff = e0.agg(max(col("vec_id"))).head().getLong(0) + 1
      val centroids =
        graft.functions.expressions.HashExpressions.fixedCentroids(100, 16, 64)
      val fc = graft.functions.expressions.HashExpressions.fixedCentroids(200, 128, 8)
      val codebooks = Array.tabulate(8)(j => fc.slice(j * 16, j * 16 + 16))
      def rmTree(p: String): Unit =
        try {
          val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
          try s.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
          finally s.close()
        } catch { case _: Throwable => () }
      def chain(k: Int, tag: String): Unit = {
        val db = s"scaleops_$tag"
        spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
        Seq("cleansed", "quarantine", "corpus", "report", "annidx")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $db.$t"))
        val docsK = (0 until k).map(i => d0.select(
            (col("doc_id") + lit(i.toLong * dOff)).as("doc_id"),
            col("lang"), col("n_chars"), col("text")))
          .reduce(_ unionByName _)
        val twinOff = (k.toLong * dOff + 19) / 20 * 20
        val ingest = docsK.unionByName(
            docsK.filter(pmod(col("doc_id"), lit(20)) === 0)
              .select((col("doc_id") + twinOff).as("doc_id"), col("lang"),
                col("n_chars"), col("text")))
          .withColumn("grp", pmod(col("doc_id"), lit(4)).cast("int"))
        val dir1 = java.nio.file.Files.createTempDirectory(s"scaleops_docs").toString
        timed(s"daily-ops staging $tag")(((),
          { ingest.repartition(4, col("grp"))
              .write.mode("overwrite").partitionBy("grp").parquet(dir1); 0L }))
        val staged1 = spark.read.parquet(dir1)
        val ck1 = java.nio.file.Files.createTempDirectory("scaleops_dq").toString
        timed(s"daily-ops leg1 DQ gate $tag")(((), {
          StreamingOps.ingestDqGate(
            spark.readStream.schema(staged1.schema).option("maxFilesPerTrigger", 1)
              .parquet(dir1),
            Seq("ColumnValues 'n_chars' >= 200"),
            s"$db.cleansed", s"$db.quarantine", ck1, availableNow = true)
            .awaitTermination()
          spark.sql(s"REFRESH TABLE $db.cleansed")
          spark.sql(s"REFRESH TABLE $db.quarantine")
          spark.table(s"$db.quarantine").count() }))
        val dir2 = java.nio.file.Files.createTempDirectory("scaleops_clean").toString
        val ck2 = java.nio.file.Files.createTempDirectory("scaleops_dd").toString
        timed(s"daily-ops leg2 dedup gate $tag")(((), {
          spark.table(s"$db.cleansed").select("doc_id", "grp", "text")
            .repartition(4, col("grp"))
            .write.mode("overwrite").partitionBy("grp").parquet(dir2)
          val staged2 = spark.read.parquet(dir2)
          StreamingOps.ingestDedupGate(
            spark.readStream.schema(staged2.schema).option("maxFilesPerTrigger", 1)
              .parquet(dir2),
            "text", "doc_id", Seq("grp"), threshold = 0.999,
            s"$db.corpus", s"$db.report", ck2, availableNow = true)
            .awaitTermination()
          spark.sql(s"REFRESH TABLE $db.corpus")
          spark.table(s"$db.corpus").count() }))
        val embK = (0 until k).map(i => e0.select(
            (col("vec_id") + lit(i.toLong * eOff)).as("vec_id"), col("embedding")))
          .reduce(_ unionByName _)
        val dir3 = java.nio.file.Files.createTempDirectory("scaleops_emb").toString
        embK.repartition(4).write.mode("overwrite").parquet(dir3)
        val staged3 = spark.read.parquet(dir3)
        val ck3 = java.nio.file.Files.createTempDirectory("scaleops_ann").toString
        timed(s"daily-ops leg3 ANN gate $tag")(((), {
          StreamingOps.ingestAnnGate(
            spark.readStream.schema(staged3.schema).option("maxFilesPerTrigger", 1)
              .parquet(dir3),
            "embedding", "vec_id", centroids, codebooks, s"$db.annidx", ck3,
            availableNow = true).awaitTermination()
          spark.sql(s"REFRESH TABLE $db.annidx")
          spark.table(s"$db.annidx").count() }))
        timed(s"daily-ops leg4 consolidation $tag")(((), {
          val wm2 = BatchCommitLog.committed(spark, ck2).get
          val wm3 = BatchCommitLog.committed(spark, ck3).get
          (Compaction.consolidateBatches(spark, s"$db.corpus", wm2, Seq("doc_id")) +
            Compaction.consolidateBatches(spark, s"$db.annidx", wm3, Seq("vec_id"))).toLong }))
        timed(s"daily-ops leg5 forget $tag")(((), {
          val docKeys = spark.table(s"$db.corpus")
            .filter(pmod(col("doc_id"), lit(13)) === 0).select(col("doc_id")).distinct()
          Retention.deleteRowsAll(spark, docKeys, Seq(
            Retention.DeleteTarget(s"$db.corpus", "doc_id"),
            Retention.DeleteTarget(s"$db.report", "doc_id")))
          val vecKeys = embK
            .filter(pmod(col("vec_id"), lit(13)) === 0).select(col("vec_id")).distinct()
          Retention.deleteRowsAll(spark, vecKeys,
            Seq(Retention.DeleteTarget(s"$db.annidx", "vec_id")))
          0L }))
        timed(s"daily-ops leg6 never-contained ANN equality $tag")(((), {
          val survivorIdx = operators.Ann.ivfPqIndex(
            embK.filter(pmod(col("vec_id"), lit(13)) =!= 0),
            "embedding", "vec_id", centroids, codebooks)
          val storedIdx = spark.table(s"$db.annidx").select("vec_id", "__list", "code")
          require(storedIdx.exceptAll(survivorIdx).isEmpty &&
            survivorIdx.exceptAll(storedIdx).isEmpty,
            "post-delete ANN index must equal the never-contained build")
          0L }))
        timed(s"daily-ops leg7 DP release $tag")(((),
          operators.Privacy.dpCounts(
              spark.table(s"$db.corpus")
                .join(ingest.select(col("doc_id"), col("lang")), Seq("doc_id")),
              Seq("lang"), epsilon = 0.5, seed = "ops1")
            .count()))
        spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
        Seq(dir1, ck1, dir2, ck2, dir3, ck3).foreach(rmTree)
      }
      chain(1, "1x")
      chain(n, s"${n}x")
    }
    spark.stop()
  }
}
