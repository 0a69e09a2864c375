package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 diagnostic: ONLY ScaleCheck's winnow fingerprints+matches row
  * (fixture-identical), with per-stage shuffle attribution — isolates
  * whether the row's r15 wall regression is plan-level or session-state.
  * Usage: runMain graft.ScaleWinnow [sfDir] [n]
  */
object ScaleWinnow {
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
        if (b > 50000000L)
          println(f"[winnow-stage] ${b / 1e6}%.1f MB, ${s.stageInfo.numTasks} tasks <- ${s.stageInfo.name}")
      }
    })
    def timed[A](tag: String)(f: => (A, Long)): A = {
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
    docs.count()
    val offset = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val rep = (0 until n).map(i => docs.select(
        (col("doc_id") + lit(i.toLong * offset)).as("doc_id"),
        col("lang"), col("source"), col("text")))
      .reduce(_ unionByName _)
    Seq(docs -> "1x", rep -> s"${n}x").foreach { case (df, tag) =>
      timed(s"winnow fingerprints+matches k=8 w=8 $tag") {
        val m = operators.Dedup.winnowMatches(
          df.select(col("doc_id"), col("text")), "text", "doc_id",
          minShared = 3).localCheckpoint(true)
        (m, m.count())
      }
    }
    spark.stop()
  }
}
