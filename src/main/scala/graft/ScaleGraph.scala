package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 iteration harness: ONLY the incremental-LPA / incremental-
  * PageRank 100× sections of [[ScaleCheck100]] (fixture-identical), so the
  * VERDICT #2 wall-clock work can be measured in minutes instead of a full
  * ScaleCheck100 run. The round's final evidence rows still come from the
  * full ScaleCheck100. Usage: runMain graft.ScaleGraph [n=100] [lpa|pr|both]
  */
object ScaleGraph {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100)
    val which = args.lift(1).getOrElse("both")
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
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    // run-health probe (Bench.calibrate's shape): min of 3 reps of a fixed
    // tiny query — prints before and after so a loaded-sandbox run is
    // visibly discountable (100× graph rows wobbled up to 4× between JVM
    // invocations this round; compare MINs across repeated runs)
    def calibrate(): Double = {
      System.gc()
      (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0, 5000000L).select((col("id") % 997).as("k"))
          .groupBy("k").count()
          .agg(bit_xor(xxhash64(struct(col("k"), col("count"))))).head()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    calibrate()
    println(f"[scale100] calibration_first_s: ${calibrate()}%.3f")
    def timed[A](tag: String)(f: => (A, Long)): A = {
      // untimed inter-row cleanup (Bench.runTimed's posture — see ScaleCheck)
      try { spark.catalog.clearCache() } catch { case _: Throwable => () }
      System.gc()
      Thread.sleep(300)
      val sb0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val (a, rows) = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val sMB = (shuffleBytes.get() - sb0) / 1e6
      println(f"[scale100] $tag: $rows rows in $dt%.1f s (shuffle ~$sMB%.1f MB)")
      a
    }

    if (which == "both" || which == "lpa") locally {
      import graft.operators.GraphOps
      def ring(rows: Long) = spark.range(rows).select(col("id").as("src"),
        explode(array(Seq(1L, 3L, 5L).map(o =>
          col("id") - pmod(col("id"), lit(10L)) +
            pmod(col("id") + o, lit(10L))): _*)).as("dst"))
      val batch = spark.range(50).select((col("id") * 1777L).as("src"),
        (col("id") * 1777L + 5L).as("dst")).localCheckpoint(true)
      Seq(100000L * n -> s"${n}x").foreach { case (rows, tag) =>
        val nodes = spark.range(rows).select(col("id"))
        val edges = ring(rows).localCheckpoint(true)
        val trace = timed(s"LPA from-scratch 3-iter trace $tag")({
          val t = GraphOps.labelPropagationTrace(edges, "src", "dst",
            nodes, "id", 3).localCheckpoint(true)
          (t, t.count())
        })
        timed(s"LPA incremental fixed batch $tag")(((),
          GraphOps.incrementalLabelPropagation(edges, trace, batch,
              "src", "dst", 3)
            .agg(bit_xor(xxhash64(struct(col("iter"), col("id"), col("label"))))
              .as("ck"), count(lit(1)).as("cnt")).head().getLong(1)))
      }
    }

    if (which == "both" || which == "pr") locally {
      import graft.operators.PageRank
      def ring(rows: Long) = spark.range(rows).select(col("id").as("src"),
        (col("id") - pmod(col("id"), lit(10L)) +
          pmod(col("id") + 1L, lit(10L))).as("dst"))
      val batch = spark.range(50).select((col("id") * 10L).as("src"),
        (col("id") * 10L + 5L).as("dst")).localCheckpoint(true)
      Seq(100000L * n -> s"${n}x").foreach { case (rows, tag) =>
        val nodes = spark.range(rows).select(col("id"))
        val edges = ring(rows).localCheckpoint(true)
        val trace = timed(s"PageRank from-scratch 3-iter trace $tag")({
          val t = PageRank.fixedPointTrace(edges, "src", "dst",
            nodes, "id", 3).localCheckpoint(true)
          (t, t.count())
        })
        timed(s"PageRank incremental fixed batch $tag")(((),
          PageRank.incrementalFixedPoint(edges, trace, batch,
              "src", "dst", 3)
            .agg(bit_xor(xxhash64(struct(col("iter"), col("id"), col("pr"))))
              .as("ck"), count(lit(1)).as("cnt")).head().getLong(1)))
      }
    }
    println(f"[scale100] calibration_last_s: ${calibrate()}%.3f")
    spark.stop()
  }
}
