package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Round-14 measurement tool: run ONE declared query with the Bench session
  * shape and print every Spark JOB's wall time + description/callsite,
  * so a composed query's cost decomposes into its legs (guide §1 — find
  * where the time actually goes before touching anything). Usage:
  *   runMain graft.QProfile <queryName> [sfDir] [cpus]
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(2).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.CopyOnWriteArrayList[(Int, Long, Double, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))))
          .getOrElse("")
        jobs.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.remove(j.jobId)).foreach { case (t0, desc) =>
          done.add((j.jobId, t0, (System.nanoTime() - t0) / 1e9, desc))
        }
      }
    })
    graft.queries.PipelineQueries.stageFixtures(spark, sfDir)
    names.foreach { name =>
    Thread.sleep(500)
    done.clear()
    val t0 = System.nanoTime()
    val out = SparkEntry.queries(name)(spark, sfDir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    try out.agg(bit_xor(xxhash64(struct(out.columns.toIndexedSeq.map(col): _*)))).head()
    catch { case _: org.apache.spark.sql.AnalysisException =>
      out.write.format("noop").mode("overwrite").save() }
    val tAll = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val rows = done.asScala.toSeq.sortBy(_._2)
    println(f"[qprofile] $name: total ${tAll}%.2f s (build-side ${tBuild}%.2f s), ${rows.size} jobs")
    var prevEnd = t0
    rows.foreach { case (id, s0, dt, desc) =>
      val gap = (s0 - prevEnd) / 1e9
      if (gap >= 0.2)
        println(f"[qprofile]   --- driver gap ${gap}%6.2f s (before job $id) ---")
      if (dt >= 0.05)
        println(f"[qprofile]   @${(s0 - t0) / 1e9}%6.2f job $id%4d ${dt}%6.2f s  ${desc.take(100)}")
      prevEnd = math.max(prevEnd, s0 + (dt * 1e9).toLong)
    }
    val tiny = rows.filter(_._3 < 0.05)
    println(f"[qprofile]   (+${tiny.size} jobs < 0.05 s, sum ${tiny.map(_._3).sum}%.2f s)")
    }
    spark.stop()
  }
}
