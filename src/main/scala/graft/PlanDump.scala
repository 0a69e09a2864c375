package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-14 measurement tool: dump `.explain("formatted")` for named
  * declared queries to individual files (plans/r14/<query>_<tag>.txt) —
  * the before/after plan evidence OPTIMIZATION_r14.md cites. Usage:
  *   runMain graft.PlanDump <outDir> <tag> <q1,q2,...> [sfDir]
  */
object PlanDump {
  private def crossShape(s: SparkSession, freqFrom: String) = {
    import org.apache.spark.sql.functions._
    val stored = s.range(0, 5000).select(col("id").as("doc_id"),
      (col("id") % 4).as("grp"),
      split(concat(lit("tok"), col("id") % 97, lit(" tok"), col("id") % 31,
        lit(" tok"), col("id") % 13), " ").as("toks"))
    val batch = s.range(5000, 5500).select(col("id").as("doc_id"),
      (col("id") % 4).as("grp"),
      split(concat(lit("tok"), col("id") % 97, lit(" tok"), col("id") % 31,
        lit(" tok"), col("id") % 13), " ").as("toks"))
    graft.operators.Dedup.jaccardCrossJoin(batch, stored, "toks", "doc_id",
      Seq("grp"), 0.7, freqFrom = freqFrom, materializeVerify = false)
  }

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // pseudo-queries: operator-internal subplans that the declared queries
    // hide behind per-iteration localCheckpoints (e.g. the LPA vote round)
    val pseudo: Map[String, org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame] = Map(
      "op_lpa_vote_round" -> { s =>
        import org.apache.spark.sql.functions._
        val nodes = s.range(0, 1000).select(col("id"))
        val edges = nodes.select(col("id").as("src"), ((col("id") + 1) % 1000).as("dst"))
        // ONE un-checkpointed LPA vote round: the per-iteration plan the
        // declared queries hide behind localCheckpoints
        val sym = edges.select(col("src").as("a"), col("dst").as("b"))
          .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
          .distinct()
        val labels = nodes.select(col("id"), col("id").as("label"))
        graft.operators.GraphOps.argmaxVote(
          sym.join(labels.select(col("id").as("b"), col("label")), Seq("b")))
      },
      // the incremental-dedup cross join under both canonical-order
      // strategies (r15: the gate's per-batch O(stored-tokens) tokenFreq
      // fix) — materializeVerify=false so the verify barrier does not hide
      // the join shape; the gate's stored side is pre-tokenized, as here
      "op_incdedup_cross_union" -> (s => crossShape(s, "union")),
      "op_incdedup_cross_left" -> (s => crossShape(s, "left")),
      // the round-13 vote formulation, inlined VERBATIM from
      // eab6dc0:GraphOps.labelPropagation, so the before/after plan pair is
      // mechanically generated (the declared queries checkpoint per round,
      // hiding this subplan from their own explain output)
      "op_lpa_vote_round_r13" -> { s =>
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val nodes = s.range(0, 1000).select(col("id"))
        val edges = nodes.select(col("id").as("src"), ((col("id") + 1) % 1000).as("dst"))
        val sym = edges.select(col("src").as("a"), col("dst").as("b"))
          .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
          .distinct()
        val labels = nodes.select(col("id"), col("id").as("label"))
        val votes = sym
          .join(labels.select(col("id").as("b"), col("label")), Seq("b"))
          .groupBy(col("a"), col("label")).agg(count(lit(1)).as("__n"))
        votes.withColumn("__r", row_number().over(
            Window.partitionBy(col("a")).orderBy(col("__n").desc, col("label"))))
          .filter(col("__r") === 1)
          .select(col("a").as("id"), col("label"))
      })
    names.foreach { name =>
      val fn = pseudo.get(name).map(f => (_: org.apache.spark.sql.SparkSession, _: String) => f(spark))
        .orElse(SparkEntry.queries.get(name))
        .getOrElse(sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode) + "\n")
      println(s"[plandump] $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
