package graft

import graft.functions.{SimilarityFunctions => S}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth checkpoint (BASELINE.md): replicate the sf0.1 corpus Nx with
  * id offsets and time the similarity-join family, validating that runtime
  * tracks OUTPUT size (true pairs grow ~N² from replicated cliques) rather
  * than input-pairs (which would be the all-pairs quadratic signature).
  * Usage: runMain graft.ScaleCheck [sfDir] [replication]. */
object ScaleCheck {
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

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[scale] $tag: $rows rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def toks(df: DataFrame) = df.select(col("lang"), col("source"), col("doc_id"),
      array_distinct(S.tokens(col("text"))).as("toks"))

    val docs = queries.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    docs.count() // warm
    val rep = (0 until n).map(i => docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        col("lang"), col("source"), col("text")))
      .reduce(_ unionByName _)

    t("jaccardSelfJoin t=0.7 blocked 1x")(
      operators.Dedup.jaccardSelfJoin(toks(docs), "toks", "doc_id",
        Seq("lang", "source"), 0.7).count())
    t(s"jaccardSelfJoin t=0.7 blocked ${n}x")(
      operators.Dedup.jaccardSelfJoin(toks(rep), "toks", "doc_id",
        Seq("lang", "source"), 0.7).count())
    val pairs1 = operators.Dedup.jaccardSelfJoin(toks(docs), "toks", "doc_id",
      Seq("lang", "source"), 0.7).select(col("id_a"), col("id_b"))
    t("connected components 1x")(
      operators.ConnectedComponents.run(pairs1, "id_a", "id_b").count())
    val pairsN = operators.Dedup.jaccardSelfJoin(toks(rep), "toks", "doc_id",
      Seq("lang", "source"), 0.7).select(col("id_a"), col("id_b"))
    t(s"connected components ${n}x")(
      operators.ConnectedComponents.run(pairsN, "id_a", "id_b").count())
    spark.stop()
  }
}
