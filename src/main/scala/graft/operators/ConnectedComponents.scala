package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the step that
  * turns pairwise near-dup evidence into dedup CLUSTERS (transitive closure),
  * where pair-based dropping alone over- or under-keeps.
  *
  * Each round every vertex takes the min label among itself and its
  * neighbors; convergence needs at most the graph diameter rounds (near-dup
  * graphs are shallow — dup clusters are cliques or short chains). All
  * DataFrame joins/aggregations: shuffles on vertex id only, no driver-side
  * graph. */
object ConnectedComponents {

  /** @param edges two-column frame (src, dst), undirected (direction ignored)
    * @return (vertex, component) — component = min vertex id reachable */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct().cache()
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("label", col("v")).cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("b") === labels("v"))
        .groupBy(col("a").as("v0")).agg(min(col("label")).as("nmin"))
      val updated = labels.join(neighborMin, labels("v") === col("v0"), "left")
        .select(col("v"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      updated.count()
      val changed = updated.alias("u")
        .join(labels.alias("l"), col("u.v") === col("l.v"))
        .filter(col("u.label") =!= col("l.label"))
        .limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels.select(col("v").as("vertex"), col("label").as("component"))
  }

  /** Dedup clustering: survivors = one representative (min id) per component,
    * plus every unpaired id. */
  def dedupByComponents(ids: DataFrame, pairs: DataFrame, idCol: String,
                        aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val comp = run(pairs, aCol, bCol)
    val reps = comp.groupBy("component").agg(min(col("vertex")).as(idCol))
      .select(col(idCol))
    val paired = comp.select(col("vertex").as(idCol))
    val unpaired = ids.select(col(idCol)).join(paired, Seq(idCol), "left_anti")
    reps.unionByName(unpaired)
  }
}
