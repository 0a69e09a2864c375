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
    * @return (vertex, component) — component = min vertex id reachable
    *
    * Each round: one neighbor-min hop + one path-halving jump
    * (label ← label(label)), so convergence takes O(log diameter) rounds
    * instead of O(diameter). Labels only ever decrease, so the sum of labels
    * is a convergence certificate — one agg per round, no change-detection
    * join. */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionByName(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .distinct().cache()
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("label", col("v")).cache()
    var prevSum = Option.empty[java.math.BigDecimal]
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("b") === labels("v"))
        .groupBy(col("a").as("v0")).agg(min(col("label")).as("nmin"))
      val hop = labels.join(neighborMin, labels("v") === col("v0"), "left")
        .select(col("v"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // path halving: label ← label(label)
      val jumped = hop.alias("x")
        .join(hop.select(col("v").as("lv"), col("label").as("ll")).alias("y"),
          col("x.label") === col("lv"), "left")
        .select(col("x.v").as("v"), coalesce(col("ll"), col("x.label")).as("label"))
        // localCheckpoint truncates lineage — without it each round's plan
        // nests the previous rounds' and planning/recompute cost explodes
        .localCheckpoint(true)
      val s = jumped.agg(sum(col("label")).cast("decimal(38,0)")).head().getDecimal(0)
      labels.unpersist()
      labels = jumped
      converged = prevSum.contains(s)
      prevSum = Some(s)
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
