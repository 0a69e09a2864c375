package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in FIXED-POINT integer arithmetic — the domain/page
  * authority signal curation pipelines use for source-quality weighting
  * (e.g. ranking crawl domains before sampling), in a formulation that is
  * EXACT under a hash-compare oracle:
  *
  *  - ranks are scaled integers (`scale` = 1.0), contributions are integer
  *    floor divisions `r div outdeg`, and the damping step is
  *    `(1-d)·scale + (dNum · Σcontrib) div dDen` — every operation is an
  *    integer op, so partial-aggregation order cannot perturb the result
  *    (double summation order would), and a sequential SQL replay of the
  *    same unrolled iterations matches bit-for-bit.
  *
  * Scale shape per iteration: one equi-join of edges onto the rank table
  * (shuffle on src), one hash aggregation of contributions (map-side
  * partial sums — integer adds combine), one left join back onto the node
  * set. All standard co-partitionable shapes; nothing is driver-bound. Like
  * [[ConnectedComponents]], each iteration's result is localCheckpoint'd
  * past `checkpointEvery` iterations to truncate the growing lineage.
  */
object PageRank {

  /** @param edges      directed edge list (parallel edges count twice)
    * @param srcCol     source-node column on `edges`
    * @param dstCol     destination-node column on `edges`
    * @param nodes      node universe (ids; nodes with no in-edges keep the
    *                   base rank, nodes absent from `edges` dangle silently
    *                   — their mass is dropped, the standard simplification)
    * @param idCol      id column on `nodes`
    * @param iterations fixed iteration count (deterministic, no tolerance)
    * @param scale      fixed-point scale of rank 1.0
    * @param dampNum/dampDen damping d as a rational (85/100 = 0.85)
    * @return (idCol, pr) — pr after `iterations` rounds, fixed-point */
  def fixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                 nodes: DataFrame, idCol: String, iterations: Int,
                 scale: Long = 1000000L, dampNum: Long = 85,
                 dampDen: Long = 100, checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 0 && scale > 0 && dampNum >= 0 && dampDen > 0)
    val base = scale - (dampNum * scale) / dampDen // (1-d)·scale, exact
    val ids = nodes.select(col(idCol))
    val outdeg = edges.groupBy(col(srcCol)).agg(count(lit(1)).as("__deg"))
    // degree table reused every iteration — joined once onto the edges here
    val degEdges = edges.select(col(srcCol), col(dstCol))
      .join(outdeg, srcCol).localCheckpoint(true)
    var ranks = ids.withColumn("pr", lit(scale))
    for (i <- 1 to iterations) {
      val contribs = degEdges
        .join(ranks.withColumnRenamed(idCol, "__src_id"),
          col(srcCol) === col("__src_id"))
        .select(col(dstCol), expr("pr div __deg").as("__c"))
        .groupBy(col(dstCol)).agg(sum(col("__c")).as("__s"))
      ranks = ids
        .join(contribs, col(idCol) === col(dstCol), "left")
        .select(col(idCol),
          (lit(base) + expr(s"$dampNum * coalesce(__s, 0) div $dampDen"))
            .as("pr"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
