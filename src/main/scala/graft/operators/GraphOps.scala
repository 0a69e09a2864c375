package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics beyond component labeling (see [[ConnectedComponents]] /
  * [[PageRank]]): triangle enumeration — the structural signal behind
  * clustering coefficients, community density, and link-spam detection in a
  * web-crawl corpus.
  */
object GraphOps {

  /** Enumerate all triangles of an undirected graph, each exactly once, as
    * (a, b, c) with a < b < c.
    *
    * The naive wedge join (all 2-paths × edge membership) is quadratic in
    * the max degree — one celebrity node generates d² wedges. This uses the
    * standard DEGREE-ORDERED orientation: direct every edge from its
    * (degree, id)-smaller endpoint to the larger, then join forward edges on
    * their source. Every wedge generator now has out-degree bounded by
    * O(√E) (a node of degree d keeps forward edges only toward
    * same-or-higher-degree nodes, of which there are ≤ 2E/d), so total
    * wedge work is O(E^1.5) regardless of skew — the classic MapReduce
    * triangle bound. All steps are equi-joins and bounded aggregations;
    * nothing is quadratic in any single node's degree.
    *
    * Self-loops are dropped; parallel edges collapse via the canonical
    * (min, max) distinct.
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("ea"),
        greatest(col("u"), col("v")).as("eb"))
      .distinct()
    val deg = e.select(explode(array(col("ea"), col("eb"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("n").as("ea"), col("d").as("da")), Seq("ea"))
      .join(deg.select(col("n").as("eb"), col("d").as("db")), Seq("eb"))
    val fwd = withDeg.select(
      when(struct(col("da"), col("ea")) < struct(col("db"), col("eb")),
        struct(col("ea").as("s"), col("eb").as("t")))
        .otherwise(struct(col("eb").as("s"), col("ea").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    val wedges = fwd.as("e1").join(fwd.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("u"), col("e1.t").as("v"), col("e2.t").as("w"))
    val closed = wedges.join(e,
      least(col("v"), col("w")) === col("ea") &&
        greatest(col("v"), col("w")) === col("eb"), "left_semi")
    closed
      .select(array_sort(array(col("u"), col("v"), col("w"))).as("t"))
      .select(element_at(col("t"), 1).as("a"), element_at(col("t"), 2).as("b"),
        element_at(col("t"), 3).as("c"))
  }

  /** Per-vertex triangle participation counts (vertices in ≥1 triangle). */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    triangles(edges, srcCol, dstCol)
      .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))

  /** SYNCHRONOUS label propagation — community detection over the link /
    * near-dup graph, the deterministic variant: every node starts labeled
    * with its own id; each iteration EVERY node simultaneously adopts the
    * most frequent label among its (distinct, symmetrized) neighbors, ties
    * broken by the smallest label; isolated nodes keep theirs. The
    * textbook asynchronous LPA is update-order-dependent and therefore
    * irreproducible across partitionings — synchronous + a total tiebreak
    * is the only formulation a distributed engine should ship (and the
    * only one an oracle can replay).
    *
    * Per iteration: one edge-label equi-join, one (node, label) count, one
    * per-node argmax window — all shuffles keyed on node id, nothing
    * quadratic in degree. Labels materialize each round (localCheckpoint)
    * so the plan does not deepen with `iters`; a hub node's vote count is
    * one aggregation row per (hub, label), never a widened row. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       nodes: DataFrame, idCol: String, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    import org.apache.spark.sql.expressions.Window
    val sym = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct().localCheckpoint(true)
    val ids = nodes.select(col(idCol).as("id")).localCheckpoint(true)
    var labels = ids.select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      val votes = sym
        .join(labels.select(col("id").as("b"), col("label")), Seq("b"))
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("__n"))
      val next = votes.withColumn("__r", row_number().over(
          Window.partitionBy(col("a")).orderBy(col("__n").desc, col("label"))))
        .filter(col("__r") === 1)
        .select(col("a").as("id"), col("label"))
      labels = ids.join(next, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
        .localCheckpoint(true)
    }
    labels.select(col("id").as(idCol), col("label"))
  }
}
