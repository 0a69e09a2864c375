package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    GraphOps.triangles(edges.toDF("s", "t"), "s", "t")
      .as[(Long, Long, Long)].collect().toSet

  test("K4 has exactly its four triangles") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(tri(k4) == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("a 4-cycle has no triangle; closing one diagonal makes two") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(tri(square).isEmpty)
    assert(tri(square :+ (1L, 3L)) == Set((1L, 2L, 3L), (1L, 3L, 4L)))
  }

  test("hub star has no triangle; duplicate/reversed/self edges are ignored") {
    val star = (2L to 20L).map(v => (1L, v))
    assert(tri(star).isEmpty)
    val noisy = star ++ star.map(_.swap) ++ Seq((1L, 1L), (5L, 5L)) :+ (2L, 3L)
    assert(tri(noisy) == Set((1L, 2L, 3L)))
  }

  test("triangleCounts: each K4 vertex sits in three triangles") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val counts = GraphOps.triangleCounts(k4.toDF("s", "t"), "s", "t")
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("skewed hub: forward orientation keeps wedge work off the celebrity") {
    // hub 1 connects to 100 leaves; leaves form a chain. Naive wedge join
    // on the hub = 100*99/2 wedges; degree orientation directs every
    // hub edge AWAY from leaves INTO the hub (hub has max degree), so the
    // hub generates ZERO wedges — assert via the plan's correctness proxy:
    // the result only holds triangles through chain pairs
    val edges = (2L to 101L).map(v => (1L, v)) ++ (2L until 101L).map(v => (v, v + 1))
    val got = tri(edges)
    // triangles: (1, v, v+1) for each chain edge
    assert(got == (2L until 101L).map(v => (1L, v, v + 1)).toSet)
  }
}
