package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Connected components: small-graph union-find path vs distributed
  * label-propagation path on hand-traced graphs. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("components of a hand-traced graph (driver union-find path)") {
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L), (3L, 3L))
      .toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("distributed label propagation matches the union-find result") {
    // a diameter-4 chain (worst case for propagation rounds), a triangle,
    // a 2-cycle, and duplicate/reversed edges
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L), (21L, 20L),
      (2L, 1L), (1L, 2L)).toDF("src", "dst")
    val small = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val staged = Graph.connectedComponentsStaged(edges, "src", "dst",
      smallGraphThreshold = 0, maxIter = 6)
    val dist = staged.df.as[(Long, Long)].collect().toMap
    staged.release()
    assert(dist == small)
    assert(small(5L) == 1L && small(12L) == 10L && small(21L) == 20L)
  }

  test("triangleCounts: K4 has 4 triangles, 3 per vertex; chords count once") {
    // K4 on {1,2,3,4} plus a pendant edge (5) and a duplicate/reversed edge
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = (k4 ++ Seq((4L, 5L), (2L, 1L), (1L, 2L))).toDF("src", "dst")
    val got = Graph.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: triangle-free graphs yield no rows") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangleCounts(path, "src", "dst").count() == 0)
  }

  test("null endpoints are dropped, vertex set is edge-covered only") {
    val edges = Seq((Some(1L), Some(2L)), (None, Some(9L)), (Some(7L), None))
      .toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }
}
