package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Min-label propagation: multi-hop convergence, isolated nodes, edge
  * orientation/duplicates, and the loud non-convergence guard.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(nodes: Seq[Long], edges: Seq[(Long, Long)],
      maxIters: Int = 50): Map[Long, Long] =
    ConnectedComponents.run(
        nodes.toDF("id"), edges.toDF("src", "dst"), maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph needs one hop per round and still converges to the min") {
    // worst-case orientation: the min id sits at the far end of a chain
    val got = labelsOf(
      nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L),
      edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L)))
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("separate components keep separate minima; isolated nodes self-label") {
    val got = labelsOf(
      nodes = Seq(10L, 11L, 12L, 13L, 20L),
      edges = Seq((11L, 10L), (13L, 12L), (12L, 13L))) // dup + both orientations
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 12L, 13L -> 12L, 20L -> 20L))
  }

  test("star unions merge transitively across shared members") {
    // bucket A = {1,2,3} starred to 1; bucket B = {3,4,5} starred to 3:
    // one component rooted at 1 even though 4 and 5 never saw bucket A
    val got = labelsOf(
      nodes = Seq(1L, 2L, 3L, 4L, 5L),
      edges = Seq((2L, 1L), (3L, 1L), (4L, 3L), (5L, 3L)))
    assert(got.values.toSet === Set(1L))
  }

  test("non-convergence inside the round bound fails loudly, not silently") {
    val e = intercept[IllegalArgumentException] {
      labelsOf(
        nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L),
        edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L)),
        maxIters = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
