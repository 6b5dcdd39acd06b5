package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the stage
  * that turns pairwise duplicate EDGES into actionable duplicate CLUSTERS
  * (keep one representative, drop the rest). The reference delegates all
  * analytics to ClickHouse, which has no iterative graph operator at all;
  * this is part of the added LLM-pipeline surface (SURVEY §2.11).
  *
  * Algorithm: every node starts labeled with its own id; each round, every
  * node adopts the minimum label among itself and its neighbors; at the
  * fixpoint the label is the minimum node id of the component. Rounds
  * needed = graph diameter.
  *
  * Scale shape (100 TB):
  *  - each round is ONE shuffle join (labels ⋈ edges on src) + ONE hash
  *    aggregation (min label per dst) + a left join back — all equi-key,
  *    no all-pairs anywhere;
  *  - the symmetric edge list is materialized once (lazy localCheckpoint)
  *    and re-read every round instead of recomputing its upstream;
  *  - per-round `localCheckpoint` truncates the lineage so the plan does
  *    not grow with the iteration count (the classic iterative-Spark
  *    failure mode); at real cluster scale a production job would persist
  *    labels to a table between rounds for fault tolerance;
  *  - dedup graphs are shallow: when edges come from shared-key buckets
  *    (content hash, MinHash band, SimHash band), components are unions
  *    of stars around bucket minima, so the diameter — and the round
  *    count — is small regardless of corpus size. For adversarially deep
  *    graphs the alternating large-star/small-star scheme (Kiveris et
  *    al., "Connected Components in MapReduce and Beyond") bounds rounds
  *    at O(log² n); this implementation keeps the simpler propagation and
  *    makes non-convergence loud instead of silent.
  */
object ConnectedComponents {

  /** @param nodes one column `id` (numeric); @param edges columns
    * `src`/`dst` in either orientation, duplicates allowed.
    * @return one row per node: (`id`, `comp`) with `comp` = min node id
    * reachable from `id` (its own id for isolated nodes).
    *
    * NOTE: unlike ordinary catalog operators this EXECUTES at call time
    * (the convergence loop needs an action per round — inherent to any
    * data-dependent iterative algorithm); callers wanting only the final
    * plan still pay the full fixpoint.
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(false)

    var labels = nodes.select(col("id"), col("id").as("comp"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = labels.join(sym, labels("id") === sym("src"))
        .groupBy(col("dst").as("nid")).agg(min(col("comp")).as("nmin"))
      // eager checkpoint: one materialization serves the convergence
      // check AND the next round's input
      val next = labels.join(neighborMin, labels("id") === col("nid"), "left")
        .select(labels("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          coalesce(col("nmin") < col("comp"), lit(false)).as("changed"))
        .localCheckpoint()
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("id"), col("comp"))
      iter += 1
    }
    require(converged,
      s"connected components did not converge within $maxIters rounds " +
        "(graph diameter exceeds the bound — raise maxIters or switch " +
        "to alternating large/small-star)")
    labels
  }
}
