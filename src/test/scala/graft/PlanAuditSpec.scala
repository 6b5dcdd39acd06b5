package graft

/** Catalog-wide physical-plan guardrails: the anti-patterns that silently
  * turn a working sf0.01 query into a dead one at 100 TB must not appear
  * in any catalog plan. Runs on the smallest fixture — plan shape, not
  * data, is under test.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose nested-loop join is the DESIGN, not an accident:
    *  - v1: brute-force cosine top-k is deliberately broadcast-Q x scan-N
    *    (the exact baseline the ANN variants are judged against);
    *  - p4: the corpus-size scalar N arrives as a one-row broadcast;
    *  - q22: rows compared against a one-row global aggregate (scalar
    *    subquery — every engine broadcasts the scalar);
    *  - v6: IVF cell assignment scores every vector against the 10-row
    *    broadcast centroid table — a small-side cross product by
    *    definition of a coarse quantizer;
    *  - v7: the per-dim min/max stats arrive as a one-row broadcast.
    */
  private val nestedLoopByDesign =
    Set("v1_cosine_topk", "p4_tfidf", "q22_global_customers", "v6_ivf_ann",
      "v7_quantize")

  test("no catalog query plans a cartesian product") {
    for ((name, fn) <- SparkEntry.queries) {
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product:\n$plan")
    }
  }

  test("no catalog query plans an accidental nested-loop join") {
    for ((name, fn) <- SparkEntry.queries if !nestedLoopByDesign(name)) {
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a nested-loop join:\n$plan")
    }
  }

  test("d14 quota sampling pre-prunes to top-K before the shuffle") {
    val plan = graft.queries.Documents.d14SourceQuota(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=K filter did not compile to a group limit (the exchange " +
        s"would carry every row per source):\n$plan")
  }

  /** Selective scans must reach parquet as pushed filters — a scan that
    * filters AFTER reading every row pays full I/O at 100 TB. Checked on
    * representative queries with a constant predicate on a scanned
    * column (dynamic/derived predicates can't push by nature).
    */
  test("constant predicates reach the parquet scan as PushedFilters") {
    val pushdownQueries =
      Seq("q3_shipping_priority", "q6_forecast_revenue", "q21_semi_anti")
    for (name <- pushdownQueries) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*(GreaterThan|LessThan|EqualTo|In)".r
      assert(pushed.findFirstIn(plan).isDefined,
        s"$name scan has no pushed comparison filter:\n$plan")
    }
  }

  test("every catalog query has a DuckDB oracle (except documented rows-only)") {
    val rowsOnly = Set("m2_decode_features") // stubbed codec, not SQL-expressible
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }
}
