package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components — the stage that turns pairwise
  * duplicate EDGES into actionable duplicate CLUSTERS (keep one
  * representative, drop the rest). The reference delegates all analytics
  * to ClickHouse, which has no iterative graph operator at all; this is
  * part of the added LLM-pipeline surface (SURVEY §2.11).
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  * and Beyond", SoCC'14). Each round rewires the edge set toward the
  * component minimum:
  *  - large-star: every node points its STRICTLY LARGER neighbors at the
  *    minimum of its neighborhood (including itself);
  *  - small-star: every node points its smaller neighbors (and itself) at
  *    the minimum of its smaller neighborhood.
  * The fixpoint is a star per component centered on the component's
  * minimum node id, reached in O(log² n) rounds REGARDLESS of graph
  * diameter — a path graph of length 10⁶ converges in ~20 rounds where
  * plain min-label propagation needs 10⁶. Dedup graphs (bucket stars)
  * converge in 2–3.
  *
  * Scale shape (100 TB):
  *  - each star op is ONE hash aggregation (min per endpoint) + ONE
  *    equi-join back to the edges — no all-pairs anywhere; edges stay
  *    oriented (src > dst) between rounds so only large-star pays the
  *    symmetrize union;
  *  - every round's edge set is re-materialized through a [[RoundStore]],
  *    truncating the lineage so the plan does not grow with iteration
  *    count (the classic iterative-Spark failure mode);
  *  - [[TableRounds]] is the production store: rounds persist to
  *    alternating BUCKETED catalog tables, so a lost executor recomputes
  *    from durable parquet instead of killing the job (the failure mode
  *    of `localCheckpoint`, whose blocks are executor-local and
  *    non-resilient). [[CheckpointRounds]] remains for small/ephemeral
  *    graphs where table churn isn't worth it;
  *  - convergence is a deterministic set-equality check (count match +
  *    empty EXCEPT), not a hash compare.
  */
object ConnectedComponents {

  /** Per-round materialization strategy for the iterative edge set. */
  sealed trait RoundStore {
    /** Materialize this round's edges; the returned frame must be safe to
      * read repeatedly without recomputing upstream. */
    def put(df: DataFrame, round: Int): DataFrame
    /** Run the whole fixpoint under this store's liveness regime (a
      * durable store heartbeats so concurrent sessions' orphan sweeps
      * see an ACTIVE run, however long a round takes). Default: no-op.
      */
    def withLiveness[T](f: => T): T = f
  }

  /** Executor-local eager checkpoint: cheapest, but blocks are lost with
    * their executor — use for tests and small ephemeral graphs only. */
  case object CheckpointRounds extends RoundStore {
    override def put(df: DataFrame, round: Int): DataFrame = df.localCheckpoint()
  }

  /** Durable rounds: each edge set is written to one of two alternating
    * managed tables (`<prefix>_0`/`<prefix>_1`), bucketed + sorted on
    * `src`, and read back from the catalog — executor loss recomputes
    * from parquet, and the previous round stays readable for the
    * convergence compare. Tables are dropped and recreated on the next
    * [[run]] with the same prefix; the final round's table intentionally
    * outlives the call (the returned labels read from it) — the CALLER
    * owns its lifetime and should [[reset]] once the labels are consumed.
    * Prefixes are catalog-global: pass a per-run unique prefix (see
    * `Documents.d12DupClusters`) unless runs are strictly serialized.
    */
  final case class TableRounds(spark: SparkSession, prefix: String, numBuckets: Int = 8)
      extends RoundStore {
    private def name(round: Int) = s"${prefix}_${round % 2}"
    /** The liveness unit is the PREFIX (covers both alternating tables):
      * heartbeat file `<warehouse>/<prefix>._GRAFT_ALIVE`. */
    private def warehousePrefix = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.getConfString("spark.sql.warehouse.dir"), prefix)
    private def fs = warehousePrefix.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def reset(): Unit =
      Seq(0, 1).foreach(g => ReplicaTable.dropTableAndLocation(spark, s"${prefix}_$g"))
    override def put(df: DataFrame, round: Int): DataFrame = {
      // phase-boundary heartbeat (the ticker in withLiveness covers a
      // single LONG round; this keeps the mtime honest between rounds
      // even when run() was bypassed and puts are issued directly)
      LivenessMarker.touch(fs, warehousePrefix)
      val n = name(round)
      ReplicaTable.dropTableAndLocation(spark, n)
      df.write.format("parquet")
        .bucketBy(numBuckets, "src").sortBy("src")
        .saveAsTable(n)
      spark.table(n)
    }
    override def withLiveness[T](f: => T): T =
      LivenessMarker.whileAlive(fs, warehousePrefix)(f)
  }

  /** A fresh durable [[TableRounds]] for a query family (e.g.
    * `cc_d12`): mints a per-run unique prefix — two concurrent runs (or
    * two sessions sharing a warehouse) never drop each other's round
    * tables mid-iteration — and sweeps warehouse dirs orphaned by
    * earlier JVMs. The previous run's surviving final table is NOT
    * reclaimed here: its labels frame may still be lazily unconsumed
    * (`val a = d23(..); val b = d23(..); a.collect()` must work), so
    * in-session reruns accumulate one small final table each until the
    * age-guarded sweep of a later process reclaims them — bounded waste
    * traded for never dropping a table out from under a live reader.
    */
  def freshTableRounds(spark: SparkSession, family: String): TableRounds = {
    val prefix = s"${family}_${java.lang.Long.toHexString(System.nanoTime())}"
    sweepOrphanRoundDirs(spark, family)
    TableRounds(spark, prefix)
  }

  /** Remove round-table DIRECTORIES orphaned by earlier JVMs: the
    * in-memory catalog forgets `<family>_*` tables at process exit while
    * their warehouse dirs survive, so repeated bench/verify processes
    * would otherwise accumulate one final-table dir each. Removal is
    * gated on LIVENESS, not just age: a dir is swept only when it is
    * (a) absent from this session's catalog, (b) untouched for >30 min,
    * AND (c) its prefix's [[LivenessMarker]] heartbeat is absent or
    * equally stale — so a concurrent session mid-way through a
    * genuinely-long round (at 100 TB one star round can exceed 30 min;
    * its dir's own mtime is its CREATION time until files land) is
    * never swept while its ticker keeps the heartbeat fresh. Stale
    * heartbeat files themselves are reclaimed under the same cutoff.
    */
  private def sweepOrphanRoundDirs(spark: SparkSession, family: String): Unit = {
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.getConfString("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(warehouse)) return
    val cutoff = System.currentTimeMillis() - 30L * 60 * 1000
    fs.listStatus(warehouse).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(s"${family}_") && st.getModificationTime < cutoff) {
        if (LivenessMarker.isMarkerName(n)) {
          fs.delete(st.getPath, false) // a dead builder's stale heartbeat
        } else if (!spark.catalog.tableExists(n)) {
          // round tables are <prefix>_0/<prefix>_1 — the heartbeat
          // guards the prefix, covering both alternating tables
          val guarded = new org.apache.hadoop.fs.Path(
            warehouse, n.replaceFirst("_[01]$", ""))
          if (!LivenessMarker.isAlive(fs, guarded, cutoff))
            fs.delete(st.getPath, true)
        }
      }
    }
  }

  /** large-star: for each node u (over the symmetric adjacency), emit
    * (v, min(Γ(u) ∪ u)) for every neighbor v > u. Output stays oriented
    * src > dst. Preserves connectivity; never drops a component member.
    */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("src"), col("dst"))
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("m"))
    sym.join(mins, "src")
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** small-star: input oriented src > dst; for each node u, point u and
    * all its smaller neighbors at m = min of those neighbors. Output stays
    * oriented src > dst.
    */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
    val moved = e.join(mins, "src")
      .where(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
    val self = mins.select(col("src"), col("m").as("dst"))
    moved.unionByName(self)
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** @param nodes one column `id` (numeric); @param edges columns
    * `src`/`dst` in either orientation, duplicates and self-loops allowed.
    * @return one row per node: (`id`, `comp`) with `comp` = min node id
    * reachable from `id` (its own id for isolated nodes).
    *
    * NOTE: unlike ordinary catalog operators this EXECUTES at call time
    * (the convergence loop needs an action per round — inherent to any
    * data-dependent iterative algorithm); callers wanting only the final
    * plan still pay the full fixpoint.
    */
  def run(
      nodes: DataFrame,
      edges: DataFrame,
      maxIters: Int = 50,
      store: RoundStore = CheckpointRounds): DataFrame = store.withLiveness {
    store match { case t: TableRounds => t.reset(); case _ => }
    var e = store.put(
      edges.select(
          greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct(), 0)
    var count = e.count()
    var converged = count == 0L
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = store.put(smallStar(largeStar(e)), iter + 1)
      val nextCount = next.count()
      // equal cardinality + next ⊆ prev ⇒ identical edge sets (both distinct)
      converged = nextCount == count && next.except(e).isEmpty
      e = next
      count = nextCount
      iter += 1
    }
    require(converged,
      s"connected components did not converge within $maxIters rounds " +
        "(two-phase star rounds are O(log² n) — this indicates a bug or " +
        "an absurd maxIters; raise it only with evidence)")
    // the labeling below assumes a STAR fixpoint (each non-root node has
    // exactly one parent edge); a non-star fixpoint would silently emit
    // duplicate label rows — make that contract violation fail loudly.
    // One extra agg job over the final, already-materialized edge set.
    require(e.groupBy(col("src"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
        .filter(col("n") > 1).isEmpty,
      "converged edge set is not a star (a node has multiple parents) — " +
        "labeling would duplicate rows; this indicates a star-round bug")
    // fixpoint is a star per component: every non-root node has exactly
    // one (node, root) edge; roots and isolated nodes label themselves
    nodes.select(col("id"))
      .join(e.select(col("src").as("id"), col("dst").as("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
