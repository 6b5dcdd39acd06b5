package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed all-pairs expansion within equi-key buckets — the scale-safe
  * core of the near-duplicate family (SimHash banding, MinHash LSH buckets,
  * shingle inverted-index joins).
  *
  * Semantics: every unordered pair of distinct rows sharing `keys`, emitted
  * exactly once as struct columns (a, b) with a.`ord` < b.`ord`. Requires
  * (`keys`, `ord`) to be unique per row (near-dup callers use doc_id).
  *
  * Why not `groupBy + collect_list` + in-row expansion: a hot bucket with K
  * rows materializes K structs — and K^2 pair structs — inside ONE row of
  * ONE task; at 100 TB a skewed bucket OOMs that task long before the work
  * itself is infeasible. Why not a plain self-join on `keys`: sort-merge
  * buffers the full matching group and streams all K^2 rows through a
  * single task — spill-safe, but a straggler (AQE skew-split cannot divide
  * a single join key).
  *
  * This operator blocks each bucket into chunks of `chunkSize` rows
  * (ordered by `ord`): the left side keeps its own chunk id, the right side
  * replicates each row down to every chunk id <= its own, and the join runs
  * on (keys, chunk). A K-row bucket spreads its K^2/2 pairs over
  * ~ceil(K/chunkSize)^2/2 independent join groups — task memory AND task
  * time are bounded by chunkSize^2 regardless of skew. Replication costs
  * K^2/(2*chunkSize) extra rows, a factor `chunkSize` cheaper than the pair
  * output those rows produce. Rows in chunk i precede rows in chunk j > i
  * in `ord` order, so the a < b condition is free across chunks and a
  * row_number comparison inside the diagonal.
  *
  * Buckets of size 1 are dropped before the join (they cannot pair), and
  * `maxBucket` optionally drops over-capacity buckets wholesale — the
  * document-frequency cap used by shingle joins, where a key shared by
  * thousands of rows contributes candidate volume but no discrimination.
  */
object BlockedSelfJoin {

  /** The chunk assignment: bucket rows numbered/ counted within their key
    * group, singleton (and over-cap) buckets dropped, chunk id attached.
    * Both window expressions share one WindowExec over one exchange.
    */
  private def chunk(
      df: DataFrame,
      keys: Seq[String],
      ord: String,
      chunkSize: Int,
      maxBucket: Option[Int]): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be positive, got $chunkSize")
    val kcols = keys.map(col)
    val w = Window.partitionBy(kcols: _*).orderBy(col(ord))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__bn", count(lit(1)).over(wAll))
      .filter(col("__bn") >= 2 &&
        maxBucket.map(cap => col("__bn") <= cap).getOrElse(lit(true)))
      .withColumn("__chunk", ((col("__rn") - 1) / chunkSize).cast("int"))
  }

  /** The pair expansion over a MATERIALIZED chunked frame: left keeps its
    * chunk, right replicates down to every chunk <= its own, equi-join on
    * (keys, chunk), a < b via the row numbers.
    */
  private def expand(chunked: DataFrame, keys: Seq[String]): DataFrame = {
    val kcols = keys.map(col)
    val payload = struct(
      chunked.columns.filterNot(_.startsWith("__")).map(col).toSeq: _*)
    val left = chunked.select(
      kcols ++ Seq(col("__chunk").as("__c"), col("__rn").as("__ra"), payload.as("a")): _*)
    val right = chunked.select(
      kcols ++ Seq(explode(sequence(lit(0), col("__chunk"))).as("__c"),
        col("__rn").as("__rb"), payload.as("b")): _*)
    left.join(right, keys :+ "__c")
      .filter(col("__ra") < col("__rb"))
      .select(col("a"), col("b"))
  }

  def pairs(
      df: DataFrame,
      keys: Seq[String],
      ord: String,
      chunkSize: Int,
      maxBucket: Option[Int] = None): DataFrame =
    // lazy local checkpoint: both join sides read ONE materialization of
    // the (often expensive) upstream pipeline + bucket window. Without
    // it AQE plans the two sides as independent stages and recomputes
    // the whole subtree twice (plain ReuseExchange fires only with AQE
    // off). Lazy, so building the DataFrame stays side-effect free; the
    // blocks are reference-counted by the ContextCleaner once the query
    // is gone. Executor-local blocks are NOT fault tolerant — for the
    // long-running production form see [[pairsPersisted]].
    expand(chunk(df, keys, ord, chunkSize, maxBucket).localCheckpoint(false), keys)

  /** Production variant (VERDICT r2 #4): the chunked signature frame is
    * persisted to a catalog table BUCKETED on the bucket keys, and both
    * join sides read it back from durable parquet — executor loss
    * recomputes from storage instead of killing the job, and the
    * signature table is reusable across pipeline runs (incremental dedup
    * re-reads it instead of recomputing every signature).
    *
    * Plan shape on the re-read: HashPartitioning(keys) from the bucketed
    * files satisfies the join's ClusteredDistribution(keys :+ chunk) —
    * same-key rows are co-located by the LAYOUT, so the expansion joins
    * with ZERO exchanges (asserted in BlockedSelfJoinSpec); only the
    * per-task merge sort on (keys, chunk) remains. Two session confs
    * gate this plan (both conservative defaults, not correctness):
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` (the
    * disable-heuristic doesn't recognize superset-key joins as
    * interesting) and `spark.sql.requireAllClusterKeysForCoPartition=
    * false` (co-partitioning on the bucket-key SUBSET is the point —
    * chunk exists only to split buckets already co-located by key).
    */
  def pairsPersisted(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      keys: Seq[String],
      ord: String,
      chunkSize: Int,
      table: String,
      numBuckets: Int = 8,
      maxBucket: Option[Int] = None): DataFrame = {
    ReplicaTable.dropTableAndLocation(spark, table)
    persistChunked(df, keys, ord, chunkSize, table, numBuckets, maxBucket)
    expandPairs(spark.table(table), keys)
  }

  /** Write half of [[pairsPersisted]]: chunk and save to `table`,
    * bucketed+sorted on the bucket keys. Exposed separately so callers
    * with a reuse policy (fingerprint-scoped names via
    * [[PersistedIndex.ensure]]) can skip the write when the table is
    * already built.
    */
  def persistChunked(
      df: DataFrame,
      keys: Seq[String],
      ord: String,
      chunkSize: Int,
      table: String,
      numBuckets: Int = 8,
      maxBucket: Option[Int] = None): Unit =
    chunk(df, keys, ord, chunkSize, maxBucket)
      // bucket-aligned layout: repartition by the bucket keys into
      // exactly numBuckets partitions (HashPartitioning and the bucket
      // spec share the Murmur3-pmod formula), so each write task holds
      // ONE bucket and the table is numBuckets files — an unaligned
      // bucketed write emits (input partitions × buckets) files, and
      // the resulting thousands of tiny files dominated every re-read
      // (guide §6 small-files; measured on the k-gram index,
      // OPTIMIZATION_r14.md)
      .repartition(numBuckets, keys.map(col): _*)
      .write.format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Read half of [[pairsPersisted]]: the pair expansion over a chunked
    * frame read back from a bucketed table.
    */
  def expandPairs(chunked: DataFrame, keys: Seq[String]): DataFrame =
    expand(chunked, keys)
}
