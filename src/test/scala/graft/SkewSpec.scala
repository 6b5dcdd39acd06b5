package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-TASK skew gate (VERDICT r13 #1): every volume gate in
  * [[ScalingSpec]] measures TOTAL exchange rows, and every scaling
  * corpus so far is uniform — so a hot-bucket quadratic is invisible to
  * all of them: total volume stays linear while ONE task eats a hot
  * key's K² candidate pairs and straggles (or OOMs) the stage. Real
  * 100 TB corpora are Zipf in source and in near-dup cluster size; this
  * gate runs the pair/cluster/agg families on
  * [[ScalingCorpus.ensureSkewed]] (one source owning ~30% of docs, one
  * exact-text near-dup cluster of ~1%) and gates the MAX SHUFFLE-READ
  * ROWS OF ANY SINGLE TASK — the axis a hot key actually shows on.
  *
  * The gate is COMPARATIVE: each query runs on the skewed corpus AND on
  * the uniform corpus of the SAME size, and skew's per-task max must
  * stay within a small documented multiple of uniform's. Two reasons,
  * both learned from this spec's own first run:
  *  - absolute per-task rows at n=20k are dominated by REGIME, not
  *    skew (d5's df-cap transitional window peaks pair volume near this
  *    n on ANY corpus — the uniform baseline nets that out);
  *  - the comparative form survives Spark/AQE/partitioning changes the
  *    way the retrieval gate's slope form does, where absolutes broke.
  * A true hot-bucket quadratic fails it hard: the planted 200-doc
  * cluster would push ~K² ≈ 40,000 rows (or at d7's 6-band expansion,
  * 6× that) through ONE task that the uniform corpus doesn't have.
  *
  * Why each family is expected to pass (the designs under test):
  *  - d1's exact-dedup groupBy collapses the hot text map-side
  *    (partial aggregation): the 200-doc cluster crosses the wire as
  *    one partial row per map task, not 200 rows to one reducer.
  *  - d5's document-frequency cap (D5MaxShingleDf) DROPS the cluster's
  *    shingles outright (df = 200 > 50) — hot-key work is bounded by
  *    refusing undiscriminating keys, the inverted-index answer.
  *  - d6/d7's bucket expansions run through
  *    [[graft.operators.BlockedSelfJoin]]: the hot bucket is
  *    chunk-blocked, so its K² pairs spread over ~(K/chunk)²
  *    independent join groups instead of one sort-merge group in one
  *    task. THIS measurement is what makes the Salting-operator
  *    disposition honest: the pair family's hot-key answer is
  *    blocking, not salting.
  *  - d12 feeds the hot cluster's pairs into the star-round CC, whose
  *    per-round exchanges hash on node id — a K-doc cluster is K
  *    near-uniform ids, not one hot key.
  *  - d14's top-K-per-source window compiles to WindowGroupLimit: each
  *    map task pre-prunes to its local top-K before the shuffle on
  *    `source`, so the hot source lands as O(K × map-partitions) rows
  *    on its reducer, never its 30% of the corpus.
  *
  * Measurement confs: shuffle partitions are raised to 32 (at the
  * suite default of 4, unrelated keys hash-pile onto the hot task and
  * blur attribution) and AQE partition COALESCING is disabled — at
  * this corpus size AQE otherwise legitimately merges a whole small
  * stage into one task, which reads as maximal "skew" while being
  * exactly the thing AQE would NOT do at 100 TB bin sizes. Skew-join
  * handling itself stays on, as in production sessions.
  */
class SkewSpec extends SparkSpec {

  /** Max over all tasks of shuffle-READ records across `run`'s jobs,
    * plus the owning stage's (total, nTasks) for the logged skew ratio.
    */
  private def maxTaskRead(run: => Unit): (Long, Long, Int) = {
    final case class Acc(var max: Long, var sum: Long, var n: Int)
    val perStage = new ConcurrentHashMap[Integer, Acc]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && t.taskInfo != null && t.taskInfo.successful) {
          val rows = m.shuffleReadMetrics.recordsRead
          perStage.compute(t.stageId, (_, prev) => {
            val a = if (prev == null) Acc(0L, 0L, 0) else prev
            a.max = math.max(a.max, rows); a.sum += rows; a.n += 1; a
          })
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      run
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    perStage.values.asScala.map(a => (a.max, a.sum, a.n))
      .maxByOption(_._1).getOrElse((0L, 0L, 0))
  }

  /** (query, skew-vs-uniform max-task budget). 1.0 = the hot keys add
    * nothing to the worst task. Budgets pin the measured regime with
    * headroom; the planted cluster's unblocked quadratic (≥ 40,000
    * extra rows in one task, ≥ 10× uniform's worst task for most of
    * these) trips every one of them. The +floor below absorbs
    * integer-small worst tasks.
    */
  private val budgets: Seq[(String, Double)] = Seq(
    ("d1_exact_dedup", 2.0),
    ("d5_ngram_jaccard", 2.0),
    ("d6_minhash_lsh", 2.0),
    ("d7_simhash", 2.0),
    ("d12_dup_clusters", 2.0),
    ("d14_source_quota", 2.0))

  /** Max over all tasks of shuffle-WRITE records — the axis a hot
    * bucket shows on in a PLAIN self-join, where the quadratic is the
    * join task's OUTPUT (its input is just the bucket's rows): one
    * sort-merge group computes and emits all K² pairs from one task,
    * which the read-side metric above cannot see.
    */
  private def maxTaskWrite(run: => Unit): (Long, Long, Int) = {
    final case class Acc(var max: Long, var sum: Long, var n: Int)
    val perStage = new ConcurrentHashMap[Integer, Acc]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && t.taskInfo != null && t.taskInfo.successful) {
          val rows = m.shuffleWriteMetrics.recordsWritten
          perStage.compute(t.stageId, (_, prev) => {
            val a = if (prev == null) Acc(0L, 0L, 0) else prev
            a.max = math.max(a.max, rows); a.sum += rows; a.n += 1; a
          })
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      run
      org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    perStage.values.asScala.map(a => (a.max, a.sum, a.n))
      .maxByOption(_._1).getOrElse((0L, 0L, 0))
  }

  test("skewed embeddings: v5's hot bucket does not funnel its pairs through one task") {
    // the vector family's textbook hot-bucket n²: ~1% of vectors are
    // one IDENTICAL vector -> with the planted clones, a single LSH
    // bucket holds ~2n/100 rows whose ~K²/2 result pairs are all real
    // output (cosine ≈ 1). A PLAIN bucket self-join computes them in
    // ONE sort-merge group in one task — the quadratic straggler this
    // gate exists to catch
    val n = 20000L
    val skewDir = ScalingCorpus.ensureSkewedEmbeddings(spark, n)
    val unifDir = ScalingCorpus.ensureEmbeddings(spark, n)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce =
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val fn = SparkEntry.queries("v5_embedding_neardup")
      val Seq((maxU, totU, nU), (maxS, totS, nS)) =
        Seq(unifDir, skewDir).map { d =>
          maxTaskWrite {
            fn(spark, d).write.format("noop").mode("overwrite").save()
          }
        }
      info(f"v5: worst task write uniform $maxU rows (stage total $totU / $nU tasks)" +
        f" vs skew $maxS rows (stage total $totS / $nS tasks)")
      // budget 6×: the hot bucket's ~K²/2 ≈ 80k pairs are REAL OUTPUT
      // and must be produced by someone — the gate demands they not all
      // come from ONE task
      assert(maxS <= 6 * maxU + 2000,
        f"v5: the skewed corpus's worst task wrote $maxS rows vs uniform's " +
          f"$maxU — the hot bucket's quadratic is running through a single " +
          "task (the plain-self-join straggler shape)")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("skewed corpus: no task's shuffle-read outgrows the uniform corpus's worst task") {
    val n = 20000L
    val skewDir = ScalingCorpus.ensureSkewed(spark, n)
    val unifDir = ScalingCorpus.ensure(spark, n)
    val confs = Seq("graft.neardup.persistPairs", "graft.substring.persistIndex")
    val prev = confs.map(k => k -> spark.conf.getOption(k))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce =
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    confs.foreach(spark.conf.set(_, "false"))
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val floor = 2000L
      val failures = budgets.flatMap { case (name, budget) =>
        val fn = SparkEntry.queries(name)
        val Seq((maxU, totU, nU), (maxS, totS, nS)) =
          Seq(unifDir, skewDir).map { d =>
            maxTaskRead {
              fn(spark, d).write.format("noop").mode("overwrite").save()
            }
          }
        info(f"$name: worst task uniform $maxU rows (stage total $totU / $nU tasks)" +
          f" vs skew $maxS rows (stage total $totS / $nS tasks," +
          f" skew ratio ${maxS.toDouble / math.max(totS / math.max(nS, 1), 1)}%.1f)")
        if (maxS <= budget * maxU + floor) Nil
        else Seq(f"$name: the skewed corpus's worst task read $maxS rows vs " +
          f"uniform's $maxU (allowed <= ${budget * maxU + floor}%.0f) — a hot " +
          "key is funneling into a single task (the straggler/OOM shape " +
          "total-volume gates cannot see)")
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally {
      prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }
}
