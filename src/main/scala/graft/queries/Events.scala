package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Windowed event analytics: tumbling, sliding, and session windows over
  * the `events` stream table, plus JSON payload extraction — the added
  * streaming-analytics surface (SURVEY §2.10 "Windows"). Batch forms here
  * (oracle-checkable); the same expressions run under Structured Streaming
  * with `withWatermark` (see graft.streaming.CdcStream.windowedCounts and
  * the watermark test in CdcStreamSpec).
  */
object Events {

  type Q = (SparkSession, String) => DataFrame

  private def dsum(c: Column, scale: Int = 2): Column =
    Relational.dsum(c, scale)

  /** Tumbling 1-hour windows per event type. */
  def w1Tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  val w1Sql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Sliding windows: 1 hour long, every 30 minutes (each event lands in
    * two windows).
    */
  def w2Sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("n"), col("total_value"))
      .orderBy(col("window_start"))

  val w2Sql: String =
    """SELECT ws AS window_start, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
      |                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) ws, ts, value
      |      FROM events)
      |WHERE ts >= ws AND ts < ws + INTERVAL '60 minutes'
      |GROUP BY ws ORDER BY window_start""".stripMargin

  /** Session windows: 4-hour inactivity gap per user. Spark's
    * `session_window` merges events whose gap is AT MOST the gap
    * duration — boundary-INCLUSIVE, measured directly (StreamingOpsSpec
    * drives an exact-gap pair into one merged session; this scaladoc
    * previously claimed "strictly less", which only looked right
    * because micro-timestamp fixtures never produce exact-boundary
    * gaps). The oracle's gaps-and-islands breaks at `>` to match.
    */
  def w3Session(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))

  val w3Sql: String =
    """WITH s AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w > INTERVAL '4 hours' THEN 1 ELSE 0 END brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |i AS (SELECT user_id, ts, value,
      |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS UNBOUNDED PRECEDING) island
      |      FROM s)
      |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM i GROUP BY user_id, island
      |ORDER BY user_id, session_start""".stripMargin

  /** JSON payload extraction + aggregation (the schema-on-read path the
    * reference handles via decode_json, transformer.py:44-45).
    */
  def w4JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val w4Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** As-of join — each purchase matched to the user's most recent prior
    * (or simultaneous) click. Implemented WITHOUT a join: both sides
    * union into one stream and a running `last(click_ts)` window carries
    * the build side forward — one shuffle on the key, no per-row probe,
    * no range-join blowup. This is the scale-preferred form of as-of on
    * Spark: a join-based formulation re-buffers the build side per probe
    * row, while the union-window is a single sort per user. The fixture
    * has no (user_id, ts) ties, and the build side sorts BEFORE the probe
    * side at equal timestamps, matching DuckDB's inclusive `ASOF LEFT
    * JOIN ... ON a.ts >= b.ts`.
    */
  def w5AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val probe = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id").as("tie"))
    val build = ev.filter(col("event_type") === "click")
      .select(lit(null).cast("long").as("event_id"), col("user_id"),
        col("ts"), lit(0).as("side"), col("event_id").as("tie"))
    // final `tie` key: on real data two clicks CAN share (user_id, ts);
    // without a total order the carried build row would be
    // nondeterministic (harmless here where only ts is carried, but this
    // operator is the general as-of form — keep it deterministic)
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    probe.unionByName(build)
      .withColumn("click_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts")))
          .cast("double").divide(1e6).as("gap_sec"))
      .orderBy(col("event_id"))
  }

  val w5Sql: String =
    """SELECT a.event_id, a.user_id, a.ts AS purchase_ts, b.ts AS click_ts,
      |  CAST(epoch_us(a.ts) - epoch_us(b.ts) AS DOUBLE) / 1e6 AS gap_sec
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') a
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      |  ON a.user_id = b.user_id AND a.ts >= b.ts
      |ORDER BY a.event_id""".stripMargin

  /** Range join, window-frame form: per event, the same user's activity in
    * the strictly-preceding hour. The naive formulation is a self-join on
    * `user_id` with a `b.ts IN [a.ts-1h, a.ts)` residual — quadratic in
    * events-per-user-hour; when the range condition is anchored to the
    * row's own ordering column, a RANGE window frame computes it in one
    * sort per user with zero join. Frame bounds are in microseconds (the
    * fixture's native tick), end bound -1us = strictly before.
    */
  def w6RangeActivity(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, -1L)
    Tables.load(spark, dir, "events")
      .withColumn("n_prev_hour", count(lit(1)).over(w))
      .withColumn("value_prev_hour",
        coalesce(sum(col("value").cast(DecimalType(18, 2))).over(w),
          lit(0).cast(DecimalType(18, 2))).cast("double"))
      .select(col("event_id"), col("user_id"), col("n_prev_hour"),
        col("value_prev_hour"))
      .orderBy(col("event_id"))
  }

  val w6Sql: String =
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_prev_hour,
      |  CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))) OVER w,
      |       CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS value_prev_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
      |ORDER BY event_id""".stripMargin

  /** Hash-sampling distinct-count sketch (theta-sketch mechanics, made
    * deterministic): count the distinct users whose md5 falls in the
    * lowest 1/8 of hash space, scale by 8. At 100 TB this replaces a full
    * `COUNT(DISTINCT)` with a distinct-aggregation over an 8x-smaller,
    * hash-uniform subset — bounded memory, one shuffle, and mergeable
    * across partitions/days by construction (the sample is a pure
    * predicate of the value). The exact count rides along here only so
    * the oracle exposes the estimate's error.
    */
  def w7DistinctSketch(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.HashFunctions.md5NumberBigEndian(
      col("user_id").cast("string"))
    Tables.load(spark, dir, "events")
      .withColumn("in_sample", h >= 0 && h < (1L << 61))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_distinct"),
        countDistinct(when(col("in_sample"), col("user_id"))).as("n_sampled"))
      .withColumn("estimate", col("n_sampled") * 8)
      .orderBy(col("event_type"))
  }

  val w7Sql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS exact_distinct,
      |  COUNT(DISTINCT CASE WHEN CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 17, 16) AS UBIGINT)
      |        < 2305843009213693952 THEN user_id END) AS n_sampled,
      |  COUNT(DISTINCT CASE WHEN CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 17, 16) AS UBIGINT)
      |        < 2305843009213693952 THEN user_id END) * 8 AS estimate
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Quantile sketch by deterministic hash-sampling — w7's mechanics
    * pointed at ORDER statistics: exact percentiles over a 100 TB group
    * force the aggregator to hold every distinct value per group, while
    * a Bernoulli sample on the ROW key (md5 of event_id, lowest 1/8 of
    * hash space) is a pure predicate — mergeable, bounded-memory, 8x
    * less aggregation state — whose order statistics converge to the
    * population's. Both engines compute the sample identically, so the
    * sketch quantiles (and therefore the in-query error vs the exact
    * percentiles, the number a user actually wants) hash-match
    * bit-for-bit; interpolation parity is q24's p*(n-1) contract.
    */
  def w12QuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.HashFunctions.md5NumberBigEndian(
      col("event_id").cast("string"))
    Tables.load(spark, dir, "events")
      .withColumn("sv", when(h >= 0 && h < (1L << 61), col("value")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(col("sv")).as("n_sampled"),
        percentile(col("value"), lit(0.5)).as("p50_exact"),
        percentile(col("value"), lit(0.95)).as("p95_exact"),
        percentile(col("sv"), lit(0.5)).as("p50_sketch"),
        percentile(col("sv"), lit(0.95)).as("p95_sketch"))
      .withColumn("p50_err", col("p50_sketch") - col("p50_exact"))
      .withColumn("p95_err", col("p95_sketch") - col("p95_exact"))
      .orderBy(col("event_type"))
  }

  val w12Sql: String = {
    val inSample =
      """CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 17, 16) AS UBIGINT)
        |      < 2305843009213693952""".stripMargin
    s"""WITH s AS (SELECT event_type, value,
      |  CASE WHEN $inSample THEN value END AS sv FROM events)
      |SELECT event_type, COUNT(*) AS n, COUNT(sv) AS n_sampled,
      |  quantile_cont(value, 0.5) AS p50_exact,
      |  quantile_cont(value, 0.95) AS p95_exact,
      |  quantile_cont(sv, 0.5) AS p50_sketch,
      |  quantile_cont(sv, 0.95) AS p95_sketch,
      |  quantile_cont(sv, 0.5) - quantile_cont(value, 0.5) AS p50_err,
      |  quantile_cont(sv, 0.95) - quantile_cont(value, 0.95) AS p95_err
      |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** PIVOT: one row per day, one column per event type. Pivot values are
    * passed EXPLICITLY — omitting them makes Spark run a distinct-values
    * job over the whole table before it can even plan, and yields a
    * data-dependent schema no downstream contract can rely on. With fixed
    * values this compiles to one conditional hash aggregation (a single
    * shuffle on day), same as the oracle's COUNT(*) FILTER form.
    */
  def w8PivotDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .select(col("day") +:
        Seq("click", "error", "purchase", "signup", "view")
          .map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("day"))

  val w8Sql: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** Per-fixture cache of the date-partitioned events materialization:
    * the layout is the point of w9; rewriting it on every call would time
    * the WRITE, not the pruned read (bench runs each query 2-3x per JVM).
    * Keyed by the fixture's recursive (path, length, mtime) FINGERPRINT
    * (w29's discipline, [[graft.operators.PersistedIndex
    * .sourceFingerprint]]), never the dir alone — a fixture regenerated
    * in-place mid-JVM must be re-partitioned, not served stale (r12
    * review). A superseded entry leaves the cache immediately but its
    * files stay readable until JVM exit (in-flight readers of the
    * prior copy must never hit vanished files); every copy is
    * registered for JVM-exit deletion, so repeated bench/test JVMs
    * stop accumulating /tmp duplicates of events.
    */
  private val partitionedCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** ONE JVM-exit cleanup hook draining a concurrent list of tmp roots
    * — w9 previously registered a fresh shutdown hook per cache
    * generation, so an in-JVM fixture-regeneration loop accumulated an
    * unbounded number of hook threads, each pinning its tmp path, and
    * superseded generations' hooks were never removed (ADVICE r12).
    * Registration stays lazy (first generation installs the hook) so
    * JVMs that never run w9 never pay it. */
  private val exitCleanupRoots =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val exitCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitCleanupRoots.forEach(deleteTree(_))))

  private def deleteOnExit(root: java.nio.file.Path): Unit = {
    exitCleanupHook
    exitCleanupRoots.add(root)
  }

  /** THE recursive temp-tree delete for this file (w9's cache exits,
    * w29's spool/checkpoints): exists-guarded for idempotent shutdown
    * hooks, and the Files.walk stream is CLOSED — an unclosed walk
    * holds an OS directory handle (the leak w29's original helper was
    * written to avoid; r12 session-diff review merged the two copies).
    */
  private def deleteTree(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }

  /** Date-partitioned events storage + pruned read (VERDICT r2 #8).
    * `ts` is DERIVED (nanos→micros conversion in [[graft.Tables.load]]),
    * so no time predicate can ever reach the raw scan as a pushed filter
    * — at 100 TB the answer is layout, not pushdown: partition on the
    * date and let planning-time pruning skip 23 of 30 day-directories
    * before any file is opened. PlanAuditSpec asserts the plan prunes via
    * PartitionFilters (file-skipping, not row-skipping).
    */
  def w9PartitionPruned(spark: SparkSession, dir: String): DataFrame = {
    val key = s"$dir|" + graft.operators.PersistedIndex.sourceFingerprint(
      spark, Seq(s"$dir/events.parquet"))
    // never mutate the map inside computeIfAbsent's mapping function
    // (ConcurrentHashMap forbids it) — double-checked build under the
    // map's own monitor instead. Superseded generations are DROPPED
    // from the map but their files stay until JVM exit (the shutdown
    // hook): a concurrent reader mid-scan of the prior copy must not
    // die with a vanished-file error (the PersistedIndex retention
    // discipline; r12 session-diff review) — the leak is bounded by
    // in-JVM regenerations of one fixture, which is rare and tiny next
    // to never reclaiming at all.
    val store = Option(partitionedCache.get(key)).getOrElse {
      // per-DIR lock (shared with w29's memo): a single global monitor
      // made unrelated fixtures' builds serialize — the sf0.001 smoke
      // suite blocking on sf0.01's full repartition+write despite
      // touching a disjoint key
      profileLocks.computeIfAbsent(dir, _ => new Object).synchronized {
        Option(partitionedCache.get(key)).getOrElse {
          partitionedCache.keySet().removeIf(_.startsWith(s"$dir|"))
          val tmp = java.nio.file.Files.createTempDirectory("events_by_day")
          deleteOnExit(tmp)
          val out = tmp.resolve("events").toString
          graft.operators.SnapshotStore.writePartitioned(
            spark,
            Tables.load(spark, dir, "events")
              .withColumn("event_date", to_date(col("ts"))),
            out, Seq("event_date"))
          partitionedCache.put(key, out)
          out
        }
      }
    }
    spark.read.parquet(store)
      .filter(col("event_date").between(lit("2024-01-08"), lit("2024-01-14")))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("event_date"), col("event_type"))
  }

  val w9Sql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
      |GROUP BY 1, 2 ORDER BY event_date, event_type""".stripMargin

  /** w10 interval length — also the bucket width, see [[w10IntervalJoin]]. */
  private val W10IntervalUs: Long = 30L * 60 * 1000000

  /** General interval join via temporal bucketing. Each user's activity
    * interval is [first event, first event + 30 min); count every event
    * (from ANY user) falling inside each interval.
    *
    * Spark has no native interval-join operator: the raw predicate
    * `s <= ts AND ts < e` plans as a BroadcastNestedLoopJoin — O(|iv|*|ev|)
    * work with a driver-built build side, the classic range-join
    * scale-killer (and w6's RANGE-frame trick only applies when the range
    * is anchored to the probe row's own ordering column). The generic
    * scale path is bucket decomposition: quantize time into buckets as
    * wide as the MAXIMUM interval length. An interval then overlaps at
    * most 2 consecutive buckets (a bounded explode); a point lives in
    * exactly 1, so the bucket equi-join + residual range filter is exact
    * and duplicate-free by construction (the point side is never
    * replicated — no post-join distinct). Both sides can be arbitrarily
    * large: no broadcast, no BNLJ, one hash shuffle each on a key whose
    * fan-out is bounded by 2. Variable-length intervals change only the
    * sequence() bound (ceil(len/B)+1 buckets).
    */
  def w10IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val b = W10IntervalUs // bucket width = max interval length
    val ev = Tables.load(spark, dir, "events")
    val iv = ev.groupBy(col("user_id").as("owner"))
      .agg(min(unix_micros(col("ts"))).as("s_us"))
      .withColumn("e_us", col("s_us") + b)
      .withColumn("bkt",
        explode(sequence(floor(col("s_us") / b).cast("long"),
          floor((col("e_us") - 1) / b).cast("long"))))
    val pts = ev.select(unix_micros(col("ts")).as("ts_us"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      .withColumn("bkt", floor(col("ts_us") / b).cast("long"))
    iv.join(pts,
        iv("bkt") === pts("bkt") &&
          pts("ts_us") >= iv("s_us") && pts("ts_us") < iv("e_us"))
      .groupBy(col("owner"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("total_value"))
      .orderBy(col("owner"))
  }

  val w10Sql: String =
    """WITH iv AS (SELECT user_id AS owner, MIN(ts) AS s,
      |              MIN(ts) + INTERVAL 30 MINUTE AS e
      |            FROM events GROUP BY user_id)
      |SELECT owner, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM iv JOIN events ev ON ev.ts >= iv.s AND ev.ts < iv.e
      |GROUP BY owner ORDER BY owner""".stripMargin

  /** Count-min sketch geometry: depth 4 independent hash lanes over a
    * width that divides 2^64, so the unsigned low bits of the md5 agree
    * with `pmod` of the signed view — both engines bucket identically.
    */
  private val CmDepth = 4
  private val CmWidth = 256L

  /** `user_id`'s bucket in salted lane `j` — the ONE hash definition
    * both CMS queries (w11's top-k report, w18's fixed-candidate
    * variant) derive from; only the salt prefix distinguishes their
    * sketches ("cm" vs "cms:"), so the geometry/arithmetic can never
    * drift between them.
    */
  private def cmBucket(saltPrefix: String, j: Int): org.apache.spark.sql.Column =
    pmod(graft.functions.HashFunctions.md5NumberBigEndian(
      concat(lit(s"$saltPrefix$j:"), col("user_id").cast("string"))), lit(CmWidth))

  /** All [[CmDepth]] (lane, bucket) pairs of `user_id` as a posexplode. */
  private def cmLanes(saltPrefix: String): org.apache.spark.sql.Column =
    posexplode(array((0 until CmDepth).map(cmBucket(saltPrefix, _)): _*))

  private def cmHash(j: Int): org.apache.spark.sql.Column = cmBucket("cm", j)

  /** w11: heavy hitters via a count-min sketch — the frequency twin of
    * w7's distinct sketch. The sketch is depth x width = 1024 counters:
    * constant-size, mergeable (map-side partial combine does the merge),
    * and the ONLY thing that must survive the scan at 100 TB — per-key
    * exact counts exist here solely so the oracle sees the estimate's
    * error in the result (CM never underestimates; `overestimate` >= 0
    * is the sketch's defining invariant, measured per key).
    *
    * Physical shape: one scan builds the sketch (posexplode to (lane,
    * bucket), one hash agg with partial combine); candidate estimation
    * joins the 1024-row sketch BROADCAST against the per-key lanes; the
    * global top-20 compiles to TakeOrderedAndProject (no full sort, no
    * single-partition global window) with the rank window running over
    * the 20 surviving rows only.
    */
  def w11HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events").select(col("user_id"))
    val lanes = cmLanes("cm")
    val sketch = ev.select(lanes).toDF("j", "c")
      .groupBy(col("j"), col("c")).agg(count(lit(1)).as("cnt"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_count"))
    val top = exact
      .select(col("user_id"), col("exact_count"), lanes)
      .toDF("user_id", "exact_count", "j", "c")
      .join(broadcast(sketch), Seq("j", "c"))
      .groupBy(col("user_id"), col("exact_count"))
      .agg(min(col("cnt")).as("cm_est"))
      .orderBy(col("cm_est").desc, col("user_id"))
      .limit(20)
    top
      .withColumn("rank", row_number().over(
        Window
          .orderBy(col("cm_est").desc, col("user_id"))).cast("long"))
      .select(col("rank"), col("user_id"), col("cm_est"),
        col("exact_count"), (col("cm_est") - col("exact_count")).as("overestimate"))
      .orderBy(col("rank"))
  }

  val w11Sql: String =
    s"""WITH h AS (
      |  SELECT user_id, j,
      |    CAST('0x' || substring(md5('cm' || j || ':' || CAST(user_id AS VARCHAR)), 17, 16)
      |      AS UBIGINT) % $CmWidth AS c
      |  FROM events, (SELECT unnest(generate_series(0, ${CmDepth - 1})) j)),
      |sketch AS (SELECT j, c, COUNT(*) AS cnt FROM h GROUP BY j, c),
      |keyh AS (SELECT DISTINCT user_id, j, c FROM h),
      |exact AS (SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id),
      |est AS (
      |  SELECT k.user_id, MIN(s.cnt) AS cm_est
      |  FROM keyh k JOIN sketch s USING (j, c) GROUP BY k.user_id),
      |ranked AS (
      |  SELECT e.user_id, est.cm_est, e.exact_count,
      |    ROW_NUMBER() OVER (ORDER BY est.cm_est DESC, e.user_id) AS rank
      |  FROM est JOIN exact e USING (user_id))
      |SELECT rank, user_id, cm_est, exact_count,
      |  cm_est - exact_count AS overestimate
      |FROM ranked WHERE rank <= 20 ORDER BY rank""".stripMargin

  /** w13: ordered-funnel analysis — per user, the earliest strictly-
    * increasing view → click → purchase chain: t1 = first view, t2 =
    * first click AFTER t1, t3 = first purchase AFTER t2. The greedy
    * earliest chain is the standard funnel semantics (ClickHouse
    * `windowFunnel`, Amplitude-style) and — unlike "any subsequence
    * exists" — each step time is a pure function of the event SET
    * (min over a filtered set), so the result is deterministic under
    * any partitioning, arrival order, or timestamp ties.
    *
    * Physical shape: NO self-joins (the naive funnel is a 3-way
    * self-join on user_id) — three stacked window minima over the SAME
    * user partitioning collapse into one exchange + one per-user sort;
    * the per-user rollup rides the same partitioning. At 100 TB this is
    * one shuffle of (user, type, ts) triples, nothing else.
    */
  /** The shared funnel computation (per-user earliest strictly-
    * increasing stage times) w13 reports and w25 bands — one
    * definition so the chaining rule can never drift between them.
    */
  private def funnelTimes(spark: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    val us = unix_micros(col("ts"))
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), us.as("us"))
      .withColumn("t1_us",
        min(when(col("event_type") === "view", col("us"))).over(wu))
      .withColumn("t2_us",
        min(when(col("event_type") === "click" && col("us") > col("t1_us"),
          col("us"))).over(wu))
      .withColumn("t3_us",
        min(when(col("event_type") === "purchase" && col("us") > col("t2_us"),
          col("us"))).over(wu))
      .groupBy(col("user_id"))
      .agg(max(col("t1_us")).as("t1_us"), max(col("t2_us")).as("t2_us"),
        max(col("t3_us")).as("t3_us"))
  }

  def w13Funnel(spark: SparkSession, dir: String): DataFrame = {
    funnelTimes(spark, dir)
      .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
        when(col("t3_us").isNotNull, 3L)
          .when(col("t2_us").isNotNull, 2L)
          .when(col("t1_us").isNotNull, 1L)
          .otherwise(0L).as("steps_reached"))
      .orderBy(col("user_id"))
  }

  /** The oracle-side funnel-stage CTE chain (l1/l2/l3), shared VERBATIM
    * by w13's and w25's oracles — one definition so the oracle chaining
    * rule can never drift between the funnel and its latency audit, the
    * same factoring [[funnelTimes]] gives the Spark side (and
    * Pipeline's `bm25CtesSql` gives the retrieval oracles). w29's
    * profile oracle restates the chain under its own `ev` CTE with
    * profile-local names; the correctness gate pins all three to the
    * same semantics.
    */
  private val funnelCtesSql: String =
    """l1 AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us,
      |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
      |      OVER (PARTITION BY user_id) AS t1_us
      |  FROM events),
      |l2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1_us THEN us END)
      |    OVER (PARTITION BY user_id) AS t2_us
      |  FROM l1),
      |l3 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2_us THEN us END)
      |    OVER (PARTITION BY user_id) AS t3_us
      |  FROM l2)""".stripMargin

  val w13Sql: String =
    s"""WITH $funnelCtesSql
      |SELECT user_id, MAX(t1_us) AS t1_us, MAX(t2_us) AS t2_us,
      |  MAX(t3_us) AS t3_us,
      |  CAST(CASE WHEN MAX(t3_us) IS NOT NULL THEN 3
      |            WHEN MAX(t2_us) IS NOT NULL THEN 2
      |            WHEN MAX(t1_us) IS NOT NULL THEN 1
      |            ELSE 0 END AS BIGINT) AS steps_reached
      |FROM l3 GROUP BY user_id ORDER BY user_id""".stripMargin

  /** w14: cohort retention — users grouped by their first active day
    * (the cohort), then for every later active day the cohort's surviving
    * distinct-user count and its rate vs the cohort's own day-0 size.
    * The other half of the product-analytics pair next to w13's funnel.
    *
    * Physical shape: the (user, day) activity grid is DISTINCT'd FIRST
    * (shrinks events to at most users x days before anything else), the
    * per-user cohort day is a window min over that grid, the rollup is
    * one hash agg, and the day-0 denominator arrives via a window over
    * the (tiny) cohort x offset result — no join back, no second scan.
    */
  def w14Retention(spark: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    val wc = Window
      .partitionBy(col("cohort_day")).orderBy(col("day_offset"))
    Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("cohort_day", min(col("day")).over(wu))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users")) // (user, day) is unique per row
      .withColumn("retention",
        col("n_users").cast("double") / first(col("n_users")).over(wc))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val w14Sql: String =
    """WITH grid AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, day,
      |        MIN(day) OVER (PARTITION BY user_id) AS cohort_day
      |      FROM grid),
      |r AS (SELECT cohort_day, day - cohort_day AS day_offset,
      |        COUNT(*) AS n_users
      |      FROM c GROUP BY 1, 2)
      |SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset, n_users,
      |  CAST(n_users AS DOUBLE) / FIRST_VALUE(n_users) OVER (
      |    PARTITION BY cohort_day ORDER BY day_offset) AS retention
      |FROM r ORDER BY cohort_day, day_offset""".stripMargin

  /** w30: BITMAP RETENTION — w14's cohort × offset matrix re-derived
    * from per-user activity BITMASKS, the roaring-bitmap/Theta-sketch
    * representation every large-scale product-analytics store (Druid,
    * Pinot, ClickHouse's groupBitmap) keeps user activity in. One
    * 64-bit word per user encodes the whole horizon: bit d set = active
    * on day d after the corpus' first day (the horizon cap is the
    * analysis window, as in any "N-day retention" report — days past
    * the horizon fall outside the report by definition; a longer
    * horizon is a word ARRAY with identical algebra, merged per-word).
    * The horizon is 63 days (bits 0..62), deliberately NOT 64: bit 63
    * is the sign bit, where DuckDB's `1::BIGINT << 63` raises an
    * overflow error and Spark's ANSI unary minus in the trailing-zero
    * count throws on Long.MinValue (r12 review) — the word's top bit
    * is simply not part of the encoding.
    *
    * Why it exists next to w14: the grid formulation DISTINCTs the
    * (user, day) frame — a corpus-wide shuffle whose width is the
    * activity grid — then windows over users. Here the raw events
    * collapse map-side into one BIGINT accumulator per user (bit_or is
    * associative/commutative, so the partial agg does almost all the
    * work before the only corpus-keyed exchange), and EVERYTHING after
    * operates on a |users|-row frame: cohort day = trailing-zero count
    * (bit_count((mask & -mask) - 1)), active-day count = popcount,
    * set-bit expansion to the cohort × offset rollup. Same analysis,
    * one corpus shuffle of |users| 64-bit words instead of a
    * users × days grid — the TrainingOps spec pins w30 ≡ w14 on the
    * shared (cohort, offset, n_users) triples.
    *
    * Output per (cohort_day, day_offset): surviving user count,
    * retention vs day 0 in ppm, and the cohort's mean active-day
    * popcount in ppm — integer DIV throughout, so both engines agree
    * bitwise.
    */
  def w30BitmapRetention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val epoch = days.agg(min(col("day")).as("epoch0"))
    val masks = days.join(broadcast(epoch))
      .select(col("user_id"), col("epoch0"),
        datediff(col("day"), col("epoch0")).as("d"))
      .filter(col("d").between(0, 62))
      .groupBy(col("user_id"), col("epoch0"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), d))").as("mask"))
    val wc = Window.partitionBy(col("cohort"))
    val perUser = masks
      .withColumn("cohort", expr("bit_count((mask & -mask) - 1)"))
      .withColumn("active_days", expr("CAST(bit_count(mask) AS BIGINT)"))
      .withColumn("cohort_size", count(lit(1)).over(wc))
      .withColumn("cohort_active", sum(col("active_days")).over(wc))
    perUser
      .select(col("epoch0"), col("cohort"), col("cohort_size"),
        col("cohort_active"),
        explode(expr(
          "filter(sequence(0, 62), d -> (shiftright(mask, d) & 1) = 1)")).as("d"))
      .groupBy(date_add(col("epoch0"), col("cohort")).as("cohort_day"),
        (col("d") - col("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"),
        min(col("cohort_size")).as("cs"),
        min(col("cohort_active")).as("ca"))
      .select(col("cohort_day"), col("day_offset"), col("n_users"),
        expr("n_users * 1000000L DIV cs").as("retention_ppm"),
        expr("ca * 1000000L DIV cs").as("mean_active_days_ppm"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val w30Sql: String =
    """WITH e0 AS (SELECT MIN(CAST(ts AS DATE)) AS epoch0 FROM events),
      |u AS (
      |  SELECT user_id, epoch0,
      |    bit_or(CAST(1 AS BIGINT) << d) AS mask
      |  FROM (SELECT user_id, epoch0,
      |          datediff('day', epoch0, CAST(ts AS DATE)) AS d
      |        FROM events, e0)
      |  WHERE d BETWEEN 0 AND 62
      |  GROUP BY user_id, epoch0),
      |s AS (
      |  SELECT user_id, epoch0, mask,
      |    bit_count((mask & -mask) - 1) AS cohort,
      |    CAST(bit_count(mask) AS BIGINT) AS active_days
      |  FROM u),
      |c AS (
      |  SELECT s.*,
      |    COUNT(*) OVER (PARTITION BY cohort) AS cohort_size,
      |    SUM(active_days) OVER (PARTITION BY cohort) AS cohort_active
      |  FROM s),
      |x AS (
      |  SELECT c.*, g.d FROM c,
      |    (SELECT unnest(generate_series(0, 62)) AS d) g
      |  WHERE ((mask >> d) & 1) = 1),
      |r AS (
      |  SELECT epoch0 + cohort * INTERVAL 1 DAY AS cohort_day,
      |    CAST(d - cohort AS BIGINT) AS day_offset,
      |    COUNT(*) AS n_users,
      |    MIN(cohort_size) AS cs, MIN(cohort_active) AS ca
      |  FROM x GROUP BY 1, 2)
      |SELECT CAST(cohort_day AS DATE) AS cohort_day, day_offset, n_users,
      |  CAST(n_users * 1000000 // cs AS BIGINT) AS retention_ppm,
      |  CAST(ca * 1000000 // cs AS BIGINT) AS mean_active_days_ppm
      |FROM r ORDER BY cohort_day, day_offset""".stripMargin

  /** w15: trailing z-score anomaly detection over the per-minute event
    * rate, flagged in EXACT integer arithmetic. For each (event_type,
    * active-minute) the trailing window is the previous 10 ACTIVE
    * minutes; with S = sum, Q = sum-of-squares and n = 10 over that
    * window, |z| > 3 rewrites as (n*cnt - S)^2 > 9*(n*Q - S^2) — both
    * sides integers, so the flag is reproducible bit-for-bit on any
    * engine (no float mean/stddev to drift in the last ulp). Zero
    * variance flags any deviation (z = infinity).
    *
    * Physical shape: one hash agg to the (type, minute) grid — the big
    * shrink, events to at most |types| x |minutes| rows — then one
    * window sort per type over the tiny grid. The trailing frame is
    * ROWS-based, so a 100 TB backfill needs no gap densification; for
    * wider deployments partition the series by (type, day) with a
    * 10-minute carry-in instead of one partition per type.
    */
  /** Trailing-window length and squared z threshold for the anomaly
    * rule — shared with the streaming twin
    * ([[graft.streaming.CdcStream.anomalyStream]]) so the two cannot
    * drift apart.
    */
  val AnomalyWindow = 10
  val AnomalyZSq = 9L // |z| > 3

  def w15Anomaly(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("event_type")).orderBy(col("minute"))
      .rowsBetween(-AnomalyWindow, -1)
    Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("q", sum(col("cnt") * col("cnt")).over(w))
      .filter(col("n") === AnomalyWindow)
      .filter(
        when(col("n") * col("q") - col("s") * col("s") === 0,
          col("n") * col("cnt") =!= col("s"))
          .otherwise(
            (col("n") * col("cnt") - col("s")) * (col("n") * col("cnt") - col("s")) >
              lit(AnomalyZSq) * (col("n") * col("q") - col("s") * col("s"))))
      .select(col("event_type"), col("minute"), col("cnt"),
        col("s").as("win_sum"))
      .orderBy(col("event_type"), col("minute"))
  }

  val w15Sql: String =
    """WITH ev AS (
      |  SELECT event_type, date_trunc('minute', ts) AS minute, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, minute, cnt,
      |    COUNT(*) OVER w AS n, SUM(cnt) OVER w AS s, SUM(cnt*cnt) OVER w AS q
      |  FROM ev
      |  WINDOW w AS (PARTITION BY event_type ORDER BY minute
      |               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, minute, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(s AS BIGINT) AS win_sum
      |FROM t
      |WHERE n = 10
      |  AND (CASE WHEN n*q - s*s = 0 THEN n*cnt <> s
      |            ELSE (n*cnt - s)*(n*cnt - s) > 9*(n*q - s*s) END)
      |ORDER BY event_type, minute""".stripMargin

  /** w16: event-time DISORDER profile — the report that tells an
    * operator what watermark the streaming jobs (w1–w3's streaming
    * twins, `CdcStream.windowedCounts`) can afford. An event's LATENESS
    * is how far its event time lags the latest event time already seen
    * on its stream at arrival (`running_max(ts) − ts`) — exactly the
    * quantity a `withWatermark` bound must exceed for the event to be
    * counted. Output: per (event_type, lateness bucket) counts + the
    * bucket's worst lateness, in exact integer microseconds.
    *
    * Fixture note: the driver log is perfectly append-ordered (every
    * lateness would be 0), so the query profiles a DETERMINISTICALLY
    * JITTERED arrival order — each event shifted ±3 positions by an
    * md5 draw, the reordering a multi-partition transport produces —
    * making the report non-vacuous at every SF; production points the
    * same query at the real arrival log, arrival_key = arrival offset.
    *
    * Scale shape: ONE exchange on the stream key (event_type — the
    * unit a real source partitions by, so the running max matches what
    * each partitioned consumer observes) + the running-max window +
    * the tiny bucket rollup. No self-join against earlier events — the
    * naive formulation — and nothing floating-point anywhere.
    */
  def w16DisorderProfile(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{HashFunctions => H}
    val arrivalKey = col("event_id") +
      (pmod(H.md5NumberBigEndian(
        concat(col("event_id").cast("string"), lit(":arr"))), lit(7L)) - lit(3L))
    val w = Window
      .partitionBy(col("event_type")).orderBy(col("arrival_key"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val lateUs = max(unix_micros(col("ts"))).over(w) - unix_micros(col("ts"))
    val bucket = when(col("late_us") === 0, "0_in_order")
      .when(col("late_us") <= 60L * 1000000, "1_under_1m")
      .when(col("late_us") <= 600L * 1000000, "2_under_10m")
      .when(col("late_us") <= 3600L * 1000000, "3_under_1h")
      .otherwise("4_over_1h")
    Tables.load(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("ts"))
      .withColumn("arrival_key", arrivalKey)
      .withColumn("late_us", lateUs)
      .groupBy(col("event_type"), bucket.as("lateness_bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("late_us")).as("max_late_us"))
      .orderBy(col("event_type"), col("lateness_bucket"))
  }

  val w16Sql: String = {
    val h = Documents.signedBeMd5Sql("CAST(event_id AS VARCHAR) || ':arr'")
    s"""WITH a AS (
      |  SELECT event_type, event_id, ts,
      |    event_id + ((($h) % 7 + 7) % 7) - 3 AS arrival_key
      |  FROM events),
      |l AS (
      |  SELECT event_type,
      |    MAX(epoch_us(ts)) OVER (PARTITION BY event_type
      |      ORDER BY arrival_key, event_id
      |      ROWS UNBOUNDED PRECEDING) - epoch_us(ts) AS late_us
      |  FROM a),
      |b AS (
      |  SELECT event_type, late_us,
      |    CASE WHEN late_us = 0 THEN '0_in_order'
      |         WHEN late_us <= 60000000 THEN '1_under_1m'
      |         WHEN late_us <= 600000000 THEN '2_under_10m'
      |         WHEN late_us <= 3600000000 THEN '3_under_1h'
      |         ELSE '4_over_1h' END AS lateness_bucket
      |  FROM l)
      |SELECT event_type, lateness_bucket, COUNT(*) AS n_events,
      |  CAST(MAX(late_us) AS BIGINT) AS max_late_us
      |FROM b GROUP BY 1, 2
      |ORDER BY event_type, lateness_bucket""".stripMargin
  }

  /** w17: event-type TRANSITION MATRIX — the path-analysis readout next
    * to w13's funnel (ClickHouse users build it with groupArray +
    * arrayZip per user; the Spark-first form is one lead() window): for
    * every consecutive same-session pair of events in a user's (ts,
    * event_id) order, count (from_type → to_type) transitions and the
    * distinct users making each. The session rule here is STRICT (next
    * event < 4 h later) — deliberately one tick tighter than
    * w3/w27/w19's boundary-INCLUSIVE gap (<= 4 h): a transition at
    * exactly 4 h is path-analysis noise, not a continuation, and each
    * query's oracle replays its own rule; evaluated in exact integer
    * microseconds so both engines agree on every boundary (the earlier
    * claim that this "is w3's gap rule" was wrong — r12 review).
    *
    * Scale shape: ONE exchange on user_id feeds the lead() window; the
    * transition grid is |types|² rows, so the rollup (and its distinct-
    * user expand) runs on corpus-sized input but tiny output, and the
    * output sort rides the grid.
    */
  def w17TransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("to_type").isNotNull && col("gap_us") < lit(4L * 3600 * 1000000))
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val w17Sql: String =
    """WITH t AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER w AS to_type,
      |    epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type AS from_type, to_type, COUNT(*) AS n_transitions,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM t WHERE to_type IS NOT NULL AND gap_us < 14400000000
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** w18: Count-Min sketch heavy hitters, FIXED-CANDIDATE readout —
    * w11's CMS (the shared [[cmBucket]]/[[cmLanes]] machinery under
    * this query's own salt) pointed the other way: w11 RANKS BY the
    * sketch estimate (what a deployment without exact counts would
    * serve); here the exact top-10 is the candidate set and the sketch
    * is interrogated about it — the calibration view. The 4-row ×
    * 256-counter CMS builds in one hash agg whose state is 1024 cells
    * REGARDLESS of key cardinality (the point vs exact top-k's full
    * key space — at 100 TB the exact agg's state is the user table,
    * the sketch's is a page), then the exact top-10 users read their
    * estimates back out of the
    * sketch (est = min over the 4 rows) and the report carries the
    * measured OVERESTIMATE per key — which is provably ≥ 0, a built-in
    * correctness invariant (CMS never underestimates), and exactly the
    * collision noise a capacity planner inspects before trusting the
    * sketch at a given width. md5-derived row hashes, all integer.
    */
  def w18CmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events").select(col("user_id"))
    val lanes = cmLanes("cms:") // w11's machinery, this query's salt
    val cells = ev.select(lanes).toDF("j", "c")
      .groupBy(col("j"), col("c")).agg(count(lit(1)).as("cell_cnt"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id")).limit(10)
    exact
      .select(col("user_id"), col("exact_cnt"), lanes)
      .toDF("user_id", "exact_cnt", "j", "c")
      .join(broadcast(cells), Seq("j", "c"))
      .groupBy(col("user_id"), col("exact_cnt"))
      .agg(min(col("cell_cnt")).as("cms_est"))
      .select(col("user_id"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overestimate"))
      .orderBy(col("exact_cnt").desc, col("user_id"))
  }

  val w18Sql: String = {
    def h(i: Int) = graft.queries.Documents.signedBeMd5Sql(
      s"'cms:$i:' || CAST(user_id AS VARCHAR)")
    val rowSel = (0 until 4).map(i =>
      s"""SELECT $i AS r, ((${h(i)} % 256) + 256) % 256 AS b, user_id FROM events""")
      .mkString("\nUNION ALL\n")
    s"""WITH rb AS (
      |$rowSel),
      |cells AS (SELECT r, b, COUNT(*) AS cell_cnt FROM rb GROUP BY r, b),
      |exact AS (SELECT user_id, COUNT(*) AS exact_cnt FROM events
      |          GROUP BY user_id ORDER BY exact_cnt DESC, user_id LIMIT 10),
      |est AS (
      |  SELECT e.user_id, e.exact_cnt, MIN(c.cell_cnt) AS cms_est
      |  FROM exact e
      |  JOIN rb ON rb.user_id = e.user_id
      |  JOIN cells c ON c.r = rb.r AND c.b = rb.b
      |  GROUP BY e.user_id, e.exact_cnt)
      |SELECT user_id, exact_cnt, cms_est, cms_est - exact_cnt AS overestimate
      |FROM est ORDER BY exact_cnt DESC, user_id""".stripMargin
  }

  /** w19: LAST-TOUCH ATTRIBUTION — the conversion-credit readout that
    * closes the product-analytics family (w13 asks "did the user reach
    * purchase", w17 "which paths exist"; this asks "which touch gets the
    * credit"): every purchase is attributed to the LATEST view/click by
    * the same user at-or-before it and within the 4-hour session gap,
    * else 'none'. Per touch type: purchases, exact revenue, mean lag.
    *
    * The naive form is a per-purchase as-of self-join on user_id; the
    * Spark-first form is ONE running-max window over an encoded touch
    * key (us·8 + code, code click=2 > view=1) on the SAME user exchange
    * the other event queries use — the max key IS the latest eligible
    * touch, decoded arithmetically. Determinism under timestamp ties is
    * pinned by construction: the window orders (us, touches-first,
    * event_id) so an equal-us touch is always visible to the purchase,
    * and the key encoding makes click beat view at identical us in both
    * engines. All integer microseconds; revenue via the decimal-sum
    * convention.
    *
    * Scale shape: one exchange on user_id + a |touch types|-row rollup;
    * no self-join, no per-purchase probe. At 100 TB this is exactly the
    * funnel's cost.
    */
  def w19LastTouch(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 4L * 3600 * 1000000
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("tc",
        when(col("event_type") === "click", 2L)
          .when(col("event_type") === "view", 1L))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), when(col("tc").isNotNull, 0).otherwise(1), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attributed = ev
      .withColumn("tk",
        max(when(col("tc").isNotNull, col("us") * 8 + col("tc"))).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("lag_us", col("us") - expr("tk DIV 8"))
      .withColumn("touch_type",
        when(col("tk").isNull || col("lag_us") > gapUs, "none")
          .when(col("tk") % 8 === 2, "click").otherwise("view"))
    attributed.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("revenue"),
        expr("""CAST(CASE WHEN COUNT(CASE WHEN touch_type <> 'none' THEN 1 END) = 0
              THEN NULL
              ELSE SUM(CASE WHEN touch_type <> 'none' THEN lag_us END)
                   DIV COUNT(CASE WHEN touch_type <> 'none' THEN 1 END)
              END AS BIGINT)""").as("mean_lag_us"))
      .orderBy(col("touch_type"))
  }

  val w19Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us, value,
      |    CASE WHEN event_type = 'click' THEN 2
      |         WHEN event_type = 'view' THEN 1 END AS tc
      |  FROM events),
      |k AS (
      |  SELECT *, MAX(CASE WHEN tc IS NOT NULL THEN us * 8 + tc END) OVER (
      |      PARTITION BY user_id
      |      ORDER BY us, CASE WHEN tc IS NOT NULL THEN 0 ELSE 1 END, event_id
      |      ROWS UNBOUNDED PRECEDING) AS tk
      |  FROM e),
      |p AS (
      |  SELECT value, tk, us - tk // 8 AS lag_us
      |  FROM k WHERE event_type = 'purchase'),
      |a AS (
      |  SELECT CASE WHEN tk IS NULL OR lag_us > 14400000000 THEN 'none'
      |              WHEN tk % 8 = 2 THEN 'click' ELSE 'view' END AS touch_type,
      |         value, lag_us FROM p)
      |SELECT touch_type, COUNT(*) AS n_purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(CASE WHEN COUNT(CASE WHEN touch_type <> 'none' THEN 1 END) = 0
      |       THEN NULL
      |       ELSE SUM(CASE WHEN touch_type <> 'none' THEN lag_us END)
      |            // COUNT(CASE WHEN touch_type <> 'none' THEN 1 END)
      |       END AS BIGINT) AS mean_lag_us
      |FROM a GROUP BY touch_type ORDER BY touch_type""".stripMargin

  /** w20: GROUPED TOP-K — per day, the top-3 event types by exact
    * revenue (the "leaderboard per window" readout every analytics
    * surface ships; ClickHouse spells it LIMIT BY, Spark-first it's a
    * rank window that the optimizer PRUNES): the per-(day, type) rollup
    * is one hash agg, and the rank<=3 filter compiles to
    * WindowGroupLimit, so the window exchange carries at most k rows
    * per day instead of every group — the d14 discipline applied to
    * windowed analytics. Ties are pinned by (revenue DESC, type).
    *
    * Scale shape: one (day, type) hash agg over the corpus (map-side
    * partial — the grid is |days|·|types|), one tiny window exchange
    * over the pruned grid. At 100 TB the corpus is touched once.
    */
  def w20GroupedTopk(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("total_value").desc, col("event_type"))
    daily.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("day"), col("rank"), col("event_type"), col("n"),
        col("total_value"))
      .orderBy(col("day"), col("rank"))
  }

  val w20Sql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY day
      |    ORDER BY total_value DESC, event_type) AS rank
      |  FROM daily)
      |SELECT day, CAST(rank AS BIGINT) AS rank, event_type, n, total_value
      |FROM r WHERE rank <= 3 ORDER BY day, rank""".stripMargin

  /** w21: INTER-EVENT GAP HISTOGRAM — the dwell-time readout that sits
    * under w3's sessionization: for every consecutive same-user event
    * pair (event-time order), bucket the gap into 1m/10m/1h/1d bands
    * and report gap count, distinct users, and the worst gap per band.
    * This is the table a session-timeout choice is actually made from
    * (w3 hard-codes the industry 4 h; this measures what the traffic
    * does). Exact integer microseconds end to end.
    *
    * Scale shape: ONE exchange on user_id feeds the lag() window (the
    * same partitioning w3/w13/w17 already use — a real deployment
    * computes them all in one pass over one exchange), then a tiny
    * 5-row hash rollup. The distinct-user count expands inside the
    * rollup (5 bands × |users| worst case), never corpus-squared.
    */
  def w21GapHistogram(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val bucket = when(col("gap_us") < 60L * 1000000, "0_under_1m")
      .when(col("gap_us") < 600L * 1000000, "1_under_10m")
      .when(col("gap_us") < 3600L * 1000000, "2_under_1h")
      .when(col("gap_us") < 86400L * 1000000, "3_under_1d")
      .otherwise("4_over_1d")
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(bucket.as("gap_bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("user_id")).as("n_users"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy(col("gap_bucket"))
  }

  val w21Sql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events),
      |b AS (
      |  SELECT user_id, gap_us,
      |    CASE WHEN gap_us < 60000000 THEN '0_under_1m'
      |         WHEN gap_us < 600000000 THEN '1_under_10m'
      |         WHEN gap_us < 3600000000 THEN '2_under_1h'
      |         WHEN gap_us < 86400000000 THEN '3_under_1d'
      |         ELSE '4_over_1d' END AS gap_bucket
      |  FROM g WHERE gap_us IS NOT NULL)
      |SELECT gap_bucket, COUNT(*) AS n_gaps,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
      |FROM b GROUP BY 1 ORDER BY gap_bucket""".stripMargin

  /** w22: MERGEABLE-SKETCH ROLLING DISTINCT — the pattern that actually
    * serves "distinct users, trailing 7 days" at 100 TB: the corpus is
    * touched ONCE to build per-day HLL-style register sketches (m=256
    * registers, register = max trailing-zero rank of a salted md5), and
    * every rolling window is answered by MERGING daily sketches
    * (element-wise register max — associative, commutative, idempotent),
    * never by re-scanning history. w7 showed a one-shot sampling
    * estimate; this is the operational form: sketches are STATE you
    * store per day/shard and combine on read — exactly how every
    * production HLL pipeline (and Spark's own hll_union_agg) works. The
    * sketch here is hand-rolled integer arithmetic so DuckDB replays it
    * bit-for-bit: rank is bit_count on non-negative 40-bit hashes, the
    * register sum uses integer powers of two (P=20 cap — deep registers
    * saturate rather than round), and the raw-HLL estimate is ONE
    * integer division (alpha as ppm constant). Estimate quality is
    * MEASURED in-query against the exact rolling distinct (the ANN
    * discipline: ground truth rides along, here as the expensive
    * re-scan a production system avoids), reported as abs error ppm.
    *
    * Scale shape: two corpus-keyed exchanges total — the (day, reg)
    * sketch agg and the (day, user) distinct for the exact side; the
    * rolling merge itself runs on the |days|x256 grid via an
    * explode-to-equi-join (sequence(d, d+6)) so no range/nested-loop
    * join appears anywhere; at scale you'd persist the daily grid and
    * skip the exact side entirely.
    */
  /** The w22 register derivation, shared verbatim by the batch sketch
    * and [[graft.streaming.CdcStream.sketchStream]]'s input projection
    * (the twin claim only means something if both sides hash/rank
    * identically): (day_idx, reg, rho) per event, rho saturated at
    * P=20. Trailing-zero rank on a NON-NEGATIVE domain: (x & -x) - 1 is
    * the trailing-zero mask, bit_count counts it; x = 0 exhausts the 32
    * hash bits -> rank 33 (saturates to 20).
    */
  private[graft] def sketchRegisterRows(events: DataFrame): DataFrame = {
    val h = graft.functions.HashFunctions.md5NumberBigEndian(
      concat(lit("u:"), col("user_id").cast("string")))
    events
      .select(expr("unix_micros(ts) DIV 86400000000").as("d"), col("user_id"))
      .withColumn("hu", pmod(h, lit(1099511627776L))) // 2^40, non-negative
      .withColumn("reg", col("hu") % 256)
      .withColumn("x", expr("hu DIV 256"))
      .withColumn("rho", least(when(col("x") === 0, lit(33L))
        .otherwise(expr("CAST(bit_count((x & -x) - 1) AS BIGINT) + 1")),
        lit(20L)))
      .select(col("d"), col("reg"), col("rho"))
  }

  /** Raw-HLL integer estimate from a register map (the w22 formula as
    * plain Scala, for the streaming processor and specs): alpha ppm *
    * m^2 * 2^P over the saturated register sum, one integer division.
    */
  private[graft] def sketchEstimate(regs: scala.collection.Map[Long, Long]): Long = {
    val s = regs.valuesIterator.map(r => 1L << (20 - r)).sum +
      (256L - regs.size) * 1048576L
    718270L * (68719476736L / s) / 1000000L
  }

  def w22SketchMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val daily = sketchRegisterRows(ev)
      .groupBy(col("d"), col("reg"))
      .agg(max(col("rho")).as("mrho"))
      // barrier: the daily grid is exactly the state a production
      // pipeline PERSISTS per day; here it has two consumers (the merge
      // and the day frame) that must not each re-pay the corpus agg
      .localCheckpoint(false)
    val days = daily.select(col("d")).distinct()
    // merge = register max across the window's days: each daily register
    // row feeds the 7 windows it belongs to (explode-to-equi-join — a
    // range join would plan a nested loop), clipped to real days
    val merged = daily
      .select(explode(sequence(col("d"), col("d") + 6)).as("wd"),
        col("reg"), col("mrho"))
      .join(days.withColumnRenamed("d", "wd"), "wd")
      .groupBy(col("wd"), col("reg"))
      .agg(max(col("mrho")).as("mrho"))
    val est = merged.groupBy(col("wd"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - mrho AS INT))"))
          .as("s_hit"),
        count(lit(1)).as("n_regs_hit"))
      // empty registers contribute a full 2^20 term; alpha = 0.7183 as a
      // ppm constant so the estimate is exact integer arithmetic
      .withColumn("s_full",
        col("s_hit") + (lit(256L) - col("n_regs_hit")) * lit(1048576L))
      .withColumn("est_users_7d", // 68719476736 = 2^36 = m^2 * 2^20 as ONE
        // bigint literal (an int-literal product would wrap silently)
        expr("(718270 * (68719476736 DIV s_full)) DIV 1000000"))
      .select(col("wd"), col("n_regs_hit"), col("est_users_7d"))
    val exact = ev
      .select(expr("unix_micros(ts) DIV 86400000000").as("d"), col("user_id"))
      .distinct()
      .select(explode(sequence(col("d"), col("d") + 6)).as("wd"), col("user_id"))
      .join(days.withColumnRenamed("d", "wd"), "wd")
      .groupBy(col("wd"))
      .agg(countDistinct(col("user_id")).as("exact_users_7d"))
    est.join(exact, "wd")
      .select(col("wd").as("day_idx"), col("n_regs_hit"),
        col("est_users_7d"), col("exact_users_7d"),
        expr("abs(est_users_7d - exact_users_7d) * 1000000 DIV exact_users_7d")
          .as("abs_err_ppm"))
      .orderBy(col("day_idx"))
  }

  val w22Sql: String = {
    val h = graft.queries.Documents.signedBeMd5Sql(
      "'u:' || CAST(user_id AS VARCHAR)")
    s"""WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS d, user_id FROM events),
      |hx AS (SELECT d, user_id,
      |         (($h % 1099511627776) + 1099511627776) % 1099511627776 AS hu
      |       FROM ev),
      |rr AS (SELECT d, hu % 256 AS reg, hu // 256 AS x FROM hx),
      |daily AS (
      |  SELECT d, reg, MAX(LEAST(CASE WHEN x = 0 THEN 33
      |    ELSE bit_count((x & -x) - 1) + 1 END, 20)) AS mrho
      |  FROM rr GROUP BY d, reg),
      |days AS (SELECT DISTINCT d FROM ev),
      |merged AS (
      |  SELECT wd, reg, MAX(mrho) AS mrho
      |  FROM (SELECT d + i AS wd, reg, mrho
      |        FROM daily, LATERAL (SELECT unnest(generate_series(0, 6)) AS i))
      |  JOIN days ON wd = days.d GROUP BY wd, reg),
      |est AS (
      |  SELECT wd, COUNT(*) AS n_regs_hit,
      |    (718270 * (68719476736 //
      |      (SUM(CAST(1 AS BIGINT) << (20 - mrho)) + (256 - COUNT(*)) * 1048576))) // 1000000
      |      AS est_users_7d
      |  FROM merged GROUP BY wd),
      |ex AS (
      |  SELECT wd, COUNT(DISTINCT user_id) AS exact_users_7d
      |  FROM (SELECT d + i AS wd, user_id
      |        FROM (SELECT DISTINCT d, user_id FROM ev),
      |             LATERAL (SELECT unnest(generate_series(0, 6)) AS i))
      |  JOIN days ON wd = days.d GROUP BY wd)
      |SELECT CAST(est.wd AS BIGINT) AS day_idx,
      |  CAST(n_regs_hit AS BIGINT) AS n_regs_hit,
      |  CAST(est_users_7d AS BIGINT) AS est_users_7d,
      |  CAST(exact_users_7d AS BIGINT) AS exact_users_7d,
      |  CAST(abs(est_users_7d - exact_users_7d) * 1000000 // exact_users_7d
      |    AS BIGINT) AS abs_err_ppm
      |FROM est JOIN ex ON est.wd = ex.wd ORDER BY day_idx""".stripMargin
  }

  /** w23: TIME-DECAY MULTI-TOUCH ATTRIBUTION — the third attribution
    * model next to w19's last-touch and w17's transitions: every
    * purchase's revenue is spread over ALL its preceding touches
    * (view/click since the user's previous purchase), with weight
    * halving per step of recency — touch k (1 = most recent) weighs
    * 2^-(k-1). Weights are integer ppm (1000000 >> (k-1), zero beyond
    * 20 steps) and each touch receives value·w/Σw in exact integer
    * micro-units, so conservation (per-purchase shares sum to the
    * purchase, up to DIV remainders) is checkable and both engines
    * agree bitwise. Output per touch type: touches attributed, summed
    * weight, attributed revenue, and its share of all attributed
    * revenue.
    *
    * Scale shape: NO self-join of touches to purchases — one user-keyed
    * exchange carries (a) the running purchase count that segments each
    * user's timeline, then (b) per-(user, segment) frames for the
    * recency rank, the weight sum, and the purchase value, all riding
    * the same user hash partitioning (ClusteredDistribution is
    * satisfied by the user exchange — no second shuffle); the rollup is
    * |touch types| rows.
    */
  def w23DecayAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"),
        (col("event_type") === "purchase").cast("long").as("is_p"))
    val tl = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val seg = Window.partitionBy(col("user_id"), col("seg"))
    val segDesc = seg.orderBy(col("us").desc, col("event_id").desc)
    val attributed = ev
      // purchases close their own segment: count of STRICTLY PRECEDING
      // purchases, so a purchase row shares its seg with its touches
      .withColumn("seg", coalesce(sum(col("is_p")).over(
        tl.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("rn", row_number().over(segDesc))
      // the purchase is the segment's last row (rn=1), so touches rank
      // rn>=2 and k=rn-1; a tail segment with no purchase leaves its
      // touches at rn>=1 with no pval — the rn>=2 guard keeps the shift
      // total (those rows drop at the filter either way)
      .withColumn("w_ppm", when(col("is_p") === 0,
        when(col("rn") >= 2 && col("rn") - 1 <= 20,
          expr("shiftright(1000000L, cast(rn - 2 AS INT))"))
          .otherwise(lit(0L))))
      .withColumn("sw", sum(col("w_ppm")).over(seg))
      .withColumn("pval_e6", max(when(col("is_p") === 1,
        floor(col("value") * 1e6).cast("long"))).over(seg))
      .filter(col("is_p") === 0 && col("pval_e6").isNotNull && col("sw") > 0)
      .withColumn("attr_e6", expr("pval_e6 * w_ppm DIV sw"))
    attributed.groupBy(col("event_type").as("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("w_ppm")).as("sum_weight_ppm"),
        sum(col("attr_e6")).as("attributed_rev_e6"))
      .withColumn("share_ppm",
        expr("attributed_rev_e6 * 1000000L DIV sum(attributed_rev_e6) OVER ()"))
      .orderBy(col("touch_type"))
  }

  val w23Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us, value,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |s AS (
      |  SELECT *, COALESCE(SUM(is_p) OVER (PARTITION BY user_id
      |      ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
      |  FROM e),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, seg
      |      ORDER BY us DESC, event_id DESC) AS rn
      |  FROM s),
      |w AS (
      |  SELECT *, CASE WHEN is_p = 0 THEN
      |      CASE WHEN rn >= 2 AND rn - 1 <= 20 THEN 1000000 >> (rn - 2)
      |        ELSE 0 END
      |    END AS w_ppm
      |  FROM r),
      |g AS (
      |  SELECT *, SUM(w_ppm) OVER (PARTITION BY user_id, seg) AS sw,
      |    MAX(CASE WHEN is_p = 1
      |        THEN CAST(floor(value * 1e6) AS BIGINT) END)
      |      OVER (PARTITION BY user_id, seg) AS pval_e6
      |  FROM w),
      |a AS (
      |  SELECT event_type, w_ppm, pval_e6 * w_ppm // sw AS attr_e6
      |  FROM g WHERE is_p = 0 AND pval_e6 IS NOT NULL AND sw > 0),
      |t AS (
      |  SELECT event_type AS touch_type, COUNT(*) AS n_touches,
      |    SUM(w_ppm) AS sum_weight_ppm, SUM(attr_e6) AS attributed_rev_e6
      |  FROM a GROUP BY event_type)
      |SELECT touch_type, n_touches,
      |  CAST(sum_weight_ppm AS BIGINT) AS sum_weight_ppm,
      |  CAST(attributed_rev_e6 AS BIGINT) AS attributed_rev_e6,
      |  CAST(attributed_rev_e6 * 1000000 // SUM(attributed_rev_e6) OVER ()
      |    AS BIGINT) AS share_ppm
      |FROM t ORDER BY touch_type""".stripMargin

  /** w24: DAU/WAU STICKINESS — the engagement ratio (mean daily active
    * over weekly active, ppm) next to w14's retention curve: retention
    * says who comes BACK, stickiness says how much of the weekly
    * audience shows up on a typical day — the first KPI an activity
    * dashboard plots. Weeks are integer 7-day buckets from the fixed
    * anchor (a config epoch, not data-derived, so weeks are stable as
    * data arrives); all ratios integer ppm.
    *
    * Scale shape: w14's discipline — the (user, day) activity grid is
    * DISTINCT'd first (one corpus-keyed shuffle) and checkpointed, so
    * the daily counts, the weekly distinct-user counts, and the rollup
    * all fold from at most |users|×|days| rows; the weekly join is
    * |weeks|-sized.
    */
  def w24Stickiness(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("week_idx",
        (datediff(col("day"), lit("2024-01-01").cast("date")) / 7)
          .cast("long"))
      .localCheckpoint(false) // read by the daily AND weekly folds
    val daily = grid.groupBy(col("week_idx"), col("day"))
      .agg(count(lit(1)).as("dau")) // grid is (user, day)-distinct
      .groupBy(col("week_idx"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
    val weekly = grid.groupBy(col("week_idx"))
      .agg(count_distinct(col("user_id")).as("wau"))
    daily.join(weekly, Seq("week_idx"))
      .select(col("week_idx"), col("n_days"), col("wau"),
        expr("sum_dau DIV n_days").as("avg_dau"),
        expr("(sum_dau DIV n_days) * 1000000L DIV wau").as("stickiness_ppm"))
      .orderBy(col("week_idx"))
  }

  val w24Sql: String =
    """WITH g AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |w AS (SELECT user_id, day,
      |        (day - DATE '2024-01-01') // 7 AS week_idx FROM g),
      |d AS (SELECT week_idx, COUNT(*) AS n_days, SUM(dau) AS sum_dau
      |      FROM (SELECT week_idx, day, COUNT(*) AS dau
      |            FROM w GROUP BY week_idx, day)
      |      GROUP BY week_idx),
      |u AS (SELECT week_idx, COUNT(DISTINCT user_id) AS wau
      |      FROM w GROUP BY week_idx)
      |SELECT CAST(d.week_idx AS BIGINT) AS week_idx,
      |  CAST(n_days AS BIGINT) AS n_days, CAST(wau AS BIGINT) AS wau,
      |  CAST(sum_dau // n_days AS BIGINT) AS avg_dau,
      |  CAST((sum_dau // n_days) * 1000000 // wau AS BIGINT)
      |    AS stickiness_ppm
      |FROM d JOIN u ON d.week_idx = u.week_idx
      |ORDER BY week_idx""".stripMargin

  /** w25: TIME-TO-CONVERT — the latency distribution behind w13's funnel
    * counts: for each ordered stage pair (view→click, click→purchase,
    * view→purchase), how long users took, banded hour/day/week with
    * min/max and each band's share of the stage's converters (ppm).
    * w13 says HOW MANY reach each step; w25 says HOW FAST — the second
    * chart on every conversion dashboard.
    *
    * Scale shape: w13's per-user funnel timestamps cost ONE user-keyed
    * exchange (the groupBy reuses the window's partitioning); the three
    * stage durations explode from the same per-user row (projection-
    * shaped, x3 on |users|); the band rollup is a hash agg and the
    * share window runs on the <= |stages x bands| = 12-row frame.
    */
  def w25TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val funnel = funnelTimes(spark, dir) // w13's own stage times
    val stages = funnel.select(explode(array(
        struct(lit("1_view_to_click").as("stage"),
          (col("t2_us") - col("t1_us")).as("dur_us")),
        struct(lit("2_click_to_purchase").as("stage"),
          (col("t3_us") - col("t2_us")).as("dur_us")),
        struct(lit("3_view_to_purchase").as("stage"),
          (col("t3_us") - col("t1_us")).as("dur_us")))).as("e"))
      .select(col("e.stage").as("stage"), col("e.dur_us").as("dur_us"))
      .filter(col("dur_us").isNotNull)
    val band = when(col("dur_us") < 3600L * 1000000, "0_under_1h")
      .when(col("dur_us") < 86400L * 1000000, "1_under_1d")
      .when(col("dur_us") < 7L * 86400L * 1000000, "2_under_1w")
      .otherwise("3_over_1w")
    stages.groupBy(col("stage"), band.as("latency_band"))
      .agg(count(lit(1)).as("n_users"),
        min(col("dur_us")).as("min_us"), max(col("dur_us")).as("max_us"))
      .withColumn("stage_total",
        sum(col("n_users")).over(Window.partitionBy(col("stage"))))
      .select(col("stage"), col("latency_band"), col("n_users"),
        col("min_us"), col("max_us"),
        expr("n_users * 1000000 DIV stage_total").as("share_ppm"))
      .orderBy(col("stage"), col("latency_band"))
  }

  val w25Sql: String =
    s"""WITH $funnelCtesSql,
      |f AS (SELECT user_id, MAX(t1_us) t1, MAX(t2_us) t2, MAX(t3_us) t3
      |      FROM l3 GROUP BY user_id),
      |st AS (
      |  SELECT stage, dur_us FROM (
      |    SELECT '1_view_to_click' AS stage, t2 - t1 AS dur_us FROM f
      |    UNION ALL SELECT '2_click_to_purchase', t3 - t2 FROM f
      |    UNION ALL SELECT '3_view_to_purchase', t3 - t1 FROM f)
      |  WHERE dur_us IS NOT NULL),
      |g AS (
      |  SELECT stage,
      |    CASE WHEN dur_us < 3600000000 THEN '0_under_1h'
      |         WHEN dur_us < 86400000000 THEN '1_under_1d'
      |         WHEN dur_us < 604800000000 THEN '2_under_1w'
      |         ELSE '3_over_1w' END AS latency_band,
      |    COUNT(*) AS n_users, MIN(dur_us) AS mn, MAX(dur_us) AS mx
      |  FROM st GROUP BY 1, 2)
      |SELECT stage, latency_band, n_users,
      |  CAST(mn AS BIGINT) AS min_us, CAST(mx AS BIGINT) AS max_us,
      |  CAST(n_users * 1000000 // SUM(n_users) OVER (PARTITION BY stage)
      |    AS BIGINT) AS share_ppm
      |FROM g ORDER BY stage, latency_band""".stripMargin

  /** w26: SEQUENTIAL PATTERNS — support counts for every contiguous
    * event-type trigram in per-user journeys (the k=3 sequence-mining
    * pass behind "what do users do right before an error?"): w17's
    * transition matrix sees single steps; w26 sees three-step paths,
    * with both raw occurrence counts and distinct-user support, ordered
    * by support.
    *
    * Scale shape: ONE user-keyed exchange serves both lead() windows;
    * the trigram rollup folds to at most |types|^3 = 125 rows with
    * map-side partial combine (the distinct-user count shuffles the
    * (trigram, user) grid once), and the output sort is over that
    * bounded frame.
    */
  def w26SequencePatterns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("t2").as("e2"),
        col("t3").as("e3"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("n_occurrences").desc, col("e1"), col("e2"), col("e3"))
  }

  val w26Sql: String =
    """WITH s AS (
      |  SELECT user_id, event_type AS e1,
      |    LEAD(event_type, 1) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |    LEAD(event_type, 2) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS e3
      |  FROM events)
      |SELECT e1, e2, e3, COUNT(*) AS n_occurrences,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM s WHERE e3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n_occurrences DESC, e1, e2, e3""".stripMargin

  /** w27: ASSOCIATION RULES — support and two-way confidence for every
    * unordered event-type pair CO-OCCURRING inside one session (w3's 4h
    * gap rule): "sessions that contain an error also contain a click
    * 83% of the time". w26 mines ordered paths; w27 mines unordered
    * basket structure — the classic market-basket pass run on session
    * baskets. All ratios integer ppm.
    *
    * Scale shape: ONE session_window exchange builds the (session,
    * type-set) frame, checkpointed for its three readers (total, type
    * rates, pair counts); the pair fan-out is <= |types|^2 per session
    * from the in-row set (no self-join of the event log); every rollup
    * after it is a <= |types|^2-row frame, and the rate joins
    * broadcast.
    */
  def w27AssociationRules(spark: SparkSession, dir: String): DataFrame = {
    val sess = Tables.load(spark, dir, "events")
      .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
      .agg(collect_set(col("event_type")).as("types"))
      .select(col("types"))
      .localCheckpoint(false) // total + type rates + pair counts
    val total = sess.agg(count(lit(1)).as("n_sessions"))
    val tc = sess.select(explode(col("types")).as("ty"))
      .groupBy(col("ty")).agg(count(lit(1)).as("c"))
    val pairs = sess
      .select(explode(col("types")).as("type_a"), col("types"))
      .select(col("type_a"), explode(col("types")).as("type_b"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(tc.select(col("ty").as("type_a"), col("c").as("n_a"))),
        "type_a")
      .join(broadcast(tc.select(col("ty").as("type_b"), col("c").as("n_b"))),
        "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_sessions"),
        col("n_a"), col("n_b"), col("n_ab"),
        expr("n_ab * 1000000L DIV n_sessions").as("support_ppm"),
        expr("n_ab * 1000000L DIV n_a").as("conf_a_to_b_ppm"),
        expr("n_ab * 1000000L DIV n_b").as("conf_b_to_a_ppm"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val w27Sql: String =
    """WITH s AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w > INTERVAL '4 hours' THEN 1 ELSE 0 END brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |i AS (SELECT user_id, event_type,
      |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS UNBOUNDED PRECEDING) island
      |      FROM s),
      |t AS (SELECT DISTINCT user_id, island, event_type AS ty FROM i),
      |n AS (SELECT COUNT(*) AS n_sessions
      |      FROM (SELECT DISTINCT user_id, island FROM t)),
      |tc AS (SELECT ty, COUNT(*) AS c FROM t GROUP BY 1),
      |p AS (SELECT a.ty type_a, b.ty type_b, COUNT(*) n_ab
      |      FROM t a JOIN t b ON a.user_id = b.user_id
      |        AND a.island = b.island AND a.ty < b.ty
      |      GROUP BY 1, 2)
      |SELECT type_a, type_b, CAST(n_sessions AS BIGINT) AS n_sessions,
      |  CAST(ca.c AS BIGINT) AS n_a, CAST(cb.c AS BIGINT) AS n_b,
      |  CAST(n_ab AS BIGINT) AS n_ab,
      |  CAST(n_ab * 1000000 // n_sessions AS BIGINT) AS support_ppm,
      |  CAST(n_ab * 1000000 // ca.c AS BIGINT) AS conf_a_to_b_ppm,
      |  CAST(n_ab * 1000000 // cb.c AS BIGINT) AS conf_b_to_a_ppm
      |FROM p JOIN tc ca ON p.type_a = ca.ty
      |       JOIN tc cb ON p.type_b = cb.ty, n
      |ORDER BY type_a, type_b""".stripMargin

  /** w28: ERROR-RECOVERY PROFILE — for every error event, how long
    * until the same user's next successful (non-error) event, banded,
    * plus the errors never followed by one ('4_never') — the
    * reliability dashboard's MTTR table, user-scoped. Row-order
    * semantics: the next non-error ROW in (ts, event_id) order (same
    * frame rule on both engines).
    *
    * Scale shape: ONE user-keyed exchange; the next-ok lookup is a
    * min over the FOLLOWING frame (Spark computes unbounded-following
    * frames in a single reverse pass per partition — no self-join);
    * the band rollup is a 5-row hash agg and its share window rides.
    */
  def w28ErrorRecovery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val band = when(col("rec_us").isNull, "4_never")
      .when(col("rec_us") < 60L * 1000000, "0_under_1m")
      .when(col("rec_us") < 3600L * 1000000, "1_under_1h")
      .when(col("rec_us") < 86400L * 1000000, "2_under_1d")
      .otherwise("3_over_1d")
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_ok_us",
        min(when(col("event_type") =!= "error", col("us")))
          .over(w.rowsBetween(1, Window.unboundedFollowing)))
      .filter(col("event_type") === "error")
      .withColumn("rec_us", col("next_ok_us") - col("us"))
      .groupBy(band.as("recovery_band"))
      .agg(count(lit(1)).as("n_errors"), max(col("rec_us")).as("max_us"))
      .withColumn("share_ppm",
        expr("n_errors * 1000000L DIV sum(n_errors) OVER ()"))
      .orderBy(col("recovery_band"))
  }

  val w28Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us,
      |    MIN(CASE WHEN event_type <> 'error' THEN epoch_us(ts) END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_ok_us
      |  FROM events),
      |r AS (SELECT next_ok_us - us AS rec_us FROM e
      |      WHERE event_type = 'error'),
      |b AS (
      |  SELECT CASE WHEN rec_us IS NULL THEN '4_never'
      |       WHEN rec_us < 60000000 THEN '0_under_1m'
      |       WHEN rec_us < 3600000000 THEN '1_under_1h'
      |       WHEN rec_us < 86400000000 THEN '2_under_1d'
      |       ELSE '3_over_1d' END AS recovery_band, rec_us
      |  FROM r),
      |g AS (SELECT recovery_band, COUNT(*) AS n_errors, MAX(rec_us) AS mx
      |      FROM b GROUP BY 1)
      |SELECT recovery_band, n_errors, CAST(mx AS BIGINT) AS max_us,
      |  CAST(n_errors * 1000000 // SUM(n_errors) OVER () AS BIGINT)
      |    AS share_ppm
      |FROM g ORDER BY recovery_band""".stripMargin

  /** w29: STREAMING-STATE PROFILE — runs the four per-user
    * transformWithState twins ([[graft.streaming.CdcStream.funnelStream]] /
    * `attributionStream` / `decayAttributionStream` / `transitionStream`)
    * over the events fixture as REAL streaming queries (RocksDB state
    * store, one `Trigger.AvailableNow` batch), then reads the state that
    * is actually resident in each checkpoint back out through Spark's
    * state-store DATA SOURCE (`format("statestore")`, exact — not the
    * RocksDB `estimate-num-keys` metric) and reports, per twin, the live
    * state-key count next to the emitted-row count and the EVICTED-row
    * count read from the query's own `StreamingQueryProgress`
    * state-operator metrics (TTL expiries + expired timers, via
    * [[graft.streaming.QueryMonitor.stateEvictions]]). This is the
    * observability readout the TTL work needs: the same numbers an
    * operator would watch to size `ttl` on a real deployment (state keys
    * ≈ users the store must hold; with a TTL the resident curve flattens
    * and `evicted_rows` goes positive). Here the twins run TTL-less, so
    * `evicted_rows` is deterministically 0 — which is what makes the
    * column ORACLE-CHECKABLE; the proof that the identical readout
    * counts real evictions lives in StreamingOpsSpec, which manipulates
    * processing time past a TTL and so can't be an oracle query.
    *
    * Every column is deterministically derivable from the fixture by
    * SQL, which is what makes a STREAMING-lifecycle profile
    * oracle-checkable: state keys = the distinct users whose twin holds
    * live state by each twin's own documented state rule (any event /
    * touch events / open-segment touches / any event), emitted rows =
    * each twin's documented emission rule (the batch-twin semantics).
    * The whole fixture lands in ONE micro-batch (file source, no rate
    * limit), so the per-batch sort inside each processor makes arrival
    * order immaterial — bit-exact against the batch rules.
    *
    * Scale shape: four sequential streaming queries, each ONE
    * key-hashed exchange into the stateful operator (the same shape the
    * production CDC pipeline runs continuously); the state-source read
    * is a parallel scan of the checkpoint (one task per store
    * partition), and the profile itself is a 4-row local frame — the
    * driver never touches row-level data.
    */
  def w29StateProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // double-checked under a PER-DIR lock, not computeIfAbsent: the
    // mapping function would hold a CHM bin lock for the whole
    // four-streaming-query run (w9's documented discipline), and a
    // single global monitor would serialize unrelated fixtures' builds
    val key = w29CacheKey(spark, dir)
    val rows = Option(w29Cache.get(key)).getOrElse {
      profileLocks.computeIfAbsent(dir, _ => new Object).synchronized {
        Option(w29Cache.get(key)).getOrElse {
          val p = runW29Profile(spark, dir)
          w29Cache.put(key, p)
          p
        }
      }
    }
    rows.toDF("twin", "state_keys", "emitted_rows", "evicted_rows")
  }

  /** Per-fixture-dir build locks shared by the w9 and w29 memos: one
    * lock per dir serializes same-fixture rebuilds (regeneration) while
    * different fixtures build concurrently.
    */
  private val profileLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-fixture memo of the profile's 4 rows: the lifecycle run is
    * a ONE-TIME cost per corpus (like v11's training trace or d29's
    * merge table — bench pass 1 pays it, later passes read the memo),
    * and the catalog-wide plan sweeps in the test suite construct every
    * query several times — without the memo each sweep would re-run
    * four streaming queries just to look at a 4-row LocalTableScan.
    * The key carries the events fixture's recursive (path, length,
    * mtime) fingerprint — [[graft.operators.PersistedIndex
    * .sourceFingerprint]], the repo's canonical fixture identity, which
    * descends into directory-shaped parquet (a flat File.length on a
    * directory reads the inode size and misses in-place part-file
    * rewrites) — not the dir alone: a fixture regenerated in-place
    * mid-JVM must re-run the lifecycle, never serve the prior corpus's
    * numbers.
    */
  private val w29Cache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(String, Long, Long, Long)]]()

  private def w29CacheKey(spark: SparkSession, dir: String): String =
    s"$dir|" + graft.operators.PersistedIndex.sourceFingerprint(
      spark, Seq(s"$dir/events.parquet"))

  private def runW29Profile(
      caller: SparkSession, dir: String): Seq[(String, Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.Trigger
    // the profile runs on a PRIVATE session (shared SparkContext, own
    // SQL conf): the RocksDB providerClass below is profile-local, and
    // setting it on the caller's session would race any concurrent
    // streaming query on the shared session — that query would silently
    // pick up RocksDB (or its own conf-set would be clobbered by this
    // method's restore) depending on interleaving
    val spark = caller.newSession()
    // the streaming file source reads DIRECTORIES (the fixture is a
    // single parquet file): spool the ts-normalized table once — the
    // stand-in for the CDC transport's chunk directory — and stream it
    val spool = java.nio.file.Files.createTempDirectory("graft_w29_src")
    try {
      Tables.load(spark, dir, "events").write
        .mode("overwrite").parquet(spool.toString)
      val srcSchema = spark.read.parquet(spool.toString).schema
      def stream: DataFrame =
        spark.readStream.schema(srcSchema).parquet(spool.toString)
      val gapUs = 4L * 3600 * 1000000 // w17/w19's shared session bound
      val twins: Seq[(String, String, DataFrame => DataFrame)] = Seq(
        ("funnel", "funnel", s => graft.streaming.CdcStream
          .funnelStream(s, "user_id", "ts", "event_id", "event_type").toDF()),
        ("last_touch", "lastKey", s => graft.streaming.CdcStream
          .attributionStream(s, "user_id", "ts", "event_id", "event_type", gapUs).toDF()),
        ("decay_attribution", "open", s => graft.streaming.CdcStream
          .decayAttributionStream(s, "user_id", "ts", "event_id", "event_type", "value").toDF()),
        ("transition", "last", s => graft.streaming.CdcStream
          .transitionStream(s, "user_id", "ts", "event_id", "event_type", gapUs).toDF()))
      // profile-local conf on the private session — no restore dance
      // needed, and no other query can ever observe it
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val profile =
        twins.map { case (twin, stateVar, build) =>
          val ckptDir = java.nio.file.Files.createTempDirectory(s"graft_w29_$twin")
          try {
            // count emissions where they land (a distributed count per
            // micro-batch) — the profile never holds row-level data.
            // Keyed by batchId with last-write-wins, NOT a running
            // accumulator: a failed-and-retried micro-batch re-enters
            // foreachBatch with the same batchId, and an addAndGet would
            // double-count the delivery
            val emitted =
              new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Long]()
            val q = build(stream).writeStream
              .foreachBatch { (batch: DataFrame, batchId: Long) =>
                emitted.put(batchId, batch.count()); ()
              }
              .option("checkpointLocation", ckptDir.toString)
              .trigger(Trigger.AvailableNow())
              .start()
            q.awaitTermination()
            // evictions from the query's OWN progress metrics — the same
            // numbers a deployment dashboards. Zero here by construction
            // (profile twins run TTL-less and timer-less); the readout
            // is the point: StreamingOpsSpec drives the identical helper
            // past a real TTL expiry and asserts it counts
            val evicted =
              graft.streaming.QueryMonitor.stateEvictions(q.recentProgress.toSeq)
            // exact resident state: one row per live state KEY (the list
            // twin's elements flatten to rows; distinct keys is the
            // store-sizing number either way)
            val stateKeys = spark.read.format("statestore")
              .option("path", ckptDir.toString)
              .option("stateVarName", stateVar)
              .load()
              .select(col("key")).distinct().count()
            val emittedTotal = {
              var t = 0L
              emitted.values().forEach(v => t += v)
              t
            }
            (twin, stateKeys, emittedTotal, evicted)
          } finally {
            // reclaim the throwaway checkpoint (leaking one RocksDB
            // checkpoint per twin per corpus adds up)
            deleteTree(ckptDir)
          }
        }
      // 4 driver-held rows: sort in memory, not with a range exchange
      profile.sortBy(_._1)
    } finally deleteTree(spool)
  }

  /** w29's oracle derives every column per twin from the fixture alone
    * (`evicted_rows` is the constant 0 — the profile twins configure no
    * TTL and register no timers, so Spark's eviction metrics must read
    * zero; a nonzero value would mean state was silently dropped):
    * state keys by each twin's state rule (funnel/transition update on
    * EVERY event; last-touch only on view/click; decay holds the open
    * segment — touches after the user's last purchase in (us, event_id)
    * order); emitted rows by each twin's batch-rule emission count
    * (funnel: one row per reached stage 2 plus two per stage 3;
    * last-touch: every purchase emits exactly once — credit or 'none';
    * decay: per purchase, its segment's touch count capped at the
    * 20-touch zero-weight horizon, nothing when the segment is empty;
    * transition: one row per consecutive same-user pair under the 4h
    * gap bound).
    */
  val w29Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      |  FROM events),
      |f1 AS (
      |  SELECT user_id, event_type, us,
      |    MIN(CASE WHEN event_type = 'view' THEN us END)
      |      OVER (PARTITION BY user_id) AS t1
      |  FROM ev),
      |f2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
      |    OVER (PARTITION BY user_id) AS t2
      |  FROM f1),
      |f3 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
      |    OVER (PARTITION BY user_id) AS t3
      |  FROM f2),
      |fun AS (SELECT user_id, MAX(t2) AS t2, MAX(t3) AS t3
      |        FROM f3 GROUP BY user_id),
      |tr AS (
      |  SELECT us, LEAD(us) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id) AS nus
      |  FROM ev),
      |de AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY us, event_id) AS rn,
      |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seg
      |  FROM ev WHERE event_type IN ('view', 'click', 'purchase')),
      |dstate AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type <> 'purchase' THEN rn END) AS lt,
      |    MAX(CASE WHEN event_type = 'purchase' THEN rn END) AS lp
      |  FROM de GROUP BY user_id),
      |dtouch AS (SELECT user_id, seg, COUNT(*) AS ntouch FROM de
      |           WHERE event_type <> 'purchase' GROUP BY user_id, seg),
      |dem AS (
      |  SELECT COALESCE(SUM(LEAST(t.ntouch, 20)), 0) AS n
      |  FROM de p JOIN dtouch t
      |    ON p.user_id = t.user_id AND p.seg = t.seg
      |  WHERE p.event_type = 'purchase')
      |SELECT twin, state_keys, emitted_rows, evicted_rows FROM (
      |  SELECT 'funnel' AS twin,
      |    (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM ev)
      |      AS state_keys,
      |    (SELECT CAST(COALESCE(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
      |       + CASE WHEN t3 IS NOT NULL THEN 2 ELSE 0 END), 0) AS BIGINT)
      |     FROM fun) AS emitted_rows,
      |    CAST(0 AS BIGINT) AS evicted_rows
      |  UNION ALL
      |  SELECT 'last_touch',
      |    (SELECT CAST(COUNT(DISTINCT CASE
      |       WHEN event_type IN ('view', 'click') THEN user_id END) AS BIGINT)
      |     FROM ev),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ev
      |     WHERE event_type = 'purchase'),
      |    CAST(0 AS BIGINT)
      |  UNION ALL
      |  SELECT 'decay_attribution',
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM dstate
      |     WHERE lt IS NOT NULL AND (lp IS NULL OR lt > lp)),
      |    (SELECT CAST(n AS BIGINT) FROM dem),
      |    CAST(0 AS BIGINT)
      |  UNION ALL
      |  SELECT 'transition',
      |    (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM ev),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM tr
      |     WHERE nus IS NOT NULL AND nus - us < 14400000000),
      |    CAST(0 AS BIGINT)
      |) ORDER BY twin""".stripMargin

  val defs: Map[String, Q] = Map(
    "w30_bitmap_retention" -> (w30BitmapRetention _),
    "w29_state_profile" -> (w29StateProfile _),
    "w28_error_recovery" -> (w28ErrorRecovery _),
    "w27_association_rules" -> (w27AssociationRules _),
    "w26_sequence_patterns" -> (w26SequencePatterns _),
    "w25_time_to_convert" -> (w25TimeToConvert _),
    "w24_stickiness" -> (w24Stickiness _),
    "w23_decay_attribution" -> (w23DecayAttribution _),
    "w22_sketch_merge" -> (w22SketchMerge _),
    "w21_gap_histogram" -> (w21GapHistogram _),
    "w20_grouped_topk" -> (w20GroupedTopk _),
    "w19_last_touch" -> (w19LastTouch _),
    "w18_cms_heavy_hitters" -> (w18CmsHeavyHitters _),
    "w17_transition_matrix" -> (w17TransitionMatrix _),
    "w16_disorder_profile" -> (w16DisorderProfile _),
    "w15_anomaly" -> (w15Anomaly _),
    "w14_retention" -> (w14Retention _),
    "w13_funnel" -> (w13Funnel _),
    "w12_quantile_sketch" -> (w12QuantileSketch _),
    "w11_heavy_hitters" -> (w11HeavyHitters _),
    "w10_interval_join" -> (w10IntervalJoin _),
    "w9_partition_pruned" -> (w9PartitionPruned _),
    "w8_pivot_daily" -> (w8PivotDaily _),
    "w1_tumbling" -> (w1Tumbling _),
    "w2_sliding" -> (w2Sliding _),
    "w3_session" -> (w3Session _),
    "w4_json_extract" -> (w4JsonExtract _),
    "w5_asof_join" -> (w5AsofJoin _),
    "w6_range_activity" -> (w6RangeActivity _),
    "w7_distinct_sketch" -> (w7DistinctSketch _))

  val oracles: Map[String, String] = Map(
    "w30_bitmap_retention" -> w30Sql,
    "w29_state_profile" -> w29Sql,
    "w28_error_recovery" -> w28Sql,
    "w27_association_rules" -> w27Sql,
    "w26_sequence_patterns" -> w26Sql,
    "w25_time_to_convert" -> w25Sql,
    "w24_stickiness" -> w24Sql,
    "w23_decay_attribution" -> w23Sql,
    "w22_sketch_merge" -> w22Sql,
    "w21_gap_histogram" -> w21Sql,
    "w20_grouped_topk" -> w20Sql,
    "w19_last_touch" -> w19Sql,
    "w18_cms_heavy_hitters" -> w18Sql,
    "w17_transition_matrix" -> w17Sql,
    "w16_disorder_profile" -> w16Sql,
    "w15_anomaly" -> w15Sql,
    "w14_retention" -> w14Sql,
    "w13_funnel" -> w13Sql,
    "w12_quantile_sketch" -> w12Sql,
    "w11_heavy_hitters" -> w11Sql,
    "w10_interval_join" -> w10Sql,
    "w9_partition_pruned" -> w9Sql,
    "w8_pivot_daily" -> w8Sql,
    "w1_tumbling" -> w1Sql,
    "w2_sliding" -> w2Sql,
    "w3_session" -> w3Sql,
    "w4_json_extract" -> w4Sql,
    "w5_asof_join" -> w5Sql,
    "w6_range_activity" -> w6Sql,
    "w7_distinct_sketch" -> w7Sql)
}
