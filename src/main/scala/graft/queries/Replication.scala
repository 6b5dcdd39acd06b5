package graft.queries

import graft.Tables
import graft.config.{ColumnSpec, TableConfig}
import graft.operators.{Envelope, ReplicaTable, SchemaTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Replication-semantics queries: drive the engine's core operators
  * (ReplacingMergeTree dedup view, schema-mapping transform, CDC envelope)
  * over the `events` fixture so the DuckDB oracle can check them
  * value-for-value.
  *
  * The `events` table doubles as a CDC log: `event_id` is the
  * monotonically increasing version/offset (≙ WAL tick / Kafka offset),
  * `user_id` is the document key, and `event_type = 'error'` plays the
  * REMOVE op. This gives deterministic upsert/delete streams without
  * synthesizing data (fixtures are read-only).
  */
object Replication {

  type Q = (SparkSession, String) => DataFrame

  /** V1+V2: latest-version-wins dedup + soft-delete filter — the read view
    * a ClickHouse user gets from `ReplacingMergeTree(_ver)` FINAL +
    * `_deleted = 0` (SURVEY §2.5).
    */
  def r1ReplicaCurrent(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .withColumn("_deleted", (col("event_type") === "error").cast("int"))
    ReplicaTable.current(events, keys = Seq("user_id"), ver = "event_id")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  val r1Sql: String =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type, value AS last_value
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** P1: config-driven schema transform — rename via ref, multi-type cast
    * chain, JSON field extraction cast, default application, required/pk
    * enforcement. One codegen'd select (see SchemaTransform).
    */
  def r2SchemaTransform(spark: SparkSession, dir: String): DataFrame = {
    // the fixture arrives as ONE parquet split (single row group): spread
    // the json-parse + cast work across cores; the sort's sampling pass
    // re-evaluates the projection, so serial cost would be paid twice.
    // The lazy localCheckpoint stops PushDownPredicates from inlining the
    // validity array below the repartition onto the single split (same
    // barrier + rationale as r8_yaml_ddl_replica).
    val events = Tables.load(spark, dir, "events")
      .repartition(spark.sparkContext.defaultParallelism, col("event_id"))
      .withColumn("k_raw", get_json_object(col("props"), "$.k"))
      .localCheckpoint(false)
    val config = TableConfig(
      name = "EventFlat",
      columns = Seq(
        ColumnSpec("Id", Seq("int"), ref = Some("event_id"), primaryKey = true),
        ColumnSpec("UserId", Seq("int"), ref = Some("user_id"), required = true),
        ColumnSpec("Kind", Seq("str"), ref = Some("event_type"), required = true),
        ColumnSpec("K", Seq("int"), ref = Some("k_raw"), default = Some(-1L)),
        ColumnSpec("Amount", Seq("float"), ref = Some("value")),
        ColumnSpec("Channel", Seq("str"), ref = Some("channel"), default = Some("unknown"))))
    SchemaTransform(events, config).valid.orderBy(col("Id"))
  }

  val r2Sql: String =
    """SELECT event_id AS Id,
      |  user_id AS UserId,
      |  event_type AS Kind,
      |  COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS K,
      |  value AS Amount,
      |  'unknown' AS Channel
      |FROM events
      |ORDER BY Id""".stripMargin

  /** P2+F1+F2+F3: full envelope path. Events are reshaped into WAL-style
    * records (txn markers, removes, tombstones included), then run through
    * op-filter, tombstone filter, tick high-pass and `_ver`/`_deleted`
    * synthesis with an injected clock (the reference's wall-clock
    * `%Y%j`+offset formula, loader.py:76, reproduced exactly).
    */
  def r3Envelope(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .repartition(spark.sparkContext.defaultParallelism, col("event_id"))
    // deterministic WAL shaping: signup -> txn marker (filtered), error ->
    // REMOVE, rest -> UPSERT; every 50th click becomes a tombstone.
    val wal = events.select(
      col("event_id").as("offset"),
      col("event_id").cast("string").as("tick"),
      when(col("event_type") === "signup", lit(2200))
        .when(col("event_type") === "error", lit(Envelope.OpRemove))
        .otherwise(lit(Envelope.OpUpsert)).as("type"),
      lit("c1").as("cuid"),
      when(col("event_type") === "click" && col("event_id") % 50 === 0, lit(null))
        .otherwise(to_json(struct(col("user_id"), col("value")))).as("data"))
    val filtered = Envelope.opFilter(wal, collectionIds = Seq("c1"))
    val dataSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))
    Envelope.preProcess(filtered, dataSchema,
        initialTick = Some(100L),
        clock = lit("2024-01-01").cast("timestamp"))
      .orderBy(col("offset"))
  }

  val r3Sql: String =
    """SELECT event_id AS "offset", user_id, value,
      |  CAST('2024001' || CAST(event_id AS VARCHAR) AS BIGINT) AS _ver,
      |  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS _deleted
      |FROM events
      |WHERE event_type <> 'signup'
      |  AND NOT (event_type = 'click' AND event_id % 50 = 0)
      |  AND event_id >= 100
      |ORDER BY "offset"""".stripMargin

  /** Idempotent merge: re-applying a change batch on top of an already
    * merged table is a no-op (the at-least-once + idempotent-sink contract,
    * SURVEY §2.10). The query output is the merged state after applying the
    * last 1000 events as a change batch TWICE — the oracle describes the
    * once-applied state, so a hash match proves idempotence.
    */
  def r4IdempotentMerge(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .withColumn("_deleted", (col("event_type") === "error").cast("int"))
    val base = events.filter(col("event_id") < 9000)
    val changes = events.filter(col("event_id") >= 9000)
    val once = ReplicaTable.applyChanges(base, changes, keys = Seq("user_id"), ver = "event_id")
    val twice = ReplicaTable.applyChanges(once, changes, keys = Seq("user_id"), ver = "event_id")
    twice.filter(col("_deleted") === 0)
      .select(col("user_id"), col("event_id").as("last_event_id"), col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  val r4Sql: String =
    """SELECT user_id, event_id AS last_event_id, value AS last_value
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** SQL over the registered dedup view (SURVEY §4 custom-work item 1):
    * users write plain SQL against `events_current` and transparently get
    * ReplacingMergeTree-FINAL + soft-delete semantics — no window/version
    * predicates in user queries.
    */
  def r5ReplicaSql(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .withColumn("_deleted", (col("event_type") === "error").cast("int"))
    ReplicaTable.registerView(events, "events_current",
      keys = Seq("user_id"), ver = "event_id")
    spark.sql(
      """SELECT event_type AS last_type, COUNT(*) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_last_value
        |FROM events_current
        |GROUP BY event_type ORDER BY last_type""".stripMargin)
  }

  val r5Sql: String =
    """SELECT event_type AS last_type, COUNT(*) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_last_value
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 AND event_type <> 'error'
      |GROUP BY event_type ORDER BY last_type""".stripMargin

  /** Transparent FINAL (SURVEY §4 custom-work item 1, full form): the table
    * is DECLARED a replica at DDL time ([[ReplicaTable.createTable]] writes
    * the contract into TBLPROPERTIES) and plain SQL against the RAW table
    * name returns the merged, tombstone-free state — no view registration,
    * no window predicate, nothing session-local. The rewrite is
    * [[graft.plans.ReplicaFinalRule]], injected by [[graft.GraftExtensions]].
    * The second append replays the tail of the batch, so a hash match
    * against the once-applied oracle also proves at-least-once idempotence
    * through the DDL + catalog path.
    */
  def r7TransparentFinal(spark: SparkSession, dir: String): DataFrame = {
    val versioned = Tables.load(spark, dir, "events").select(
      col("user_id").as("UserId"),
      col("event_type").as("Kind"),
      col("value").as("Amount"),
      col("event_id").as("_ver"),
      (col("event_type") === "error").cast("int").as("_deleted"))
    val cfg = TableConfig("events_replica", Seq(
      ColumnSpec("UserId", Seq("int"), primaryKey = true),
      ColumnSpec("Kind", Seq("str")),
      ColumnSpec("Amount", Seq("float"))))
    ReplicaTable.createTable(spark, cfg, numBuckets = 8) // create-or-replace
    ReplicaTable.appendBatch(versioned, cfg, numBuckets = 8)
    ReplicaTable.appendBatch(versioned.filter(col("_ver") >= 9000), cfg, numBuckets = 8)
    spark.sql(
      """SELECT Kind AS last_type, COUNT(*) AS n_users,
        |       CAST(SUM(CAST(Amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_last_value
        |FROM events_replica
        |GROUP BY Kind ORDER BY last_type""".stripMargin)
  }

  val r7Sql: String =
    """SELECT event_type AS last_type, COUNT(*) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_last_value
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 AND event_type <> 'error'
      |GROUP BY event_type ORDER BY last_type""".stripMargin

  /** The YAML a user would write for the r8 table — exercises the three
    * cast families the first config table (r5/r7) didn't: `from_datetime`
    * (ISO string -> timestamp), the `to_array` CUSTOM transformer
    * (reference tables/transform.py:1-8), and an ordered multi-type
    * fallback chain `[float, str]` (reference transformer.py:84-92 —
    * first cast that succeeds wins), plus a `default` on a field the
    * source never carries. Parsed by the same [[ConfigYaml]] loader the
    * reference's yaml files go through (ConfigYamlSpec pins the parse).
    */
  val r8Yaml: String =
    """table_name: event_profile
      |schema:
      |  primary_key: Id
      |  properties:
      |    Id:
      |      type: int
      |      ref: event_id
      |      required: true
      |    At:
      |      type: from_datetime
      |      ref: ts_iso
      |    Tags:
      |      type: to_array
      |      ref: tag_csv
      |    KV:
      |      type: [float, str]
      |      ref: kv
      |    Chan:
      |      type: str
      |      ref: channel
      |      default: unknown
      |""".stripMargin

  /** Second config-declared table through the full DDL path (VERDICT r2
    * #6): YAML -> [[ConfigYaml.tableConfig]] -> bucketed CREATE with the
    * replica TBLPROPERTIES -> [[SchemaTransform]] append (tail replayed
    * once, proving at-least-once idempotence) -> plain SQL on the RAW
    * table name, merged transparently by ReplicaFinalRule. The aggregate
    * touches every exercised cast: timestamps (min/max At), the split
    * array (element_at + size), the fallback result (distinct KV mixes
    * the float-branch "87.0" strings with the str-branch event types by
    * id parity), and the defaulted Chan.
    */
  def r8YamlDdlReplica(spark: SparkSession, dir: String): DataFrame = {
    val cfg = graft.config.ConfigYaml.tableConfig(r8Yaml)
    // The fixture arrives as ONE parquet split (single row group), and
    // PushDownPredicates inlines SchemaTransform's whole validity array
    // below any repartition onto that split — serializing the heavy
    // parse work onto one task. The lazy localCheckpoint is a plan
    // barrier: the projected source materializes once across all cores
    // and the validity filter runs parallel above it. (At real scale the
    // pushed-down reject filter is the RIGHT plan — many input splits
    // parallelize it and rejects never reach the shuffle; the barrier
    // compensates for the fixture's un-splittable layout.)
    val source = Tables.load(spark, dir, "events")
      .repartition(spark.sparkContext.defaultParallelism, col("event_id"))
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_iso"),
        concat(col("event_type"), lit(","),
          get_json_object(col("props"), "$.k")).as("tag_csv"),
        when(col("event_id") % 2 === 0, get_json_object(col("props"), "$.k"))
          .otherwise(col("event_type")).as("kv"))
      .localCheckpoint(false)
    ReplicaTable.createTable(spark, cfg, numBuckets = 8)
    val rows = SchemaTransform(source, cfg).valid
      .withColumn(cfg.versionColumn, col("Id"))
      .withColumn(cfg.deletedColumn, lit(0))
    ReplicaTable.appendBatch(rows, cfg, numBuckets = 8)
    ReplicaTable.appendBatch(rows.filter(col("Id") % 10 === 0), cfg, numBuckets = 8)
    spark.sql(
      """SELECT element_at(Tags, 1) AS tag0, Chan,
        |  COUNT(*) AS n, COUNT(DISTINCT KV) AS n_kv,
        |  MIN(At) AS first_at, MAX(At) AS last_at,
        |  CAST(SUM(size(Tags)) AS BIGINT) AS total_tags
        |FROM event_profile GROUP BY tag0, Chan ORDER BY tag0""".stripMargin)
  }

  val r8Sql: String =
    """WITH p AS (
      |  SELECT event_id AS Id, ts AS At,
      |    str_split(event_type || ',' || json_extract_string(props, '$.k'), ',') AS Tags,
      |    CASE WHEN event_id % 2 = 0
      |         THEN CAST(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS VARCHAR)
      |         ELSE event_type END AS KV,
      |    'unknown' AS Chan
      |  FROM events)
      |SELECT Tags[1] AS tag0, Chan, COUNT(*) AS n, COUNT(DISTINCT KV) AS n_kv,
      |  MIN(At) AS first_at, MAX(At) AS last_at,
      |  CAST(SUM(len(Tags)) AS BIGINT) AS total_tags
      |FROM p GROUP BY tag0, Chan ORDER BY tag0""".stripMargin

  /** The FULL §3.1 replication lifecycle as an oracle-checked query (the
    * r2-verdict item 5 gate): tick capture -> snapshot through the schema
    * transform (atomic swap) -> overlapping CDC replay from the captured
    * tick -> steady-state continuation on the SAME checkpoint -> versioned
    * read view. Everything the SyncSpec fixtures exercise, but over the
    * real `events` fixture with a DuckDB oracle on the converged table.
    *
    * Timeline (ids are dense 0..n-1; cuts scale with the fixture):
    *  - pre-history  [0, cutB):   folded into the collection state —
    *    the per-user latest row is what the snapshot scan sees;
    *  - WAL chunk A  [cutA, cutB): on disk BEFORE the resync, so the
    *    captured tick is cutB-1; F3 high-passes everything below it and
    *    REPLAYS exactly the cutB-1 row — the snapshot/CDC overlap row,
    *    which must collapse idempotently (its CDC `_ver` > snapshot 0);
    *  - WAL chunk B  [cutB, n):   written after the resync drains, applied
    *    by a continuation query on the same checkpoint; `error` events are
    *    REMOVE ops -> tombstones the read view must hide.
    *
    * WAL-fixture synthesis (the transport that already exists in a real
    * deployment) is a Spark text write funneled through one partition and
    * renamed into [[graft.sources.WalSource]]'s `wal-<lo>-<hi>.json`
    * layout contract — NO driver-side collect anywhere (VERDICT r5 item
    * 6), so the chunk size is bounded by executor disk, not driver heap,
    * at any SF. The operators under test (snapshot write, streaming
    * pipeline, dedup view) all run distributed.
    */
  def r6ResyncE2e(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Files
    import org.apache.spark.sql.expressions.Window
    import scala.jdk.CollectionConverters._
    val events = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val stats = events.agg(
      max(col("event_id")), min(col("event_id")), count(lit(1))).head()
    val n = stats.getLong(0) + 1
    require(stats.getLong(1) == 0L && stats.getLong(2) == n,
      s"resync timeline assumes dense event_id 0..n-1; got min=${stats.get(1)} " +
        s"count=${stats.get(2)} max+1=$n")
    val cutA = n * 9 / 10
    val cutB = n * 19 / 20
    val base = Files.createTempDirectory("r6_resync")
    val walDir = Files.createDirectories(base.resolve("wal"))
    val tableDir = base.resolve("table").toString
    val ckpt = base.resolve("ck").toString

    def writeChunk(lo: Long, hi: Long): Unit = {
      // to_json's double formatting is Jackson's Double.toString — the
      // shortest round-tripping form, so values survive
      // parquet -> JSON -> from_json bit-exactly
      val payload = to_json(
        struct(col("user_id").as("u"), col("value").as("v")),
        Map("ignoreNullFields" -> "false"))
      val line = to_json(
        struct(
          col("event_id").as("offset"),
          col("event_id").cast("string").as("tick"),
          when(col("event_type") === "error", lit(Envelope.OpRemove))
            .otherwise(lit(Envelope.OpUpsert)).as("type"),
          lit("d").as("db"), lit("c1").as("cuid"), lit("t").as("tid"),
          payload.as("data")),
        Map("ignoreNullFields" -> "false"))
      val tmp = base.resolve(s"chunk-$lo-$hi").toString
      events
        .filter(col("event_id") >= lo && col("event_id") <= hi)
        .repartition(1).sortWithinPartitions(col("event_id"))
        .select(line.as("value"))
        .write.mode("overwrite").text(tmp)
      // promote the single part file into the WAL source's layout
      // contract (chunk files are NAMED by their tick range)
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(tmp, "part-*")).head.getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(
        walDir.toString, s"wal-$lo-$hi.json"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }

    val cfg = TableConfig("UserState", Seq(
      ColumnSpec("UserId", Seq("int"), ref = Some("u"), primaryKey = true),
      ColumnSpec("LastValue", Seq("float"), ref = Some("v"))))
    val payloadSchema = StructType(Seq(
      StructField("u", LongType), StructField("v", DoubleType)))
    val clock = lit("2024-01-01").cast("timestamp")
    val wv = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    val collection = events.filter(col("event_id") < cutB)
      .withColumn("rn", row_number().over(wv)).filter(col("rn") === 1)
      .select(col("user_id").as("u"), col("value").as("v"))

    writeChunk(cutA, cutB - 1)
    def wal = spark.readStream.format("graft.sources.WalSource").load(walDir.toString)
    val r = graft.streaming.Sync.resync(spark, collection, wal, walDir.toString,
      cfg, payloadSchema, tableDir, ckpt, collectionIds = Seq("c1"), clock = clock)
    r.query.awaitTermination()
    require(r.initialTick == cutB - 1, s"captured tick ${r.initialTick} != ${cutB - 1}")

    writeChunk(cutB, n - 1)
    val q2 = graft.streaming.CdcStream.startReplication(wal, cfg, payloadSchema,
      tableDir, ckpt, collectionIds = Seq("c1"),
      initialTick = Some(r.initialTick), clock = clock)
    q2.awaitTermination()

    graft.streaming.CdcStream.currentView(spark, tableDir, keys = Seq("UserId"))
      .select(col("UserId"), col("LastValue"))
      .orderBy(col("UserId"))
  }

  /** Oracle twin: snapshot = per-user latest below cutB; CDC = per-user
    * latest at/above cutB, plus the single replayed overlap row (tick
    * cutB-1) for users with no later change; CDC beats snapshot, and an
    * `error`-typed CDC winner is a tombstone (row hidden).
    */
  val r6Sql: String =
    """WITH m AS (SELECT max(event_id) + 1 AS n FROM events),
      |pre AS (
      |  SELECT user_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events, m WHERE event_id < (n * 19) // 20),
      |snap AS (SELECT user_id, value FROM pre WHERE rn = 1),
      |overlap AS (
      |  SELECT user_id, event_type, value FROM events, m
      |  WHERE event_id = (n * 19) // 20 - 1),
      |post AS (
      |  SELECT user_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events, m WHERE event_id >= (n * 19) // 20),
      |cdc AS (
      |  SELECT user_id, event_type, value FROM post WHERE rn = 1
      |  UNION ALL
      |  SELECT user_id, event_type, value FROM overlap o
      |  WHERE NOT EXISTS (SELECT 1 FROM post p WHERE p.user_id = o.user_id)),
      |fin AS (
      |  SELECT COALESCE(c.user_id, s.user_id) AS uid,
      |    CASE WHEN c.user_id IS NOT NULL THEN c.value ELSE s.value END AS val,
      |    c.event_type AS typ
      |  FROM snap s FULL JOIN cdc c ON s.user_id = c.user_id)
      |SELECT uid AS UserId, val AS LastValue FROM fin
      |WHERE typ IS NULL OR typ <> 'error'
      |ORDER BY UserId""".stripMargin

  /** r9: SCD2 history + point-in-time lookup over the CDC stream — the
    * time-travel read the latest-wins replica (r1) deliberately throws
    * away. Each change record becomes a validity interval
    * [ver_from, ver_to) via one per-key `lead` window (half-open, so
    * intervals tile each key's timeline with no gaps/overlaps by
    * construction); `is_current` marks the open interval of non-deleted
    * keys — r1's FINAL view is exactly `is_current = 1` — and
    * `asof_5000` materializes one point-in-time query (state AS OF
    * version 5000: the interval containing v5000, minus soft deletes).
    * The reference's ReplacingMergeTree keeps only the winner;
    * ClickHouse users reach for exactly this interval rewrite when they
    * need history (a standard SCD2 derivation, e.g. Kimball DW ch. 5).
    *
    * Scale shape: ONE hash exchange on the replication key + a per-key
    * sort — the same partitioning every CDC consumer already has; the
    * as-of flag is a pure projection on top (any number of as-of
    * versions are more flag columns on the same window, NOT more
    * passes). History at 100 TB writes bucketed-by-key like the
    * replica table, so the window re-reads exchange-free.
    */
  def r9Scd2History(spark: SparkSession, dir: String): DataFrame = {
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ver_from"))
    val asofVer = 5000L
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id").as("ver_from"),
        col("event_type"), col("value"),
        // when/otherwise, not a bare boolean cast: a NULL event_type must
        // yield 0 like the oracle's CASE ... ELSE 0 (nullable schema —
        // the fixtures happen to have no NULLs, so the gate can't catch
        // the bare cast's NULL propagation)
        when(col("event_type") === "error", 1L).otherwise(0L).as("deleted"))
      .withColumn("ver_to", lead(col("ver_from"), 1).over(wk))
      .select(col("user_id"), col("ver_from"), col("ver_to"),
        col("event_type"), col("value"), col("deleted"),
        (col("ver_to").isNull && col("deleted") === 0).cast("long").as("is_current"),
        (col("ver_from") <= asofVer &&
          coalesce(col("ver_to"), lit(Long.MaxValue)) > asofVer &&
          col("deleted") === 0).cast("long").as("asof_5000"))
      .orderBy(col("user_id"), col("ver_from"))
  }

  val r9Sql: String =
    """SELECT user_id, event_id AS ver_from,
      |  LEAD(event_id) OVER w AS ver_to,
      |  event_type, value,
      |  CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS BIGINT) AS deleted,
      |  CAST(CASE WHEN LEAD(event_id) OVER w IS NULL
      |            AND event_type <> 'error' THEN 1 ELSE 0 END AS BIGINT) AS is_current,
      |  CAST(CASE WHEN event_id <= 5000
      |            AND COALESCE(LEAD(event_id) OVER w, 9223372036854775807) > 5000
      |            AND event_type <> 'error' THEN 1 ELSE 0 END AS BIGINT) AS asof_5000
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |ORDER BY user_id, ver_from""".stripMargin

  /** One compaction fold: collapse (previous compacted state ∪ a raw
    * change window) to latest-wins per key while ACCUMULATING how many
    * raw rows each key has absorbed. Same ArgMaxRow ObjectHashAggregate
    * shape as [[ReplicaTable.latest]] (no per-key window sort), plus the
    * running `nv` sum in the same aggregation.
    */
  private def compactFold(u: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    val payload = struct(col("event_id"), col("event_type"), col("value"),
      col("_deleted"))
    val argMax = ColumnShim.column(
      graft.functions.ArgMaxRow(
        ColumnShim.expression(struct(col("event_id"))),
        ColumnShim.expression(payload)).toAggregateExpression())
    u.groupBy(col("user_id"))
      .agg(argMax.as("_row"), sum(col("nv")).as("nv"))
      .select(col("user_id"), col("_row.event_id").as("event_id"),
        col("_row.event_type").as("event_type"), col("_row.value").as("value"),
        col("_row._deleted").as("_deleted"), col("nv"))
  }

  /** r10: INCREMENTAL replica compaction — the batch form of the
    * background merge ClickHouse's ReplacingMergeTree runs continuously
    * (the reference leans on it for correctness and never sees the
    * cost; SURVEY §2.5). The change log is folded one retention window
    * (calendar week of `ts`) at a time: compacted state so far ∪ the
    * window's raw rows → latest-wins per key, with per-key absorbed-row
    * counts (`n_versions`) carried along — the figure a capacity plan
    * reads. Latest-wins is associative and commutative, so the windowed
    * fold provably equals the one-shot collapse over the full log — the
    * oracle IS the one-shot form, making that equality the correctness
    * gate rather than a comment.
    *
    * Tombstones are RETAINED in the compacted table (dropping one would
    * let a lower-versioned row resurrect in a later window — the
    * classic compaction bug); the read view (r1) filters them. Output
    * is the compacted table itself, tombstones visible.
    *
    * Scale shape: per window, cost is |state| + |window| through ONE
    * hash exchange on the key (ObjectHashAggregate, map-side partials —
    * no per-key window sort anywhere); at 100 TB state and windows are
    * bucketed by key on durable storage, so each fold re-reads
    * exchange-free (BucketingSpec's layout; localCheckpoint stands in
    * here). The driver loop over windows is bounded by retention
    * (weeks), not data; each window's rows are touched exactly once —
    * against the oracle's full-log re-scan, which is the recompaction a
    * production system cannot afford.
    */
  def r10IncrementalCompaction(spark: SparkSession, dir: String): DataFrame = {
    val log = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("_deleted"),
        lit(1L).as("nv"),
        date_trunc("week", col("ts")).as("wk"))
    val weeks = log.select(col("wk")).distinct().orderBy(col("wk"))
      .collect().map(_.getTimestamp(0)) // bounded by retention, not data
    // The retention assumption made checkable: each week is one sequential
    // Spark job, so an unbounded span (a 10-year log fed in whole) would
    // degenerate into thousands of serial folds. A real deployment feeds
    // this a retention-bounded slice; 3 years of weekly windows is the
    // documented ceiling, and crossing it should fail loudly here rather
    // than crawl.
    require(weeks.length <= 156,
      s"r10 fold spans ${weeks.length} weekly windows (> 156 = 3y retention);" +
        " compact coarser windows or feed a retention-bounded log slice")
    var state: DataFrame = null
    for (w <- weeks) {
      val delta = log.filter(col("wk") === lit(w)).drop("wk")
      state = compactFold(if (state == null) delta else state.unionByName(delta))
        .localCheckpoint(false)
    }
    state
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("_deleted"), col("nv").as("n_versions"))
      .orderBy(col("user_id"))
  }

  /** r10's oracle is the ONE-SHOT collapse over the full log — equality
    * with the windowed fold is exactly the associativity claim.
    */
  val r10Sql: String =
    """SELECT user_id, last_event_id, last_type, last_value, _deleted, n_versions
      |FROM (
      |  SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |    value AS last_value,
      |    CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS BIGINT) AS _deleted,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_versions,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** r11: mid-stream SCHEMA EVOLUTION — the replication concern the
    * reference's fixed column configs cannot express (its schema map
    * `config/table_config.py` is frozen at deploy time): the upstream
    * adds a column, so the log's older half simply DOESN'T HAVE it, and
    * the replica read path must still produce one unified current view.
    *
    * The fixture log splits at the cutover tick (max(event_id) DIV 2 —
    * data-derived to stay SF-free; a real pipeline reads the tick from
    * its schema registry): generation 1 rows have no `k` column AT ALL,
    * generation 2 rows carry `k` extracted from the payload. The merge
    * is Spark's own schema-evolution primitive —
    * `unionByName(allowMissingColumns = true)` — which backfills gen-1
    * with typed NULLs (exactly what a parquet `mergeSchema` read does
    * across old and new files), then the ordinary ArgMaxRow latest-wins
    * collapse runs over the unified log. A user whose latest record
    * predates the cutover surfaces with `k IS NULL` and
    * `schema_ver = 1` — absence stays observable, never invented.
    *
    * Scale: the generations are disjoint id ranges (at 100 TB they are
    * literally different files), so the two branch scans together read
    * each row once; the cutover scalar broadcasts (q22's shape), and
    * the only log-keyed shuffle is the latest-wins collapse.
    */
  def r11SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val cut = events.agg(expr("max(event_id) DIV 2").as("cut"))
    val g1 = events.crossJoin(broadcast(cut))
      .filter(col("event_id") < col("cut"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), lit(1L).as("schema_ver"))
    val g2 = events.crossJoin(broadcast(cut))
      .filter(col("event_id") >= col("cut"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), lit(2L).as("schema_ver"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    val unified = g1.unionByName(g2, allowMissingColumns = true)
      .withColumn("_deleted", (col("event_type") === "error").cast("int"))
    ReplicaTable.current(unified, keys = Seq("user_id"), ver = "event_id")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("k"), col("schema_ver"))
      .orderBy(col("user_id"))
  }

  val r11Sql: String =
    """WITH cut AS (SELECT max(event_id) // 2 AS cut FROM events),
      |u AS (
      |  SELECT user_id, event_id, event_type, value,
      |    CAST(NULL AS BIGINT) AS k, CAST(1 AS BIGINT) AS schema_ver
      |  FROM events, cut WHERE event_id < cut
      |  UNION ALL
      |  SELECT user_id, event_id, event_type, value,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT), CAST(2 AS BIGINT)
      |  FROM events, cut WHERE event_id >= cut)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  value AS last_value, k, schema_ver
      |FROM (SELECT *, ROW_NUMBER() OVER (
      |        PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM u)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** r12: source↔replica checksum RECONCILIATION — the nightly audit the
    * reference never runs (it trusts ClickHouse's merge; a production
    * replication operator runs pt-table-checksum's read daily): prove
    * the replica equals the source per key-range bucket WITHOUT shipping
    * either table. The "source view" is the one-shot latest-wins
    * collapse of the log; the "replica view" is built through the
    * INDEPENDENT path — r10's windowed compaction fold — so the audit is
    * a real cross-check of two materialization pipelines, and a healthy
    * log yields is_match = 1 in every bucket (r10's associativity
    * theorem, now verified row-by-row via fingerprints instead of
    * asserted once in a spec).
    *
    * Scale: each side folds to a 16-row (bucket, count, bit_xor
    * checksum) grid — order-independent, overflow-free, partitioning-
    * independent — and only the grids join. See
    * [[graft.operators.ReplicaTable.checksumAudit]].
    */
  def r12ChecksumAudit(spark: SparkSession, dir: String): DataFrame = {
    val log = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"))
    val source = ReplicaTable.latest(log, keys = Seq("user_id"), ver = "event_id")
    val replica = r10IncrementalCompaction(spark, dir)
      .select(col("user_id"), col("last_event_id").as("event_id"),
        col("last_type").as("event_type"))
    ReplicaTable.checksumAudit(source, replica, "user_id",
      Seq("user_id", "event_id", "event_type"), nBuckets = 16)
  }

  /** The oracle replays ONE collapse (windowed == one-shot is r10's
    * proven theorem) and derives both sides' grids from it.
    */
  val r12Sql: String = {
    // the audit's injective row encoding (see ReplicaTable.checksumAudit):
    // '~'->'~~', '|'->'~|' per value, NULL -> '~0', then '|'-joined —
    // identical bytes to the engine's digest on every engine
    def enc(v: String) =
      s"coalesce(replace(replace(CAST($v AS VARCHAR), '~', '~~'), '|', '~|'), '~0')"
    val h = graft.queries.Documents.signedBeMd5Sql(
      s"${enc("user_id")} || '|' || ${enc("event_id")} || '|' || ${enc("event_type")}")
    s"""WITH cur AS (
      |  SELECT user_id, event_id, event_type FROM (
      |    SELECT user_id, event_id, event_type,
      |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
      |    FROM events)
      |  WHERE rn = 1),
      |g AS (SELECT ((user_id % 16) + 16) % 16 AS bucket,
      |        COUNT(*) AS n, bit_xor($h) AS cks
      |      FROM cur GROUP BY 1)
      |SELECT bucket, n AS n_rows_src, n AS n_rows_rep,
      |  cks AS checksum_src, cks AS checksum_rep, CAST(1 AS BIGINT) AS is_match
      |FROM g ORDER BY bucket""".stripMargin
  }

  /** r13: REFERENTIAL-CONSISTENCY AUDIT — the cross-table half of the
    * reconciliation story r12's per-table checksums leave open: after
    * replicating a multi-collection graph, verify the replicas still
    * form a closed foreign-key graph (a replica set where lineitem
    * references orders the sync dropped is "row-complete" per table and
    * still unusable). One row per FK edge: child rows/keys, orphan
    * rows/keys — all zeros is the invariant a healthy replica set
    * reports, and the orphan counts localize WHICH edge broke when a
    * partial resync or out-of-order table cutover violates it.
    *
    * Scale shape: each edge costs one distinct on the parent key + one
    * left join + one ONE-ROW agg; dimension parents (nation, region)
    * broadcast explicitly, fact-fact edges shuffle on the key they'd
    * join on anyway. Edges are independent — at 100 TB they schedule
    * as parallel jobs, and the output is |edges| rows.
    */
  def r13ReferentialAudit(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.load(spark, dir, n)
    def edge(childName: String, child: DataFrame, fk: String,
             parentName: String, parent: DataFrame, pk: String,
             bcast: Boolean): DataFrame = {
      val pkeys0 = parent.select(col(pk).as("__pk")).distinct()
      val pkeys = if (bcast) broadcast(pkeys0) else pkeys0
      // collapse the child to (key, multiplicity) BEFORE the join: the
      // probe side shrinks from |child| rows to |keys|, the groupBy's
      // map-side combine does the heavy reduction, its output
      // partitioning feeds the join without a re-shuffle, and the
      // count_distinct Expand disappears (keys are unique by
      // construction after the collapse) — warm A/B vs the raw-child
      // join: 2.26 vs 2.63 s minima at sf0.1, and at 100 TB the joined
      // frame is the fact table's key space instead of the fact table
      child.groupBy(col(fk).as("__k")).agg(count(lit(1)).as("__cnt"))
        .join(pkeys, col("__k") === col("__pk"), "left")
        // every sum coalesced: over an EMPTY child frame sum() is NULL
        // where the oracle's COUNT/SUM-of-CASE forms give 0 (r12
        // session-diff review caught the two orphan sums missing it)
        .agg(coalesce(sum(col("__cnt")), lit(0L)).as("n_child_rows"),
          count(col("__k")).as("n_child_keys"),
          coalesce(sum(when(col("__pk").isNull, col("__cnt")).otherwise(0L)),
            lit(0L)).as("n_orphan_rows"),
          coalesce(sum(when(col("__pk").isNull && col("__k").isNotNull, 1L)
            .otherwise(0L)), lit(0L)).as("n_orphan_keys"))
        .select(lit(childName).as("child_table"), lit(fk).as("fk"),
          lit(parentName).as("parent_table"),
          col("n_child_rows"), col("n_child_keys"),
          col("n_orphan_rows"), col("n_orphan_keys"))
    }
    Seq(
      edge("lineitem", t("lineitem"), "l_orderkey", "orders", t("orders"), "o_orderkey", bcast = false),
      edge("lineitem", t("lineitem"), "l_partkey", "part", t("part"), "p_partkey", bcast = false),
      edge("lineitem", t("lineitem"), "l_suppkey", "supplier", t("supplier"), "s_suppkey", bcast = false),
      edge("orders", t("orders"), "o_custkey", "customer", t("customer"), "c_custkey", bcast = false),
      edge("customer", t("customer"), "c_nationkey", "nation", t("nation"), "n_nationkey", bcast = true),
      edge("supplier", t("supplier"), "s_nationkey", "nation", t("nation"), "n_nationkey", bcast = true),
      edge("nation", t("nation"), "n_regionkey", "region", t("region"), "r_regionkey", bcast = true))
      .reduce(_ unionByName _)
      .orderBy(col("child_table"), col("fk"))
  }

  val r13Sql: String = {
    def edge(child: String, fk: String, parent: String, pk: String) =
      s"""SELECT '$child' AS child_table, '$fk' AS fk, '$parent' AS parent_table,
        |  COUNT(*) AS n_child_rows,
        |  CAST(COUNT(DISTINCT c.$fk) AS BIGINT) AS n_child_keys,
        |  CAST(SUM(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_orphan_rows,
        |  CAST(COUNT(DISTINCT CASE WHEN p.__pk IS NULL THEN c.$fk END) AS BIGINT)
        |    AS n_orphan_keys
        |FROM $child c LEFT JOIN (SELECT DISTINCT $pk AS __pk FROM $parent) p
        |  ON c.$fk = p.__pk""".stripMargin
    Seq(
      edge("lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders", "o_custkey", "customer", "c_custkey"),
      edge("customer", "c_nationkey", "nation", "n_nationkey"),
      edge("supplier", "s_nationkey", "nation", "n_nationkey"),
      edge("nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY child_table, fk")
  }

  /** r14: BATCH-COMMIT LEDGER — the per-batch audit of the K2 batched
    * exactly-once insert path (reference consumer flushes fixed-size
    * batches; `replication/consumer/worker.py` commits offsets only after
    * the insert lands): slice the WAL into 1000-offset commit batches and
    * report each batch's op mix (upserts / removes / skipped markers+
    * tombstones — r3's deterministic shaping rules), its offset span, and
    * the running applied-row total. The table an operator reads to answer
    * "which batch did the row count jump / the lag start" — and the
    * idempotence ledger r4 checks a re-delivered batch against.
    *
    * Scale shape: ONE map-side-combined hash agg on `offset DIV 1000`
    * (a contiguous integer key — no skew by construction); everything
    * after runs on |batches| rows (~WAL span / 1000), not on events.
    * The running total is a TWO-LEVEL prefix sum (p15's shard-offset
    * discipline): per-block partials on `batch_id DIV 1024`, an
    * exclusive prefix window over the |blocks|-row frame (WAL span /
    * ~10^6 — genuinely tiny, the one ordered pass), broadcast back,
    * then a per-block cumulative window partitioned on the block key.
    * At 100 TB the WAL is ~10^11 offsets → ~10^8 ledger rows: a naive
    * `Window.orderBy(batch_id)` would funnel all of them through ONE
    * WindowExec task; here the heavy cumulation is keyed on ~10^5
    * blocks and the single-partition pass sees only block partials.
    */
  def r14BatchLedger(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val op = when(col("event_type") === "signup", lit("marker"))
      .when(col("event_type") === "click" && col("event_id") % 50 === 0,
        lit("tombstone"))
      .when(col("event_type") === "error", lit("remove"))
      .otherwise(lit("upsert"))
    val blockSize = 1024L
    val ledger = Tables.load(spark, dir, "events")
      .select(col("event_id").as("offset"), op.as("op"))
      .groupBy(expr("offset DIV 1000").as("batch_id"))
      .agg(
        sum(when(col("op") === "upsert", 1L).otherwise(0L)).as("n_upserts"),
        sum(when(col("op") === "remove", 1L).otherwise(0L)).as("n_removes"),
        sum(when(col("op") === "marker" || col("op") === "tombstone", 1L)
          .otherwise(0L)).as("n_skipped"),
        min(col("offset")).as("first_offset"),
        max(col("offset")).as("last_offset"))
      .withColumn("blk", expr(s"batch_id DIV $blockSize"))
      .withColumn("delta", col("n_upserts") - col("n_removes"))
      // barrier: the ledger has TWO consumers (block partials + the join
      // side); without it each re-derives the batch agg from its own
      // corpus scan (d36's discipline — corpus touched once)
      .localCheckpoint(false)
    val blockOffsets = ledger
      .groupBy(col("blk")).agg(sum(col("delta")).as("blk_delta"))
      .withColumn("blk_off", coalesce(sum(col("blk_delta")).over(
        Window.orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("blk"), col("blk_off"))
    val wInBlock = Window.partitionBy(col("blk")).orderBy(col("batch_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ledger.join(broadcast(blockOffsets), "blk")
      .withColumn("applied_cum",
        col("blk_off") + sum(col("delta")).over(wInBlock))
      .select(col("batch_id"), col("n_upserts"), col("n_removes"),
        col("n_skipped"), col("first_offset"), col("last_offset"),
        col("applied_cum"))
      .orderBy(col("batch_id"))
  }

  val r14Sql: String =
    """WITH b AS (
      |  SELECT event_id // 1000 AS batch_id, event_id AS "offset",
      |    CASE WHEN event_type = 'signup' THEN 'marker'
      |         WHEN event_type = 'click' AND event_id % 50 = 0 THEN 'tombstone'
      |         WHEN event_type = 'error' THEN 'remove'
      |         ELSE 'upsert' END AS op
      |  FROM events),
      |g AS (
      |  SELECT batch_id,
      |    SUM(CASE WHEN op = 'upsert' THEN 1 ELSE 0 END) AS n_upserts,
      |    SUM(CASE WHEN op = 'remove' THEN 1 ELSE 0 END) AS n_removes,
      |    SUM(CASE WHEN op IN ('marker', 'tombstone') THEN 1 ELSE 0 END)
      |      AS n_skipped,
      |    MIN("offset") AS first_offset, MAX("offset") AS last_offset
      |  FROM b GROUP BY batch_id)
      |SELECT CAST(batch_id AS BIGINT) AS batch_id,
      |  CAST(n_upserts AS BIGINT) AS n_upserts,
      |  CAST(n_removes AS BIGINT) AS n_removes,
      |  CAST(n_skipped AS BIGINT) AS n_skipped,
      |  CAST(first_offset AS BIGINT) AS first_offset,
      |  CAST(last_offset AS BIGINT) AS last_offset,
      |  CAST(SUM(n_upserts - n_removes) OVER (ORDER BY batch_id) AS BIGINT)
      |    AS applied_cum
      |FROM g ORDER BY batch_id""".stripMargin

  /** r15: AS-OF (point-in-time) replica read — reconstruct the replica
    * at a historical WAL offset T and diff it against the head state:
    * per key bucket, keys live at T, live now, changed/created/deleted
    * since. The operational answers a versioned log exists to give
    * ("what did the table look like before the bad deploy?", "how much
    * churn since the snapshot?") that the reference's ClickHouse target
    * cannot — FINAL reads serve only the head. T is data-derived
    * (head DIV 2) to stay SF-free; a real caller passes a tick.
    *
    * Scale shape: BOTH states come out of ONE user_id exchange — the
    * aggregate computes max(struct(ver, del)) twice, unconditionally
    * and gated on ver <= T (max ignores the nulls) — so time travel
    * costs exactly the V1 FINAL collapse, not a second corpus pass;
    * the cutoff scalar broadcasts (q22's shape) and the bucket rollup
    * + sort ride |keys|-then-|buckets| frames.
    */
  def r15AsofRead(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("del"))
    val cut = ev.agg(expr("max(event_id) DIV 2").as("cut"))
    ev.crossJoin(broadcast(cut))
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("event_id"), col("del"))).as("n"),
        max(when(col("event_id") <= col("cut"),
          struct(col("event_id"), col("del")))).as("t"))
      .select(col("user_id"),
        col("n.event_id").as("vn"), col("n.del").as("dn"),
        col("t.event_id").as("vt"), col("t.del").as("dt"))
      .groupBy((col("user_id") % 8).as("bucket"))
      .agg(
        sum(when(col("vt").isNotNull && col("dt") === 0, 1L).otherwise(0L))
          .as("n_keys_asof"),
        sum(when(col("dn") === 0, 1L).otherwise(0L)).as("n_keys_now"),
        sum(when(col("vt").isNotNull && col("dt") === 0 && col("dn") === 0 &&
          col("vn") > col("vt"), 1L).otherwise(0L)).as("n_changed_since"),
        sum(when(col("dn") === 0 && (col("vt").isNull || col("dt") === 1), 1L)
          .otherwise(0L)).as("n_created_since"),
        sum(when(col("vt").isNotNull && col("dt") === 0 && col("dn") === 1, 1L)
          .otherwise(0L)).as("n_deleted_since"))
      .orderBy(col("bucket"))
  }

  val r15Sql: String =
    """WITH c AS (SELECT MAX(event_id) // 2 AS cut FROM events),
      |e AS (SELECT user_id, event_id,
      |        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS del
      |      FROM events),
      |g AS (SELECT user_id,
      |        MAX(event_id) AS vn, arg_max(del, event_id) AS dn,
      |        MAX(event_id) FILTER (event_id <= cut) AS vt,
      |        arg_max(del, event_id) FILTER (event_id <= cut) AS dt
      |      FROM e, c GROUP BY user_id)
      |SELECT CAST(user_id % 8 AS BIGINT) AS bucket,
      |  CAST(SUM(CASE WHEN vt IS NOT NULL AND dt = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_keys_asof,
      |  CAST(SUM(CASE WHEN dn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_now,
      |  CAST(SUM(CASE WHEN vt IS NOT NULL AND dt = 0 AND dn = 0 AND vn > vt
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed_since,
      |  CAST(SUM(CASE WHEN dn = 0 AND (vt IS NULL OR dt = 1)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_created_since,
      |  CAST(SUM(CASE WHEN vt IS NOT NULL AND dt = 0 AND dn = 1
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted_since
      |FROM g GROUP BY 1 ORDER BY bucket""".stripMargin

  /** r16: TOMBSTONE RETENTION / GC REPORT — the cleanup read the soft-
    * delete design (V2) eventually owes: `_deleted=1` rows must be
    * RETAINED by compaction (r10 plants the revival bug that dropping
    * one causes) but not forever — once the replay low-water mark has
    * passed a tombstone's version, no event below it can ever arrive,
    * so the key's whole history is physically collectable (ClickHouse
    * answers this with TTL + `OPTIMIZE ... CLEANUP`; the reference's
    * readers just filter `_deleted` and the garbage accrues unbounded).
    * Per key bucket: live keys, tombstoned keys, tombstones already
    * safe to collect at the horizon T (= max version DIV 2, SF-free; a
    * real caller passes the checkpoint low-water mark), and the
    * reclaimable share — the table a retention policy is sized from.
    *
    * Scale shape: r15's discipline — ONE user_id exchange computes the
    * latest-state collapse (max(struct(ver, del)) ignores nulls), the
    * GC classification is a projection on the collapsed |keys| frame,
    * and the rollup + sort ride |buckets| rows. The horizon scalar
    * broadcasts (q22's shape).
    */
  def r16TombstoneGc(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("del"))
    val cut = ev.agg(expr("max(event_id) DIV 2").as("cut"))
    ev.crossJoin(broadcast(cut))
      .groupBy(col("user_id"))
      .agg(max(struct(col("event_id"), col("del"))).as("n"),
        max(col("cut")).as("cut"))
      .select(col("user_id"), col("n.event_id").as("ver"),
        col("n.del").as("del"), col("cut"))
      .groupBy((col("user_id") % 8).as("bucket"))
      .agg(
        sum(when(col("del") === 0, 1L).otherwise(0L)).as("n_live"),
        sum(when(col("del") === 1, 1L).otherwise(0L)).as("n_tombstones"),
        sum(when(col("del") === 1 && col("ver") <= col("cut"), 1L)
          .otherwise(0L)).as("n_gc_eligible"))
      .withColumn("reclaim_ppm",
        expr("n_gc_eligible * 1000000L DIV (n_live + n_tombstones)"))
      .orderBy(col("bucket"))
  }

  val r16Sql: String =
    """WITH c AS (SELECT MAX(event_id) // 2 AS cut FROM events),
      |e AS (SELECT user_id, event_id,
      |        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS del
      |      FROM events),
      |g AS (SELECT user_id, MAX(event_id) AS ver,
      |        arg_max(del, event_id) AS del, MAX(cut) AS cut
      |      FROM e, c GROUP BY user_id),
      |b AS (
      |  SELECT CAST(user_id % 8 AS BIGINT) AS bucket,
      |    SUM(CASE WHEN del = 0 THEN 1 ELSE 0 END) AS n_live,
      |    SUM(CASE WHEN del = 1 THEN 1 ELSE 0 END) AS n_tombstones,
      |    SUM(CASE WHEN del = 1 AND ver <= cut THEN 1 ELSE 0 END)
      |      AS n_gc_eligible
      |  FROM g GROUP BY 1)
      |SELECT bucket, CAST(n_live AS BIGINT) AS n_live,
      |  CAST(n_tombstones AS BIGINT) AS n_tombstones,
      |  CAST(n_gc_eligible AS BIGINT) AS n_gc_eligible,
      |  CAST(n_gc_eligible * 1000000 // (n_live + n_tombstones) AS BIGINT)
      |    AS reclaim_ppm
      |FROM b ORDER BY bucket""".stripMargin

  /** r17: BATCH FRESHNESS — the consumer-lag profile of the batched
    * insert path. The reference coalesces the change stream into
    * batches (buffer tables / micro-batch triggers) and its monitor
    * alerts on lag; this query quantifies the STALENESS that batching
    * itself introduces: within each 1000-offset commit batch (r14's
    * convention), an event's lag is the gap between its own time and
    * the batch's sealing event (the max event time the batch waited
    * for). The banded rollup is the freshness SLA table an operator
    * reads ("99% of rows land under a minute stale; the tail is the
    * backfill batches").
    *
    * Scale shape: ONE batch-keyed exchange serves the sealing-time
    * window; the band rollup is a hash agg with map-side combine and
    * the share window runs on the 5-row band frame.
    */
  def r17BatchFreshness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wb = Window.partitionBy(col("batch_id"))
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("batch_id", expr("event_id DIV 1000"))
      .withColumn("lag_us", max(col("ts_us")).over(wb) - col("ts_us"))
    val band = when(col("lag_us") === 0, "0_sealing_event")
      .when(col("lag_us") < 60L * 1000000, "1_under_1m")
      .when(col("lag_us") < 3600L * 1000000, "2_under_1h")
      .when(col("lag_us") < 86400L * 1000000, "3_under_1d")
      .otherwise("4_over_1d")
    ev.groupBy(band.as("lag_band"))
      .agg(count(lit(1)).as("n_events"), max(col("lag_us")).as("max_lag_us"))
      .withColumn("share_ppm",
        expr("n_events * 1000000L DIV sum(n_events) OVER ()"))
      .orderBy(col("lag_band"))
  }

  val r17Sql: String =
    """WITH e AS (
      |  SELECT event_id, epoch_us(ts) AS ts_us, event_id // 1000 AS batch_id
      |  FROM events),
      |l AS (
      |  SELECT MAX(ts_us) OVER (PARTITION BY batch_id) - ts_us AS lag_us
      |  FROM e),
      |b AS (
      |  SELECT CASE WHEN lag_us = 0 THEN '0_sealing_event'
      |       WHEN lag_us < 60000000 THEN '1_under_1m'
      |       WHEN lag_us < 3600000000 THEN '2_under_1h'
      |       WHEN lag_us < 86400000000 THEN '3_under_1d'
      |       ELSE '4_over_1d' END AS lag_band, lag_us
      |  FROM l),
      |g AS (SELECT lag_band, COUNT(*) AS n_events,
      |        MAX(lag_us) AS max_lag_us
      |      FROM b GROUP BY 1)
      |SELECT lag_band, n_events, CAST(max_lag_us AS BIGINT) AS max_lag_us,
      |  CAST(n_events * 1000000 // SUM(n_events) OVER () AS BIGINT)
      |    AS share_ppm
      |FROM g ORDER BY lag_band""".stripMargin

  /** r18: schema NARROWING + WIDENING mid-stream — the other real
    * migration r11's column-addition case leaves unproven: upstream
    * DROPS a column and WIDENS a type at the cutover. Generation 1
    * (event_id < cut) is the "old deployment": it stored `amount` as
    * whole integer units (BIGINT — truncated from the raw value, the
    * planted arithmetic that makes the widening observable) and carried
    * a `legacy_flag` column; generation 2 stores `amount` as DOUBLE and
    * dropped `legacy_flag` entirely. The unified read —
    * [[graft.operators.SchemaEvolution.unionEvolved]] — reads both
    * generations at the widened type (gen-1 amounts surface as exact
    * .0 doubles) and keeps the dropped column observable as typed NULL
    * on gen-2 rows, then the ordinary latest-wins collapse runs over
    * the unified log. A user whose latest record is gen-2 shows
    * `legacy_flag IS NULL` (absence, never invented); a gen-1-latest
    * user keeps the old integral semantics.
    *
    * Scale: like r11 — disjoint generations scan once each, the
    * unification itself is pure projection (no shuffle), the cutover
    * scalar broadcasts, and the only log-keyed exchange is the
    * latest-wins collapse.
    */
  def r18SchemaNarrowing(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val cut = events.agg(expr("max(event_id) DIV 2").as("cut"))
    val g1 = events.crossJoin(broadcast(cut))
      .filter(col("event_id") < col("cut"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value").cast("long").as("amount"), // old schema: integer units
        (col("value") >= 50).cast("long").as("legacy_flag"), // dropped in gen 2
        lit(1L).as("schema_ver"))
    val g2 = events.crossJoin(broadcast(cut))
      .filter(col("event_id") >= col("cut"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value").as("amount"), // widened to double
        lit(2L).as("schema_ver"))
    val unified = graft.operators.SchemaEvolution.unionEvolved(Seq(g1, g2))
      .withColumn("_deleted", (col("event_type") === "error").cast("int"))
    ReplicaTable.current(unified, keys = Seq("user_id"), ver = "event_id")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("amount"),
        col("legacy_flag"), col("schema_ver"))
      .orderBy(col("user_id"))
  }

  /** The oracle hand-performs the widen (trunc → BIGINT → DOUBLE, the
    * same truncate-toward-zero both engines) and the NULL backfill.
    */
  val r18Sql: String =
    """WITH cut AS (SELECT max(event_id) // 2 AS cut FROM events),
      |u AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(CAST(trunc(value) AS BIGINT) AS DOUBLE) AS amount,
      |    CAST(value >= 50 AS BIGINT) AS legacy_flag,
      |    CAST(1 AS BIGINT) AS schema_ver
      |  FROM events, cut WHERE event_id < cut
      |  UNION ALL
      |  SELECT user_id, event_id, event_type, value AS amount,
      |    CAST(NULL AS BIGINT) AS legacy_flag, CAST(2 AS BIGINT)
      |  FROM events, cut WHERE event_id >= cut)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  amount, legacy_flag, schema_ver
      |FROM (SELECT *, ROW_NUMBER() OVER (
      |        PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM u)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** r19: NESTED type widening mid-stream — the migration the r18
    * top-level case leaves unproven, exercising the recursive struct
    * ladder in [[graft.operators.SchemaEvolution.widen]] end to end on
    * the catalog. Generation 1 (event_id < cut) stores a `meta`
    * struct whose `units` field is BIGINT (truncated — the planted
    * arithmetic that makes the widening observable); generation 2
    * stores the SAME struct shape with `units` widened to DOUBLE. The
    * unified read widens `struct<units:bigint,tag:string>` vs
    * `struct<units:double,tag:string>` to the wide form RECURSIVELY
    * (same field names, same order — the positional-hazard directions
    * that must fail loudly stay spec-pinned in SchemaEvolutionSpec),
    * then the ordinary latest-wins collapse runs and the output
    * projects the nested fields flat for the oracle compare.
    *
    * Scale: r18's shape exactly — disjoint generation scans, pure
    * projection unification (the struct cast is positional, no column
    * rebuild), broadcast cutover scalar, one log-keyed exchange for
    * the collapse.
    */
  def r19NestedWidening(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val cut = events.agg(expr("max(event_id) DIV 2").as("cut"))
    val g1 = events.crossJoin(broadcast(cut))
      .filter(col("event_id") < col("cut"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        struct(
          col("value").cast("long").as("units"), // old nested: integer units
          upper(col("event_type")).as("tag")).as("meta"),
        lit(1L).as("schema_ver"))
    val g2 = events.crossJoin(broadcast(cut))
      .filter(col("event_id") >= col("cut"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        struct(
          col("value").as("units"), // nested field widened to double
          upper(col("event_type")).as("tag")).as("meta"),
        lit(2L).as("schema_ver"))
    val unified = graft.operators.SchemaEvolution.unionEvolved(Seq(g1, g2))
      .withColumn("_deleted", (col("event_type") === "error").cast("int"))
    ReplicaTable.current(unified, keys = Seq("user_id"), ver = "event_id")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("meta.units").as("units"), col("meta.tag").as("tag"),
        col("schema_ver"))
      .orderBy(col("user_id"))
  }

  /** The oracle hand-performs the nested widen flat (trunc → BIGINT →
    * DOUBLE, r18's truncate-toward-zero) — DuckDB never needs the
    * struct, because the query's own output projects the fields flat.
    */
  val r19Sql: String =
    """WITH cut AS (SELECT max(event_id) // 2 AS cut FROM events),
      |u AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(CAST(trunc(value) AS BIGINT) AS DOUBLE) AS units,
      |    upper(event_type) AS tag, CAST(1 AS BIGINT) AS schema_ver
      |  FROM events, cut WHERE event_id < cut
      |  UNION ALL
      |  SELECT user_id, event_id, event_type, value AS units,
      |    upper(event_type), CAST(2 AS BIGINT)
      |  FROM events, cut WHERE event_id >= cut)
      |SELECT user_id, event_id AS last_event_id, units, tag, schema_ver
      |FROM (SELECT *, ROW_NUMBER() OVER (
      |        PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM u)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  val defs: Map[String, Q] = Map(
    "r19_nested_widening" -> (r19NestedWidening _),
    "r18_schema_narrowing" -> (r18SchemaNarrowing _),
    "r17_batch_freshness" -> (r17BatchFreshness _),
    "r16_tombstone_gc" -> (r16TombstoneGc _),
    "r15_asof_read" -> (r15AsofRead _),
    "r14_batch_ledger" -> (r14BatchLedger _),
    "r13_referential_audit" -> (r13ReferentialAudit _),
    "r12_checksum_audit" -> (r12ChecksumAudit _),
    "r11_schema_evolution" -> (r11SchemaEvolution _),
    "r10_incremental_compaction" -> (r10IncrementalCompaction _),
    "r9_scd2_history" -> (r9Scd2History _),
    "r8_yaml_ddl_replica" -> (r8YamlDdlReplica _),
    "r6_resync_e2e" -> (r6ResyncE2e _),
    "r1_replica_current" -> (r1ReplicaCurrent _),
    "r5_replica_sql" -> (r5ReplicaSql _),
    "r7_transparent_final" -> (r7TransparentFinal _),
    "r2_schema_transform" -> (r2SchemaTransform _),
    "r3_envelope" -> (r3Envelope _),
    "r4_idempotent_merge" -> (r4IdempotentMerge _))

  val oracles: Map[String, String] = Map(
    "r19_nested_widening" -> r19Sql,
    "r18_schema_narrowing" -> r18Sql,
    "r17_batch_freshness" -> r17Sql,
    "r16_tombstone_gc" -> r16Sql,
    "r15_asof_read" -> r15Sql,
    "r14_batch_ledger" -> r14Sql,
    "r13_referential_audit" -> r13Sql,
    "r12_checksum_audit" -> r12Sql,
    "r11_schema_evolution" -> r11Sql,
    "r10_incremental_compaction" -> r10Sql,
    "r9_scd2_history" -> r9Sql,
    "r8_yaml_ddl_replica" -> r8Sql,
    "r6_resync_e2e" -> r6Sql,
    "r1_replica_current" -> r1Sql,
    "r5_replica_sql" -> r5Sql,
    "r7_transparent_final" -> r7Sql,
    "r2_schema_transform" -> r2Sql,
    "r3_envelope" -> r3Sql,
    "r4_idempotent_merge" -> r4Sql)
}
