package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(18, scale))).cast("double")

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
    * `session_window` merges events whose gap is strictly less than the
    * gap duration; the oracle's gaps-and-islands breaks at `>=`.
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
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL '4 hours' THEN 1 ELSE 0 END brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |i AS (SELECT user_id, ts, value,
      |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) island
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

  val defs: Map[String, Q] = Map(
    "w1_tumbling" -> (w1Tumbling _),
    "w2_sliding" -> (w2Sliding _),
    "w3_session" -> (w3Session _),
    "w4_json_extract" -> (w4JsonExtract _))

  val oracles: Map[String, String] = Map(
    "w1_tumbling" -> w1Sql,
    "w2_sliding" -> w2Sql,
    "w3_session" -> w3Sql,
    "w4_json_extract" -> w4Sql)
}
