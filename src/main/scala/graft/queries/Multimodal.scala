package graft.queries

import graft.Tables
import graft.operators.{Multimodal => M}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: documents' text bytes stand in for media
  * payloads (fixtures carry no binary table), exercising the
  * binary-column + metadata pipeline end-to-end.
  */
object MultimodalQ {

  type Q = (SparkSession, String) => DataFrame

  private def media(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      concat(lit("text/"), col("lang")).as("format"))

  /** Binary metadata extraction + per-format stats (codegen path). */
  def m1MediaMetadata(spark: SparkSession, dir: String): DataFrame =
    M.metadata(media(spark, dir))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("content_hash")).as("n_distinct"))
      .orderBy(col("format"))

  val m1Sql: String =
    """SELECT 'text/' || lang AS format, COUNT(*) AS n_media,
      |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
      |  COUNT(DISTINCT md5(text)) AS n_distinct
      |FROM documents GROUP BY 1 ORDER BY format""".stripMargin

  /** mapPartitions decode stub: not SQL-expressible (rows-only check);
    * proves the per-partition batch plumbing runs distributed.
    */
  def m2DecodeFeatures(spark: SparkSession, dir: String): DataFrame =
    M.decodeFeatures(media(spark, dir))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        avg(col("width")).as("avg_width"),
        avg(col("height")).as("avg_height"))
      .orderBy(col("format"))

  /** Frame sampling: 16-byte windows every 8 bytes over the payload —
    * the shape of video frame extraction (one row per sampled frame),
    * verified value-exact against blob slicing in the oracle.
    */
  def m3FrameSample(spark: SparkSession, dir: String): DataFrame = {
    // string payload: the fixture text is pure ASCII so char windows ==
    // byte windows, and DuckDB can replay the slicing (its substring is
    // VARCHAR-only); sampleFrames itself is type-generic (substr works
    // on binary payloads identically)
    val m = Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text").as("payload"))
    M.sampleFrames(m, frameSize = 16, stride = 8)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(md5(col("frame").cast("binary"))).as("n_distinct_frames"))
      .orderBy(col("media_id"))
  }

  val m3Sql: String =
    """WITH f AS (SELECT doc_id AS media_id,
      |        substring(text, (i - 1) * 8 + 1, 16) AS frame
      |      FROM documents, LATERAL (SELECT unnest(generate_series(1,
      |        CASE WHEN length(text) >= 16
      |             THEN (length(text) - 16) // 8 + 1 ELSE 0 END)) AS i))
      |SELECT media_id, COUNT(*) AS n_frames,
      |  COUNT(DISTINCT md5(frame)) AS n_distinct_frames
      |FROM f GROUP BY media_id ORDER BY media_id""".stripMargin

  val defs: Map[String, Q] = Map(
    "m1_media_metadata" -> (m1MediaMetadata _),
    "m2_decode_features" -> (m2DecodeFeatures _),
    "m3_frame_sample" -> (m3FrameSample _))

  // m2 is intentionally absent here: mapPartitions decode is not
  // SQL-expressible -> rows-only check per the driver contract.
  val oracles: Map[String, String] = Map(
    "m1_media_metadata" -> m1Sql,
    "m3_frame_sample" -> m3Sql)
}
