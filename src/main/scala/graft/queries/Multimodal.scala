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

  val defs: Map[String, Q] = Map(
    "m1_media_metadata" -> (m1MediaMetadata _),
    "m2_decode_features" -> (m2DecodeFeatures _))

  // m2 is intentionally absent here: mapPartitions decode is not
  // SQL-expressible -> rows-only check per the driver contract.
  val oracles: Map[String, String] = Map(
    "m1_media_metadata" -> m1Sql)
}
