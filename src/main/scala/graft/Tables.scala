package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access (driver parquet, see TESTDATA.md / FIXTURES.md §B).
  * In production these would be DataSource-V2 connectors to live
  * ArangoDB/ClickHouse; the operator layer only ever sees DataFrames, so
  * swapping the edge does not touch operator code (SURVEY §7.1).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read it as a long and floor-div to micros (the
      // fixture's nanos are exact micros; DuckDB does the same conversion).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view for spark.sql queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
