package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full operator catalog; every entry has (where
  * SQL-expressible) a DuckDB oracle in `oracleSql` with IDENTICAL output
  * column names, so the driver's sorted-column value-hash compare holds.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ Replication.defs ++ Events.defs ++
      Documents.defs ++ Vectors.defs ++ MultimodalQ.defs ++ Pipeline.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Replication.oracles ++ Events.oracles ++
      Documents.oracles ++ Vectors.oracles ++ MultimodalQ.oracles ++
      Pipeline.oracles
}
