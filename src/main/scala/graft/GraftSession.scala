package graft

import org.apache.spark.sql.SparkSession

/** The driver mains' canonical local session — ONE definition so Verify
  * validates exactly the configuration Bench measures. The bucketing
  * confs are load-bearing for the persisted-index plan shape (see
  * BlockedSelfJoin.pairsPersisted): a conf added to one main but not
  * the other would verify one engine and benchmark another, silently.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the persisted index/signature defaults re-read bucketed tables;
      // these two let the bucket LAYOUT carry the join/agg distribution
      // (exchange-free re-reads)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
}
