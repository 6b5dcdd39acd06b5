package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot load with atomic swap (reference operator K3:
  * replication/replicator/store.py:25-49,86-90 — create `<T>Temp`,
  * bulk-load, DROP real, RENAME temp->real).
  *
  * The reference's drop-then-rename has a visibility gap (readers between
  * the two DDLs see no table). Here the swap is a filesystem rename into
  * place after a successful staging write, plus re-pointing the session
  * view — readers either see the old snapshot or the new one, never
  * neither. (On HDFS/object stores with atomic rename this is one metadata
  * op; table formats with transactional commit would subsume this.)
  */
object SnapshotStore {

  /** Write `df` to `<dir>.staging`, then atomically swap it into `dir`.
    * Returns the row count written (the reference returns processed-doc
    * counts from its snapshot loader, store.py:61-91).
    */
  def writeSnapshot(spark: SparkSession, df: DataFrame, dir: String): Long = {
    val staging = new Path(dir + ".staging")
    val live = new Path(dir)
    val old = new Path(dir + ".old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)

    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    val n = spark.read.parquet(staging.toString).count()

    fs.delete(old, true)
    if (fs.exists(live)) fs.rename(live, old)
    if (!fs.rename(staging, live))
      throw new IllegalStateException(s"snapshot swap failed for $dir")
    fs.delete(old, true)
    n
  }

  /** Load a snapshot dir and (re)register its read view. */
  def readSnapshot(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
