package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.SnapshotStore
import graft.queries.Documents

/** Streaming twin of the incremental-clustering family (VERDICT r13 #6):
  * documents ARRIVE as a stream and the near-dup cluster labels are
  * maintained continuously — d26's shard-at-a-time batch maintenance
  * made per-micro-batch. This closes the CDC loop the incremental
  * family's 100 TB story promises: the same signature index the batch
  * path appends shards into (`reference: replication/consumer/loader.py`
  * ingests per message batch; this engine's d20/d21/d26 ingest per
  * shard) is here appended per micro-batch, and labels converge to the
  * batch query's exact output.
  *
  * Per micro-batch:
  *  1. arriving docs are MinHash-signed with the shuffle-free
  *     projection form ([[Documents.streamingSignatures]] — identical
  *     output to the batch signer, StreamingOpsSpec-pinned);
  *  2. the signatures append into the arrived-signature store,
  *     anti-joined on doc_id first so an at-least-once re-delivery
  *     never double-writes a doc's rows (idempotent store);
  *  3. delta edges = [[Documents.streamNeardup]] of the WHOLE batch
  *     (not just its novel docs) against base ∪ arrived signatures —
  *     deliberately re-deriving a re-delivered doc's edges, because a
  *     crash BETWEEN the signature append and the star swap would
  *     otherwise lose them (the append-then-skip hazard); re-applied
  *     edges are a label no-op;
  *  4. the star table updates through the SAME code as batch d26
  *     ([[Documents.applyDeltaToStar]] — bit-identity by shared
  *     definition, the twin discipline of [[RetrievalStream]]), and
  *     lands via [[SnapshotStore]]'s staged atomic swap, so a crash
  *     mid-write re-delivers against the OLD star.
  *
  * State shape at 100 TB: per batch the work is |batch| signatures,
  * the touched-bucket candidate join, and the AFFECTED components'
  * re-convergence — never corpus-sized (the two-decade fixed-shard
  * gates measure exactly this bound on the shared batch path). The
  * only growing state is the signature store and the star table —
  * disk-resident build-once/append-many artifacts, not executor
  * memory; no per-key streaming state is held at all, so there is
  * nothing for a watermark to bound.
  */
object ClusterStream {

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Start continuous cluster maintenance. `incoming` is a streaming
    * (doc_id, text) frame; `baseSigs` the previous run's signature
    * table (doc_id, m, band, sig); `baseStar` its star labels
    * (id, comp). The arrived-signature store and the live star land
    * under `stateDir`.
    */
  def start(
      incoming: DataFrame,
      baseSigs: DataFrame,
      baseStar: DataFrame,
      stateDir: String,
      checkpointDir: String,
      ccFamily: String = "cc_stream",
      trigger: Trigger = Trigger.AvailableNow(),
      queryName: Option[String] = None): StreamingQuery = {
    val arrivedDir = s"$stateDir/arrived_sigs"
    val starDir = s"$stateDir/star"
    val writer = incoming.writeStream
    queryName.foreach(writer.queryName)
    writer
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // heal a crash inside a previous batch's star swap before
        // reading it. This is the WRITER healing its own table —
        // micro-batches are serialized, so the recover can never race a
        // live swap here (readers must NOT call it; see [[labels]])
        SnapshotStore.recoverInterruptedSwap(s, starDir)
        val batchDocs = batch.select(col("doc_id"), col("text"))
          .dropDuplicates("doc_id")
        // persist BEFORE the emptiness probe so the probe populates the
        // cache instead of re-executing the source read + dedup (the
        // same re-execution CdcStream's own batch persist exists to
        // avoid)
        batchDocs.persist()
        try {
          if (!batchDocs.isEmpty) {
            val arrivedBefore =
              if (exists(s, arrivedDir)) Some(s.read.parquet(arrivedDir))
              else None
            val sigs = Documents.streamingSignatures(batchDocs)
            val novel = arrivedBefore.fold(sigs)(a =>
              sigs.join(a.select("doc_id").distinct(), Seq("doc_id"), "left_anti"))
            novel.write.mode("append").parquet(arrivedDir)
            val allSigs = baseSigs.unionByName(s.read.parquet(arrivedDir))
            val edges = Documents.streamNeardup(batchDocs, allSigs)
              .select(col("doc_id").as("src"), col("dup_of").as("dst"))
            val star =
              if (exists(s, starDir)) SnapshotStore.readSnapshot(s, starDir)
              else baseStar
            // ONE family for every batch — freshTableRounds already
            // mints a unique per-run prefix inside it, and its orphan
            // sweep reclaims a CRASHED attempt's round dirs on a later
            // batch's build (a per-batch family would orphan them
            // forever: no later batch ever revisits that family)
            val updated =
              Documents.applyDeltaToStar(s, star, edges, ccFamily)
            SnapshotStore.writeSnapshot(s, updated, starDir)
            // the updated star is durably swapped in — this batch's CC
            // round tables have no remaining reader; reclaim them now
            s.catalog.listTables().collect().map(_.name)
              .filter(_.startsWith(ccFamily + "_"))
              .foreach(n => s.sql(s"DROP TABLE IF EXISTS $n"))
          }
        } finally batchDocs.unpersist()
        ()
      }
      .start()
  }

  /** The current labels view over the maintained star — d26's exact
    * output shape (cluster_id, doc_id, cluster_size, ordered), for
    * batch/stream identity checks and downstream readers.
    *
    * Readers do NOT heal an interrupted swap: recoverInterruptedSwap is
    * writer-context-only (a reader racing a live swap could promote the
    * staging dir and delete `.old` mid-rename, failing the streaming
    * writer from a pure read). A star left staged by a crash heals on
    * the stream's next start, before its first batch reads it.
    */
  def labels(spark: SparkSession, stateDir: String): DataFrame = {
    SnapshotStore.readSnapshot(spark, s"$stateDir/star")
      .select(col("comp").as("cluster_id"), col("id").as("doc_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .orderBy(col("cluster_id"), col("doc_id"))
  }
}
