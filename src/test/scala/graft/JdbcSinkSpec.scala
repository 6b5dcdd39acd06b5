package graft

import java.nio.file.{Files, Path}

import graft.streaming.JdbcSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Live-sink edge over the one JDBC store this environment actually has:
  * Spark's own distribution ships Derby (its Hive-metastore dependency),
  * so the K2 live-sink path can execute against a REAL database
  * in-process instead of staying config-only. Derby is not ClickHouse —
  * no server-side ReplacingMergeTree collapse — but that is exactly the
  * division of labor under test: the reference, too, ships duplicates on
  * redelivery and relies on the TABLE ENGINE + FINAL read to collapse
  * them (clickhouse/connect.py:28-49 appends blindly). What the sink
  * must guarantee is the transport contract: micro-batches append
  * through `df.write.jdbc` with `batchsize`, the table is created on
  * first append, values/types survive the round trip, and at-least-once
  * redelivery lands as duplicate ROWS that the versioned read view
  * (V1's latest-wins) collapses — asserted here end to end.
  */
class JdbcSinkSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType),
    StructField("_ver", LongType)))

  private def writeBatch(dir: Path, name: String, rows: Seq[(Long, String, Long)]): Unit =
    Files.write(dir.resolve(name), rows
      .map { case (k, v, ver) => s"""{"k":$k,"v":"$v","_ver":$ver}""" }
      .mkString("\n").getBytes("UTF-8"))

  private def readBack(url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", "app").option("password", "app")
      .load()

  private def runStream(srcDir: Path, url: String, table: String, ckpt: Path): Unit = {
    val src = spark.readStream.schema(schema).json(srcDir.toString)
    val q = JdbcSink.start(src, url, table, user = "app", password = "app",
      checkpointDir = ckpt.toString, batchSize = 2)
    try q.processAllAvailable() finally q.stop()
  }

  test("micro-batches append into Derby and values survive the round trip") {
    val url = "jdbc:derby:memory:graft_rt;create=true"
    val srcDir = tmp("jdbc_src")
    writeBatch(srcDir, "b1.json", Seq((1L, "one", 11L), (2L, "two", 12L)))
    runStream(srcDir, url, "changes_rt", tmp("jdbc_ck"))
    // a second file = a second micro-batch through the SAME foreachBatch
    val src = spark.readStream.schema(schema).json(srcDir.toString)
    val q = JdbcSink.start(src, url, "changes_rt", "app", "app",
      tmp("jdbc_ck2").toString, batchSize = 2)
    try {
      q.processAllAvailable()
      writeBatch(srcDir, "b2.json", Seq((1L, "one-v2", 21L), (3L, "three", 22L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = readBack(url, "changes_rt")
      .select("k", "v", "_ver").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    // first stream delivered b1 once, the second redelivered b1 (fresh
    // checkpoint) and then b2: b1's rows appear twice — appends, not merges
    assert(got === Seq((1L, "one", 11L), (1L, "one", 11L),
      (1L, "one-v2", 21L), (2L, "two", 12L), (2L, "two", 12L),
      (3L, "three", 22L)).sorted,
      "JDBC round trip lost or altered rows")
  }

  test("redelivered duplicates collapse in the versioned read view, not the transport") {
    val url = "jdbc:derby:memory:graft_dup;create=true"
    val srcDir = tmp("jdbc_src2")
    writeBatch(srcDir, "b1.json", Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "c", 1L)))
    runStream(srcDir, url, "changes_dup", tmp("jdbc_ck3"))
    runStream(srcDir, url, "changes_dup", tmp("jdbc_ck4")) // fresh ckpt = replay
    val raw = readBack(url, "changes_dup")
    assert(raw.count() === 6, "replay must append duplicates (at-least-once)")
    // V1 latest-wins over the JDBC-backed table: same view as one delivery
    val current = graft.operators.ReplicaTable
      .current(raw.withColumn("_deleted", lit(0)), keys = Seq("k"), ver = "_ver")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq.sorted
    assert(current === Seq((1L, "b"), (2L, "c")),
      "versioned read view over the JDBC table diverged")
  }

  private def runUpsert(srcDir: Path, url: String, table: String, ckpt: Path): Unit = {
    val src = spark.readStream.schema(schema).json(srcDir.toString)
    val q = JdbcSink.startUpsert(src, url, table, keys = Seq("k"), verCol = "_ver",
      user = "app", password = "app", checkpointDir = ckpt.toString, batchSize = 2)
    try q.processAllAvailable() finally q.stop()
  }

  test("upsert mode: redelivery does not grow the raw table; view is value-exact") {
    val url = "jdbc:derby:memory:graft_up;create=true"
    val srcDir = tmp("jdbc_src3")
    // in-batch duplicate key (1): the batch collapses to its latest row
    // per key BEFORE the merge (two matches on one target row would be
    // an illegal MERGE), so only (1,"b",2) lands
    writeBatch(srcDir, "b1.json", Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "c", 1L)))
    runUpsert(srcDir, url, "changes_up", tmp("jdbc_ck5"))
    def rows() = readBack(url, "changes_up")
      .select("k", "v", "_ver").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(rows() === Seq((1L, "b", 2L), (2L, "c", 1L)),
      "first upsert batch did not land collapsed")

    // fresh checkpoint = full redelivery: in APPEND mode this doubles the
    // raw table (proven in the test above); upsert must leave it EXACT
    runUpsert(srcDir, url, "changes_up", tmp("jdbc_ck6"))
    assert(rows() === Seq((1L, "b", 2L), (2L, "c", 1L)),
      "redelivered batch grew or altered the upserted table")

    // steady state: a stale version is ignored row-wise, an advancing
    // version updates in place, a new key inserts
    writeBatch(srcDir, "b2.json",
      Seq((1L, "a-stale", 1L), (2L, "c2", 7L), (3L, "d", 5L)))
    runUpsert(srcDir, url, "changes_up", tmp("jdbc_ck7"))
    assert(rows() === Seq((1L, "b", 2L), (2L, "c2", 7L), (3L, "d", 5L)),
      "merge did not apply latest-wins per row")

    // the upserted table IS the read view: value-exact with what the
    // append-mode path + versioned collapse produces from the same log
    val appendUrl = "jdbc:derby:memory:graft_up_ref;create=true"
    runStream(srcDir, appendUrl, "changes_ref", tmp("jdbc_ck8"))
    val viaAppend = graft.operators.ReplicaTable
      .current(readBack(appendUrl, "changes_ref").withColumn("_deleted", lit(0)),
        keys = Seq("k"), ver = "_ver")
      .select("k", "v", "_ver").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(rows() === viaAppend,
      "upsert mode and append+collapse mode disagree on the current view")
  }

  test("upsert mode: NULL keys are merge-idempotent, not re-inserted per redelivery") {
    // plain `t.k = s.k` is UNKNOWN for NULL = NULL, so a NULL-keyed row
    // would be WHEN NOT MATCHED on EVERY redelivery and the raw table
    // would grow without bound — the exact failure upsert mode exists to
    // prevent; the ON clause must match null-safely
    val url = "jdbc:derby:memory:graft_upnull;create=true"
    val srcDir = tmp("jdbc_src4")
    Files.write(srcDir.resolve("b1.json"),
      Seq("""{"k":null,"v":"n","_ver":1}""", """{"k":1,"v":"a","_ver":1}""")
        .mkString("\n").getBytes("UTF-8"))
    runUpsert(srcDir, url, "changes_un", tmp("jdbc_ck9"))
    runUpsert(srcDir, url, "changes_un", tmp("jdbc_ck10")) // fresh ckpt = replay
    def rows() = readBack(url, "changes_un")
      .select("k", "v", "_ver").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1.getOrElse(Long.MinValue), t._3))
    assert(rows() === Seq((None, "n", 1L), (Some(1L), "a", 1L)),
      s"NULL-keyed row duplicated on redelivery: ${rows()}")
    // and the NULL key still advances in place like any other key
    Files.write(srcDir.resolve("b2.json"),
      Seq("""{"k":null,"v":"n2","_ver":5}""").mkString("\n").getBytes("UTF-8"))
    runUpsert(srcDir, url, "changes_un", tmp("jdbc_ck11"))
    assert(rows() === Seq((None, "n2", 5L), (Some(1L), "a", 1L)),
      "NULL-keyed row did not update in place")
  }
}
