package graft

import java.nio.file.{Files, Path}
import graft.config.{ColumnSpec, TableConfig}
import graft.operators.SnapshotStore
import graft.streaming.CdcStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end Structured Streaming replication: snapshot + CDC stream ->
  * append table -> dedup read view. Ports the semantics of the reference's
  * replay/idempotence test (test/test_producer.py:28-58: an un-acked batch
  * is re-served and must not corrupt state) and the snapshot/CDC overlap
  * handoff (replication/replicator/store.py:51-58).
  */
class CdcStreamSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private val config = TableConfig(
    name = "Doc",
    columns = Seq(
      ColumnSpec("K", Seq("int"), ref = Some("k"), primaryKey = true),
      ColumnSpec("V", Seq("float"), ref = Some("v"), default = Some(0.0))))

  private val payloadSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def walLine(offset: Long, tick: Long, opType: Int, cuid: String, data: String): String =
    s"""{"offset":$offset,"tick":"$tick","type":$opType,"db":"d","cuid":"$cuid","tid":"t","data":${
      if (data == null) "null" else "\"" + data.replace("\"", "\\\"") + "\""}}"""

  /** Fixed clock so _ver = 2024001<offset> deterministically. */
  private val clock = lit("2024-01-01").cast("timestamp")

  private def writeWal(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes)

  private def runOnce(walDir: Path, tableDir: Path, ckpt: Path): Unit = {
    val q = CdcStream.startReplication(
      CdcStream.walFileSource(spark, walDir.toString),
      config, payloadSchema,
      tableDir.toString, ckpt.toString,
      collectionIds = Seq("c1"), initialTick = Some(10L), clock = clock)
    q.awaitTermination()
  }

  private def current(tableDir: Path): DataFrame =
    CdcStream.currentView(spark, tableDir.toString, keys = Seq("K"))

  test("snapshot + CDC batches converge to latest-version state") {
    val walDir = tmp("wal"); val tableDir = tmp("tbl"); val ckpt = tmp("ckpt")

    // snapshot: keys 1,2 at _ver below any CDC version
    import spark.implicits._
    val snap = Seq((5L, 1L, 1.0, 20240010L, 0), (6L, 2L, 2.0, 20240010L, 0))
      .toDF("offset", "K", "V", "_ver", "_deleted")
    SnapshotStore.writeSnapshot(spark, snap, tableDir.toString)

    writeWal(walDir, "b1.json", Seq(
      walLine(11, 11, 2300, "c1", """{"k": 1, "v": "1.5"}"""), // upsert key 1
      walLine(12, 12, 2300, "c1", """{"k": 3, "v": "3.0"}"""), // insert key 3
      walLine(13, 13, 2200, "c1", """{"k": 9, "v": "9.9"}"""), // txn marker: dropped (F1)
      walLine(14, 14, 2300, "c2", """{"k": 8, "v": "8.8"}"""), // foreign collection: dropped (F1)
      walLine(15, 5, 2300, "c1", """{"k": 7, "v": "7.7"}"""),  // below snapshot tick: dropped (F3)
      walLine(16, 16, 2300, "c1", null)))                       // tombstone: dropped (F2)
    writeWal(walDir, "b2.json", Seq(
      walLine(21, 21, 2302, "c1", """{"k": 2, "v": "2.0"}"""), // delete key 2
      walLine(22, 22, 2300, "c1", """{"k": 1, "v": "1.9"}"""))) // second upsert key 1

    runOnce(walDir, tableDir, ckpt)

    val got = current(tableDir).select("K", "V").orderBy("K")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // key 1 -> latest upsert (offset 22), key 2 -> deleted, key 3 -> inserted
    assert(got === Seq((1L, 1.9), (3L, 3.0)))
  }

  test("replay of the whole stream is idempotent (at-least-once + versioned sink)") {
    val walDir = tmp("wal"); val tableDir = tmp("tbl"); val ckpt1 = tmp("ck1")

    writeWal(walDir, "b1.json", Seq(
      walLine(11, 11, 2300, "c1", """{"k": 1, "v": "1.5"}"""),
      walLine(12, 12, 2302, "c1", """{"k": 2, "v": "0"}"""),
      walLine(13, 13, 2300, "c1", """{"k": 2, "v": "2.5"}""")))

    runOnce(walDir, tableDir, ckpt1)
    val once = current(tableDir).select("K", "V").orderBy("K")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // fresh checkpoint = full replay: every append lands AGAIN (duplicate
    // rows in storage), yet the read view must not change
    runOnce(walDir, tableDir, tmp("ck2"))
    val twice = current(tableDir).select("K", "V").orderBy("K")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    assert(once === Seq((1L, 1.5), (2L, 2.5)))
    assert(twice === once)
    // and the raw table really does hold duplicates (proves the view, not
    // the transport, is what dedups)
    assert(spark.read.parquet(tableDir.toString).count() > 3)
  }

  test("sink commit ledger: a re-delivered batchId is not appended twice") {
    val walDir = tmp("wal"); val ckpt = tmp("ck")
    writeWal(walDir, "b1.json", Seq(
      walLine(11, 11, 2300, "c1", """{"k": 1, "v": "1.5"}""")))

    // normal run: data lands and the batch marker is written
    val t1 = tmp("tbl1")
    runOnce(walDir, t1, ckpt)
    assert(spark.read.parquet(t1.toString).count() === 1)
    val commits = ckpt.resolve("graft-sink-commits")
    // one marker per delivered batch (trailing empty batches included)
    assert(Files.exists(commits.resolve(f"batch-${0L}%020d")))

    // a marker pre-seeded in a FRESH checkpoint simulates the retry of a
    // batch whose sink write already committed: the foreachBatch body
    // must skip the append entirely (no table dir is ever created)
    val ckpt2 = tmp("ck2")
    val t2 = tmp("tbl2").resolve("t") // not created: skip must never write it
    val pre = ckpt2.resolve("graft-sink-commits")
    Files.createDirectories(pre)
    Files.write(pre.resolve(f"batch-${0L}%020d"), Array.empty[Byte])
    val q = CdcStream.startReplication(
      CdcStream.walFileSource(spark, walDir.toString),
      config, payloadSchema, t2.toString, ckpt2.toString,
      collectionIds = Seq("c1"), initialTick = Some(10L), clock = clock)
    q.awaitTermination()
    assert(!Files.exists(t2), "pre-committed batch was appended again")
  }

  test("compact() collapses storage without changing the read view") {
    val walDir = tmp("wal"); val tableDir = tmp("tbl")
    writeWal(walDir, "b1.json", Seq(
      walLine(11, 11, 2300, "c1", """{"k": 1, "v": "1.0"}"""),
      walLine(12, 12, 2300, "c1", """{"k": 1, "v": "1.1"}"""),
      walLine(13, 13, 2302, "c1", """{"k": 2, "v": "0"}""")))
    runOnce(walDir, tableDir, tmp("ck"))

    val before = current(tableDir).select("K", "V").orderBy("K").collect().toSeq
    val rows = CdcStream.compact(spark, tableDir.toString, keys = Seq("K"))
    val after = current(tableDir).select("K", "V").orderBy("K").collect().toSeq

    assert(rows === 2) // one live row for K=1, one tombstone for K=2
    assert(after === before)
  }

  test("compactEvery cadence keeps storage bounded while the query runs, view unchanged") {
    def countParts(dir: Path): Int = {
      val d = java.nio.file.Files.walk(dir)
      try d.filter(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).count().toInt
      finally d.close()
    }
    // 6 WAL files, one batch each (maxFilesPerTrigger=1), all upserting
    // the SAME key — the worst case for an append-only versioned table
    def seed(walDir: Path): Unit = (1 to 6).foreach { i =>
      writeWal(walDir, f"b$i%02d.json", Seq(
        walLine(10L + i, 10L + i, 2300, "c1", s"""{"k": 1, "v": "$i.0"}""")))
    }
    def run(tableDir: Path, cadence: Option[Int]): Unit = {
      val walDir = tmp("wal")
      seed(walDir)
      val q = CdcStream.startReplication(
        CdcStream.walFileSource(spark, walDir.toString, maxFilesPerTrigger = Some(1)),
        config, payloadSchema, tableDir.toString, tmp("ck").toString,
        collectionIds = Seq("c1"), initialTick = Some(10L), clock = clock,
        compactEvery = cadence)
      q.awaitTermination()
    }
    val plain = tmp("tblplain"); run(plain, None)
    val compacted = tmp("tblcomp"); run(compacted, Some(2))
    // identical read view either way: the latest upsert wins
    val viewOf = (d: Path) => current(d).select("K", "V").orderBy("K")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viewOf(plain) === Seq((1L, 6.0)))
    assert(viewOf(compacted) === viewOf(plain))
    // the cadence's point: the plain table accumulates every version (6
    // rows, one file per batch); the self-compacting table collapses to
    // the single live row and strictly fewer files — read cost stays
    // bounded as batches accumulate
    assert(spark.read.parquet(plain.toString).count() === 6)
    assert(spark.read.parquet(compacted.toString).count() === 1)
    assert(countParts(compacted) < countParts(plain),
      s"compacted table has ${countParts(compacted)} part files vs plain ${countParts(plain)}")
  }

  test("compact() refuses to run while the table's replication query is active") {
    val walDir = tmp("wal"); val tableDir = tmp("tbl")
    writeWal(walDir, "b1.json", Seq(
      walLine(11, 11, 2300, "c1", """{"k": 1, "v": "1.0"}""")))
    val q = CdcStream.startReplication(
      CdcStream.walFileSource(spark, walDir.toString), config, payloadSchema,
      tableDir.toString, tmp("ck").toString, collectionIds = Seq("c1"),
      initialTick = Some(10L), clock = clock,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      // a racing compact would move a committed-but-unswapped append aside
      // and delete it — the guard must fail fast instead
      val e = intercept[IllegalStateException] {
        CdcStream.compact(spark, tableDir.toString, keys = Seq("K"))
      }
      assert(e.getMessage.contains("still appending"))
    } finally { q.stop(); q.awaitTermination() }
    // writer stopped -> compact proceeds
    assert(CdcStream.compact(spark, tableDir.toString, keys = Seq("K")) === 1)
  }

  test("transform rejects land in the dead-letter table") {
    val walDir = tmp("wal"); val tableDir = tmp("tbl")
    writeWal(walDir, "b1.json", Seq(
      walLine(11, 11, 2300, "c1", """{"k": 1, "v": "1.0"}"""),
      walLine(12, 12, 2300, "c1", """{"v": "no key"}"""))) // missing pk
    runOnce(walDir, tableDir, tmp("ck"))

    assert(current(tableDir).count() === 1)
    val dead = spark.read.parquet(tableDir.toString + ".deadletter")
    assert(dead.count() === 1)
    assert(dead.select("error").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().head.contains("missing primary key"))

    // the deadletter log has no keys/_ver for a read view to collapse,
    // so its storage must be idempotent at the WRITE: a crash between
    // the reject write and the sink commit marker re-delivers the batch,
    // and the re-write must land in the SAME batch partition instead of
    // appending a duplicate reject set. Re-run the exact sink write for
    // the same batch id and assert the log did not grow.
    val replay = dead.drop("batch_id")
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(0L))
    replay.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(tableDir.toString + ".deadletter")
    assert(spark.read.parquet(tableDir.toString + ".deadletter").count() === 1,
      "a re-delivered batch duplicated its deadletter rows")
  }

  test("replication end-to-end over the custom WAL streaming source") {
    val walDir = tmp("walsrc"); val tableDir = tmp("tbl")
    // tick-ranged chunk naming — the WalSource contract
    Files.write(walDir.resolve("wal-11-13.json"), java.util.Arrays.asList(
      walLine(11, 11, 2300, "c1", """{"k": 1, "v": "1.0"}"""),
      walLine(12, 12, 2300, "c1", """{"k": 2, "v": "2.0"}""")))
    Files.write(walDir.resolve("wal-14-20.json"), java.util.Arrays.asList(
      walLine(14, 14, 2302, "c1", """{"k": 2, "v": "0"}"""),
      walLine(15, 15, 2300, "c1", """{"k": 1, "v": "1.5"}""")))

    val wal = spark.readStream.format("graft.sources.WalSource").load(walDir.toString)
    val q = CdcStream.startReplication(
      wal, config, payloadSchema,
      tableDir.toString, tmp("ck").toString,
      collectionIds = Seq("c1"), clock = clock)
    q.awaitTermination()

    val got = current(tableDir).select("K", "V").orderBy("K")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((1L, 1.5))) // k=2 deleted, k=1 latest wins
  }

  test("statefulLatest emits a changelog of per-key current rows") {
    import spark.implicits._
    val srcDir = tmp("st"); val ckpt = tmp("ck")
    // one file per micro-batch (maxFilesPerTrigger=1) so state carries
    // across batches: k=1 advances twice, the stale k=2 update must not emit
    Files.write(srcDir.resolve("a.json"), java.util.Arrays.asList(
      """{"k":1,"v":10,"val":"first"}""",
      """{"k":2,"v":20,"val":"only"}"""))
    Files.write(srcDir.resolve("b.json"), java.util.Arrays.asList(
      """{"k":1,"v":30,"val":"newer"}""",
      """{"k":2,"v":5,"val":"stale"}"""))

    val src = spark.readStream
      .schema(StructType(Seq(StructField("k", LongType), StructField("v", LongType),
        StructField("val", StringType))))
      .option("maxFilesPerTrigger", 1)
      .json(srcDir.toString)
      .as[(Long, Long, String)]

    val changelog = CdcStream.statefulLatest(src)(_._1, _._2)
    val q = changelog.writeStream
      .format("memory").queryName("st_changelog").outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("st_changelog")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // stale k=2 v=5 must be absent; both k=1 advances present
    assert(got === Set((1L, 10L, "first"), (2L, 20L, "only"), (1L, 30L, "newer")))
  }

  test("statefulLatest version ties resolve by the tie order, independent of arrival") {
    import spark.implicits._
    // two payloads with the SAME (key, version): the tie order (payload
    // length here — the typed twin of ReplicaTable.latest's tieBreak
    // columns) must pick the same winner whichever arrives first
    def run(first: String, second: String, tag: String): Set[(Long, Long, String)] = {
      val srcDir = tmp(s"tie-$tag"); val ckpt = tmp(s"tieck-$tag")
      Files.write(srcDir.resolve("a.json"), java.util.Arrays.asList(first))
      Files.write(srcDir.resolve("b.json"), java.util.Arrays.asList(second))
      val src = spark.readStream
        .schema(StructType(Seq(StructField("k", LongType),
          StructField("v", LongType), StructField("val", StringType))))
        .option("maxFilesPerTrigger", 1)
        .json(srcDir.toString)
        .as[(Long, Long, String)]
      val changelog = CdcStream.statefulLatest(src)(
        _._1, _._2, t => t._3.length.toLong)
      val q = changelog.writeStream
        .format("memory").queryName(s"tie_$tag").outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(s"tie_$tag")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    }
    val lo = """{"k":1,"v":10,"val":"bb"}"""  // tie 2
    val hi = """{"k":1,"v":10,"val":"ccc"}""" // tie 3
    val fwd = run(lo, hi, "fwd") // hi arrives second: advances over lo
    val rev = run(hi, lo, "rev") // lo arrives second: must NOT advance
    assert(fwd === Set((1L, 10L, "bb"), (1L, 10L, "ccc")),
      "the higher tie did not advance the state")
    assert(rev === Set((1L, 10L, "ccc")),
      "a lower tie re-delivered after the winner regressed the state")
  }

  test("watermarked tumbling window emits closed windows in append mode") {
    val srcDir = tmp("ev"); val ckpt = tmp("ck")
    val lines = Seq(
      """{"ts":"2024-01-01T00:00:10.000Z","user_id":1}""",
      """{"ts":"2024-01-01T00:00:40.000Z","user_id":1}""",
      """{"ts":"2024-01-01T00:01:10.000Z","user_id":2}""",
      """{"ts":"2024-01-01T00:00:20.000Z","user_id":1}""", // late but within watermark
      """{"ts":"2024-01-01T00:10:00.000Z","user_id":3}""") // advances watermark, closes earlier windows
    Files.write(srcDir.resolve("e1.json"), String.join("\n", lines: _*).getBytes)

    val src = spark.readStream
      .schema(StructType(Seq(StructField("ts", TimestampType), StructField("user_id", LongType))))
      .json(srcDir.toString)
    val counts = CdcStream.windowedCounts(src, "ts", "2 minutes", "1 minute", Seq("user_id"))
    val q = counts.writeStream
      .format("memory").queryName("win_counts").outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("win_counts")
      .select(col("window_start").cast("string"), col("user_id"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // watermark = 00:10:00 - 2m = 00:08:00 -> the 00:00 and 00:01 windows are closed
    assert(got.contains(("2024-01-01 00:00:00", 1L, 3L)))
    assert(got.contains(("2024-01-01 00:01:00", 2L, 1L)))
  }
}
