package graft

import graft.streaming.{Producer, QueryMonitor}
import org.apache.spark.sql.functions._

/** Producer-side message shaping (P3/S5/K1 contract) and the streaming
  * control-plane listener (V3 counts, E2 gap detection).
  */
class ProducerSpec extends SparkSpec {

  private def wal() = {
    import spark.implicits._
    Seq(
      (11L, "11", 2300, "c1", """{"_key":"a","x":1}"""),
      (12L, "12", 2302, "c2", """{"_key":"b","x":2}"""),
      (13L, "13", 2300, "c9", """{"x":3}"""))
      .toDF("offset", "tick", "type", "cuid", "data")
  }

  test("prepareKafkaMessages: topic from cuid map, key from data._key, value is full entry") {
    val out = Producer.prepareKafkaMessages(wal(), Map("c1" -> "orders", "c2" -> "users"))
      .orderBy(col("value"))
      .collect()
    // the c9 (foreign-collection) record is DROPPED, not shipped with a
    // null topic: Spark's Kafka writer throws on null topics, so one
    // foreign record would wedge the producer on the same offset forever
    assert(out.map(_.getString(0)).toSeq === Seq("orders", "users"))
    assert(out.map(_.getString(1)).toSeq === Seq("a", "b"))
    // value round-trips the whole envelope (publisher.py:84 sends the entry)
    assert(out(0).getString(2).contains("\"offset\":11") &&
      out(0).getString(2).contains("\"cuid\":\"c1\""))
  }

  test("prepareKafkaMessagesWithCatalog routes via broadcast join") {
    import spark.implicits._
    val catalog = Seq(("c1", "orders"), ("c2", "users")).toDF("cuid", "topic")
    val out = Producer.prepareKafkaMessagesWithCatalog(wal(), catalog)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // catalog-miss rows (c9) are dropped, same contract as the map form
    assert(out.orderBy(col("key")).collect().map(_.getString(0)).toSeq ===
      Seq("orders", "users"))
  }

  test("QueryMonitor counts processed rows and flags offset gaps") {
    import java.nio.file.Files
    import graft.config.{ColumnSpec, TableConfig}
    import graft.streaming.CdcStream
    import org.apache.spark.sql.types._

    var gaps = List.empty[(Long, Long, QueryMonitor.GapKind)]
    val mon = new QueryMonitor(onGap = (_, prev, next, kind) => gaps ::= (prev, next, kind))
    spark.streams.addListener(mon)
    try {
      val walDir = Files.createTempDirectory("walmon")
      val tableDir = Files.createTempDirectory("tblmon").resolve("t")
      // two files -> two micro-batches (maxFilesPerTrigger=1) with an
      // offset gap between them (13 -> 21)
      Files.write(walDir.resolve("a.json"), java.util.Arrays.asList(
        """{"offset":12,"tick":"12","type":2300,"db":"d","cuid":"c1","tid":"t","data":"{\"k\":1,\"v\":\"1\"}"}""",
        """{"offset":13,"tick":"13","type":2300,"db":"d","cuid":"c1","tid":"t","data":"{\"k\":2,\"v\":\"2\"}"}"""))
      Files.write(walDir.resolve("b.json"), java.util.Arrays.asList(
        """{"offset":21,"tick":"21","type":2300,"db":"d","cuid":"c1","tid":"t","data":"{\"k\":3,\"v\":\"3\"}"}"""))

      val config = TableConfig("Doc", Seq(
        ColumnSpec("K", Seq("int"), ref = Some("k"), primaryKey = true),
        ColumnSpec("V", Seq("float"), ref = Some("v"))))
      val q = CdcStream.startReplication(
        CdcStream.walFileSource(spark, walDir.toString, maxFilesPerTrigger = Some(1)),
        config,
        StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
        tableDir.toString, Files.createTempDirectory("ckmon").toString,
        queryName = Some("mon_test"))
      q.awaitTermination()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (mon.processedCount("mon_test") < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)

      assert(mon.processedCount("mon_test") === 3)
      assert(gaps === List((13L, 21L, QueryMonitor.BoundaryGap)))
    } finally spark.streams.removeListener(mon)
  }

  test("an offset skip entirely inside one micro-batch is flagged (density)") {
    import java.nio.file.Files
    import graft.config.{ColumnSpec, TableConfig}
    import graft.streaming.CdcStream
    import org.apache.spark.sql.types._

    var gaps = List.empty[(Long, Long, QueryMonitor.GapKind)]
    val mon = new QueryMonitor(onGap = (_, a, b, kind) => gaps ::= (a, b, kind))
    spark.streams.addListener(mon)
    try {
      val walDir = Files.createTempDirectory("waldense")
      val tableDir = Files.createTempDirectory("tbldense").resolve("t")
      // ONE file -> ONE micro-batch covering offsets 12..21 with ticks
      // 14-20 skipped by the server: the boundary check has no previous
      // batch to compare against, so only the density check (3 observed
      // offsets over a span of 10) can witness the loss
      Files.write(walDir.resolve("a.json"), java.util.Arrays.asList(
        """{"offset":12,"tick":"12","type":2300,"db":"d","cuid":"c1","tid":"t","data":"{\"k\":1,\"v\":\"1\"}"}""",
        """{"offset":13,"tick":"13","type":2300,"db":"d","cuid":"c1","tid":"t","data":"{\"k\":2,\"v\":\"2\"}"}""",
        """{"offset":21,"tick":"21","type":2300,"db":"d","cuid":"c1","tid":"t","data":"{\"k\":3,\"v\":\"3\"}"}"""))
      val config = TableConfig("Doc", Seq(
        ColumnSpec("K", Seq("int"), ref = Some("k"), primaryKey = true),
        ColumnSpec("V", Seq("float"), ref = Some("v"))))
      val q = CdcStream.startReplication(
        CdcStream.walFileSource(spark, walDir.toString),
        config,
        StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
        tableDir.toString, Files.createTempDirectory("ckdense").toString,
        queryName = Some("mon_dense"))
      q.awaitTermination()
      val deadline = System.currentTimeMillis() + 10000
      while (mon.processedCount("mon_dense") < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(mon.processedCount("mon_dense") === 3)
      assert(gaps === List((12L, 21L, QueryMonitor.DensityGap)),
        "the intra-batch skip was not flagged by the density check " +
          "with range semantics and its own kind")
    } finally spark.streams.removeListener(mon)
  }

  test("filtered WAL entries at a batch boundary do not fake a gap (E2 is pre-filter)") {
    import java.nio.file.Files
    import graft.config.{ColumnSpec, TableConfig}
    import graft.streaming.CdcStream
    import org.apache.spark.sql.types._

    var gaps = List.empty[(Long, Long, QueryMonitor.GapKind)]
    val mon = new QueryMonitor(onGap = (_, prev, next, kind) => gaps ::= (prev, next, kind))
    spark.streams.addListener(mon)
    try {
      val walDir = Files.createTempDirectory("walgapf")
      val tableDir = Files.createTempDirectory("tblgapf").resolve("t")
      // batch 1 ends in two txn markers (types 2200/2201 — op-filtered,
      // but they still occupy WAL offsets 13-14); batch 2 resumes at the
      // NEXT offset 15. Post-filter observation would read max=12 then
      // min=15 and alarm "13-14 lost"; the server skipped nothing.
      Files.write(walDir.resolve("a.json"), java.util.Arrays.asList(
        """{"offset":12,"tick":"12","type":2300,"db":"d","cuid":"c1","tid":"t","data":"{\"k\":1,\"v\":\"1\"}"}""",
        """{"offset":13,"tick":"13","type":2200,"db":"d","cuid":"c1","tid":"t","data":"{}"}""",
        """{"offset":14,"tick":"14","type":2201,"db":"d","cuid":"c1","tid":"t","data":"{}"}"""))
      Files.write(walDir.resolve("b.json"), java.util.Arrays.asList(
        """{"offset":15,"tick":"15","type":2300,"db":"d","cuid":"c1","tid":"t","data":"{\"k\":2,\"v\":\"2\"}"}"""))
      val config = TableConfig("Doc", Seq(
        ColumnSpec("K", Seq("int"), ref = Some("k"), primaryKey = true),
        ColumnSpec("V", Seq("float"), ref = Some("v"))))
      val q = CdcStream.startReplication(
        CdcStream.walFileSource(spark, walDir.toString, maxFilesPerTrigger = Some(1)),
        config,
        StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
        tableDir.toString, Files.createTempDirectory("ckgapf").toString,
        queryName = Some("gapf_test"))
      q.awaitTermination()
      val deadline = System.currentTimeMillis() + 10000
      while (mon.processedCount("gapf_test") < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(mon.processedCount("gapf_test") === 2,
        "V3 must still count only rows that became table rows")
      assert(gaps === Nil,
        s"op-filtered markers at the batch boundary faked a WAL gap: $gaps")
    } finally spark.streams.removeListener(mon)
  }
}
