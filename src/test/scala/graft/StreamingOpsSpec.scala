package graft

import java.nio.file.Files
import graft.streaming.CdcStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming dedup and stream-stream interval join (SURVEY §2.10): state
  * stays bounded by the watermark, results match the batch semantics.
  */
@graft.tags.Soak
class StreamingOpsSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  // deleteOnExit only removes EMPTY dirs, and these fill with source
  // files and RocksDB checkpoints — delete recursively after the suite
  private val created = scala.collection.mutable.ListBuffer.empty[java.nio.file.Path]

  private def tmp(prefix: String) = {
    val p = Files.createTempDirectory(prefix)
    created += p
    p
  }

  override def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    created.foreach { root =>
      if (Files.exists(root))
        Files.walk(root).iterator().asScala.toSeq.reverseIterator
          .foreach(p => Files.deleteIfExists(p))
    }
    // reclaim the persisted retrieval tables the twin tests build
    // (suites reclaim what they persist; later ensures rebuild)
    Seq("graft_bm25_contrib", "graft_bm25_idx", "graft_bm25_stats")
      .foreach(graft.operators.PersistedIndex.dropAll(spark, _))
    super.afterAll()
  }

  private val eventSchema = StructType(Seq(
    StructField("id", LongType), StructField("ts", TimestampType),
    StructField("payload", StringType)))

  test("dedupStream drops re-deliveries of the same key across batches") {
    val src = tmp("dd-src"); val ckpt = tmp("dd-ck")
    // one file per micro-batch: the duplicate id=1 arrives again in batch 2
    Files.write(src.resolve("b1.json"), java.util.Arrays.asList(
      """{"id":1,"ts":"2024-01-01T00:00:10.000Z","payload":"first"}""",
      """{"id":2,"ts":"2024-01-01T00:00:20.000Z","payload":"two"}"""))
    Files.write(src.resolve("b2.json"), java.util.Arrays.asList(
      """{"id":1,"ts":"2024-01-01T00:05:00.000Z","payload":"dup"}""",
      """{"id":3,"ts":"2024-01-01T00:06:00.000Z","payload":"three"}"""))

    val stream = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", 1).json(src.toString)
    val q = CdcStream.dedupStream(stream, Seq("id"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dd_out")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("dd_out")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(got === Set((1L, "first"), (2L, "two"), (3L, "three")))
  }

  test("sessionizeStream closes gap-separated sessions per key") {
    val src = tmp("ss-src"); val ckpt = tmp("ss-ck")
    // user 1: two bursts 30 min apart (gap 10 min => two sessions);
    // user 2: one event. The sentinel advances the watermark past every
    // other session's end; its OWN session stays open in state and must
    // NOT be emitted — append mode only releases closed sessions.
    Files.write(src.resolve("e.json"), java.util.Arrays.asList(
      """{"id":1,"ts":"2024-01-01T00:00:00.000Z","payload":"a"}""",
      """{"id":1,"ts":"2024-01-01T00:05:00.000Z","payload":"b"}""",
      """{"id":1,"ts":"2024-01-01T00:35:00.000Z","payload":"c"}""",
      """{"id":2,"ts":"2024-01-01T00:01:00.000Z","payload":"d"}""",
      """{"id":99,"ts":"2024-01-01T06:00:00.000Z","payload":"sentinel"}"""))

    val stream = spark.readStream.schema(eventSchema).json(src.toString)
    val q = CdcStream.sessionizeStream(stream, "id", "ts",
        gap = "10 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("ss_out")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("ss_out")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got === Set((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("sessionizeTws: timer-emitted sessions, late bridge event merges two open sessions") {
    val src = tmp("st-src"); val ckpt = tmp("st-ck")
    // batch 1: user 1 forms TWO open sessions ([00:00,00:05] and [00:20]
    // — 00:20 > 00:05 + 10min gap), user 2 one singleton
    Files.write(src.resolve("a.json"), java.util.Arrays.asList(
      """{"id":1,"ts":"2024-01-01T00:00:00.000Z","payload":"a"}""",
      """{"id":1,"ts":"2024-01-01T00:05:00.000Z","payload":"b"}""",
      """{"id":1,"ts":"2024-01-01T00:20:00.000Z","payload":"c"}""",
      """{"id":2,"ts":"2024-01-01T00:01:00.000Z","payload":"d"}"""))
    // batch 2: the LATE bridge at 00:12 touches both (within gap of 00:05
    // and of 00:20) -> the two sessions must merge into one
    Files.write(src.resolve("b.json"), java.util.Arrays.asList(
      """{"id":1,"ts":"2024-01-01T00:12:00.000Z","payload":"bridge"}"""))
    // batch 3: sentinel advances the watermark (2h delay) past every
    // session end + gap; its own session stays open and is never emitted
    Files.write(src.resolve("c.json"), java.util.Arrays.asList(
      """{"id":99,"ts":"2024-01-01T06:00:00.000Z","payload":"sentinel"}"""))

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(eventSchema)
        .option("maxFilesPerTrigger", 1).json(src.toString)
      val q = CdcStream.sessionizeTws(stream, "id", "ts",
          gapMs = 10 * 60 * 1000L, watermark = "2 hours")
        .writeStream.format("memory").queryName("st_out")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
      def m(min: Long) = base + min * 60000L
      val got = spark.table("st_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === Set(
        (1L, m(0), m(20), 4L), // merged: a, b, bridge, c
        (2L, m(1), m(1), 1L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("gap-boundary events merge identically in the builtin and the timer twin") {
    // MEASURED builtin semantics: session_window merges two events
    // exactly gapMs apart into ONE session (boundary-INCLUSIVE — the
    // long-standing doc comment claiming "strictly less" was wrong, and
    // w3's oracle only agreed because micro-timestamp fixtures never
    // produce exact-boundary gaps). sessionizeTws claims the builtin's
    // semantics on raw timer state, so both must merge here; this test
    // is the pin that keeps the two operators and the w3 oracle's break
    // condition aligned at the boundary.
    val gapMs = 10 * 60 * 1000L
    def boundarySrc(tag: String): java.nio.file.Path = {
      val src = tmp(s"$tag-src")
      Files.write(src.resolve("e.json"), java.util.Arrays.asList(
        """{"id":1,"ts":"2024-01-01T00:00:00.000Z","payload":"a"}""",
        """{"id":1,"ts":"2024-01-01T00:10:00.000Z","payload":"b"}""", // == gap
        """{"id":99,"ts":"2024-01-01T06:00:00.000Z","payload":"sentinel"}"""))
      src
    }
    val b = spark.readStream.schema(eventSchema).json(boundarySrc("sb").toString)
    val qb = CdcStream.sessionizeStream(b, "id", "ts",
        gap = "10 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sb_out")
      .option("checkpointLocation", tmp("sb-ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    qb.awaitTermination()
    val builtin = spark.table("sb_out").collect()
      .filter(_.getLong(0) == 1L).map(_.getLong(3)).toSeq.sorted
    assert(builtin === Seq(2L),
      s"builtin session_window split gap-boundary events: $builtin")
    withRocksDb {
      val t = spark.readStream.schema(eventSchema).json(boundarySrc("tb").toString)
      val qt = CdcStream.sessionizeTws(t, "id", "ts", gapMs, watermark = "1 minute")
        .writeStream.format("memory").queryName("tb_out")
        .option("checkpointLocation", tmp("tb-ck").toString)
        .trigger(Trigger.AvailableNow()).start()
      qt.awaitTermination()
    }
    val twin = spark.table("tb_out").collect()
      .filter(_.getLong(0) == 1L).map(_.getLong(3)).toSeq.sorted
    assert(twin === Seq(2L),
      s"sessionizeTws split gap-boundary events the builtin merges: $twin")
  }

  test("decayAttributionStream: a value-less purchase consumes its segment, credits nothing") {
    import scala.jdk.CollectionConverters._
    // the batch w23 rule (`pval_e6 IS NOT NULL`) emits NO rows for a
    // NULL-value purchase but the purchase still delimits segments; the
    // stream's first cut coalesced NULL to 0.0 and emitted zero-credit
    // rows that skewed every n_touches/sum_weight_ppm rollup
    val src = tmp("dcnull-src"); val ck = tmp("dcnull-ck")
    Files.write(src.resolve("a.json"), Seq(
      twinEv(1, "2024-01-01T09:00:00.000Z", 1, "click"),
      """{"uid":1,"ts":"2024-01-01T09:10:00.000Z","eid":2,"etype":"purchase","value":null}""",
      twinEv(1, "2024-01-01T09:20:00.000Z", 3, "view"),
      twinEv(1, "2024-01-01T09:30:00.000Z", 4, "purchase", 3.0)).asJava)
    withRocksDb {
      val stream = spark.readStream.schema(twinSchema).json(src.toString)
      val q = CdcStream.decayAttributionStream(
          stream, "uid", "ts", "eid", "etype", "value")
        .writeStream.format("memory").queryName("dcnull_out")
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val got = spark.table("dcnull_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq
    // only the VALUED purchase emits, crediting only the post-null-
    // purchase view — the click before the null purchase was consumed
    // with its segment and must never resurface
    assert(got === Seq((1L, 4L, "view", 1000000L, 3000000L)),
      s"null-value purchase leaked credit rows or failed to consume its segment: $got")
  }

  test("anomalyStream flags the same minutes as the batch w15 rule") {
    val src = tmp("an-src"); val ckpt = tmp("an-ck")
    // 13 active minutes for one key: 10 flat (cnt=2) to fill the ring,
    // a spike (cnt=9) caught by the ZERO-VARIANCE branch, a flat minute
    // (cnt=2, not flagged), then a second spike (cnt=10) whose window
    // now CONTAINS the first spike — (10*10-27)^2 = 5329 > 9*(10*117-
    // 27^2) = 3969, so the VARIANCE branch flags it (9 would tie at
    // 3969 and stay silent under strict >). Split across three files so
    // the ring survives micro-batch boundaries; a late sentinel key
    // advances the watermark past every window.
    def ev(min: Int, n: Int): Seq[String] =
      (0 until n).map(i => s"""{"id":$min,"ts":"2024-01-01T00:${f"$min%02d"}:${f"${i % 60}%02d"}.000Z","payload":"k"}""")
    import scala.jdk.CollectionConverters._
    Files.write(src.resolve("a.json"),
      ((0 until 5).flatMap(m => ev(m, 2))).asJava)
    Files.write(src.resolve("b.json"),
      ((5 until 10).flatMap(m => ev(m, 2)) ++ ev(10, 9)).asJava)
    Files.write(src.resolve("c.json"),
      (ev(11, 2) ++ ev(12, 10) ++ Seq(
        """{"id":999,"ts":"2024-01-01T06:00:00.000Z","payload":"sentinel"}""")).asJava)

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(eventSchema)
        .option("maxFilesPerTrigger", 1).json(src.toString)
        .withColumn("event_type", lit("click"))
      val minutes = CdcStream.windowedCounts(stream, "ts",
          watermark = "0 seconds", window = "1 minute", keyCols = Seq("event_type"))
        .select(col("event_type"), col("window_start").as("minute"),
          col("n_events").as("cnt"))
      val q = CdcStream.anomalyStream(minutes)
        .writeStream.format("memory").queryName("an_out")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
      val got = spark.table("an_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // batch replay of the same rule over the same minute series
      val series = (0 until 13).map(m => (base + m * 60000L,
        if (m == 10) 9L else if (m == 12) 10L else 2L))
      val expected = series.indices.collect {
        case i if i >= 10 =>
          val win = series.slice(i - 10, i).map(_._2)
          val (x, s, q0) = (series(i)._2, win.sum, win.map(c => c * c).sum)
          val flagged =
            if (10 * q0 - s * s == 0) 10 * x != s
            else (10 * x - s) * (10 * x - s) > 9 * (10 * q0 - s * s)
          (series(i)._1, x, s, flagged)
      }.filter(_._4).map(t => ("click", t._1, t._2, t._3)).toSet
      assert(expected.size === 2,
        "fixture must flag one zero-variance and one with-variance spike")
      assert(got === expected, "streaming flags diverge from the batch rule")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("anomalyStream ring state survives a checkpoint restart") {
    val src = tmp("ar-src"); val ckpt = tmp("ar-ck")
    def ev(min: Int, n: Int): Seq[String] =
      (0 until n).map(i => s"""{"id":$min,"ts":"2024-01-01T00:${f"$min%02d"}:${f"${i % 60}%02d"}.000Z","payload":"k"}""")
    import scala.jdk.CollectionConverters._
    // run 1 fills the ring with 10 flat minutes (watermark closes 0..9
    // once minute 10 arrives) — NO anomaly is emitted yet
    Files.write(src.resolve("a.json"),
      ((0 until 10).flatMap(m => ev(m, 2)) ++ ev(10, 2)).asJava)

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the memory sink refuses checkpoint recovery — collect through
      // foreachBatch (recoverable) into a driver-side buffer instead
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Long)]()
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(eventSchema)
          .option("maxFilesPerTrigger", 1).json(src.toString)
          .withColumn("event_type", lit("click"))
        val minutes = CdcStream.windowedCounts(stream, "ts",
            watermark = "0 seconds", window = "1 minute", keyCols = Seq("event_type"))
          .select(col("event_type"), col("window_start").as("minute"),
            col("n_events").as("cnt"))
        val q = CdcStream.anomalyStream(minutes)
          .writeStream.foreachBatch {
            (df: org.apache.spark.sql.Dataset[CdcStream.MinuteAnomaly], _: Long) =>
              df.collect().foreach(a => got.add((a.key, a.minute, a.cnt, a.win_sum)))
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      runOnce()
      assert(got.isEmpty, "flat warmup minutes must not flag")
      // run 2, SAME checkpoint: a spike minute + a sentinel closing it.
      // The ring built in run 1 must be recovered from state — a fresh
      // ring would hold < 10 entries and stay silent.
      Files.write(src.resolve("b.json"),
        (ev(11, 9) ++ Seq(
          """{"id":999,"ts":"2024-01-01T06:00:00.000Z","payload":"s"}""")).asJava)
      runOnce()
      val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet === Set(("click", base + 11 * 60000L, 9L, 20L)),
        "restarted stream lost or corrupted the trailing ring")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("statefulLatestTws matches the changelog contract on the new state API") {
    import spark.implicits._
    val src = tmp("tws-src"); val ckpt = tmp("tws-ck")
    Files.write(src.resolve("a.json"), java.util.Arrays.asList(
      """{"k":1,"v":10,"val":"first"}""",
      """{"k":2,"v":20,"val":"only"}"""))
    Files.write(src.resolve("b.json"), java.util.Arrays.asList(
      """{"k":1,"v":30,"val":"newer"}""",
      """{"k":2,"v":5,"val":"stale"}"""))

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(StructType(Seq(StructField("k", LongType),
          StructField("v", LongType), StructField("val", StringType))))
        .option("maxFilesPerTrigger", 1)
        .json(src.toString)
        .as[(Long, Long, String)]

      val changelog = CdcStream.statefulLatestTws(stream)(_._1, _._2)
      val q = changelog.writeStream
        .format("memory").queryName("tws_changelog").outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val got = spark.table("tws_changelog")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      // same golden as the flatMapGroupsWithState form: stale k=2 absent
      assert(got === Set((1L, 10L, "first"), (2L, 20L, "only"), (1L, 30L, "newer")))

      // the TTL path flips the operator into processing-time mode; with a
      // horizon far beyond the test, semantics must be unchanged. NOTE:
      // processing-time state TTL keeps the query scheduling maintenance
      // batches indefinitely (AvailableNow never self-terminates and
      // processAllAvailable never finds a quiet moment — documented on
      // statefulLatestTws), so the test polls the sink for the expected
      // changelog and then stops the query explicitly.
      val ckpt2 = tmp("tws-ck2")
      val withTtl = CdcStream.statefulLatestTws(stream,
        ttl = Some(java.time.Duration.ofHours(1)))(_._1, _._2)
      val q2 = withTtl.writeStream
        .format("memory").queryName("tws_ttl").outputMode("update")
        .option("checkpointLocation", ckpt2.toString)
        .start()
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (spark.table("tws_ttl").count() < 3 && System.nanoTime() < deadline)
          Thread.sleep(250)
      } finally q2.stop()
      val got2 = spark.table("tws_ttl")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got2 === got)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transitionStream emits the batch w17 edges across micro-batch boundaries") {
    val src = tmp("tr-src"); val ckpt = tmp("tr-ck")
    val schema = StructType(Seq(
      StructField("uid", LongType), StructField("ts", TimestampType),
      StructField("eid", LongType), StructField("etype", StringType)))
    def ev(uid: Long, t: String, eid: Long, tp: String) =
      s"""{"uid":$uid,"ts":"$t","eid":$eid,"etype":"$tp"}"""
    import scala.jdk.CollectionConverters._
    // user 1: view->click (in-session), then a 5h gap (NO edge), then
    // click->purchase; the gap-straddling pair lands in different files
    // so the suppression must survive a batch boundary. user 2: its
    // view->click edge itself crosses a batch boundary.
    Files.write(src.resolve("a.json"), Seq(
      ev(1, "2024-01-01T10:00:00.000Z", 1, "view"),
      ev(1, "2024-01-01T10:30:00.000Z", 2, "click"),
      ev(2, "2024-01-01T09:00:00.000Z", 3, "view")).asJava)
    Files.write(src.resolve("b.json"), Seq(
      ev(2, "2024-01-01T09:45:00.000Z", 4, "click"),
      ev(1, "2024-01-01T15:30:00.000Z", 5, "click")).asJava)
    Files.write(src.resolve("c.json"), Seq(
      ev(1, "2024-01-01T15:40:00.000Z", 6, "purchase")).asJava)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(src.toString)
      val q = CdcStream.transitionStream(stream, "uid", "ts", "eid", "etype",
          gapUs = 4L * 3600 * 1000000)
        .writeStream.format("memory").queryName("tr_out")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("tr_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      assert(got === Set(
        (1L, "view", "click", 1800L * 1000000),
        (1L, "click", "purchase", 600L * 1000000),
        (2L, "view", "click", 2700L * 1000000)),
        "streaming edges diverge from the batch w17 rule")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("funnelStream emits the batch w25 stage latencies across micro-batch boundaries") {
    val src = tmp("fn-src"); val ckpt = tmp("fn-ck")
    val schema = StructType(Seq(
      StructField("uid", LongType), StructField("ts", TimestampType),
      StructField("eid", LongType), StructField("etype", StringType)))
    def ev(uid: Long, t: String, eid: Long, tp: String) =
      s"""{"uid":$uid,"ts":"$t","eid":$eid,"etype":"$tp"}"""
    import scala.jdk.CollectionConverters._
    // user 1: a PRE-view click (skipped, the batch rule's strict
    // us > t1), then view / click / purchase each in a DIFFERENT file so
    // every stage completion crosses a micro-batch boundary; a second
    // click and a post-completion purchase must both be ignored.
    // user 2: purchase-before-click is skipped (t2 unset), then the
    // funnel completes in order. user 3 never converts.
    Files.write(src.resolve("a.json"), Seq(
      ev(1, "2024-01-01T09:50:00.000Z", 1, "click"),
      ev(1, "2024-01-01T10:00:00.000Z", 2, "view"),
      ev(2, "2024-01-01T09:00:00.000Z", 3, "view"),
      ev(3, "2024-01-01T08:00:00.000Z", 4, "view")).asJava)
    Files.write(src.resolve("b.json"), Seq(
      ev(2, "2024-01-01T09:10:00.000Z", 5, "purchase"),
      ev(2, "2024-01-01T09:20:00.000Z", 6, "click"),
      ev(1, "2024-01-01T10:30:00.000Z", 7, "click"),
      ev(1, "2024-01-01T10:40:00.000Z", 8, "click")).asJava)
    Files.write(src.resolve("c.json"), Seq(
      ev(1, "2024-01-01T11:00:00.000Z", 9, "purchase"),
      ev(2, "2024-01-01T09:45:00.000Z", 10, "purchase"),
      ev(1, "2024-01-01T11:30:00.000Z", 11, "purchase")).asJava)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(src.toString)
      val q = CdcStream.funnelStream(stream, "uid", "ts", "eid", "etype")
        .writeStream.format("memory").queryName("fn_out")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("fn_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val m = 60L * 1000000
      assert(got === Set(
        (1L, "1_view_to_click", 30 * m),
        (1L, "2_click_to_purchase", 30 * m),
        (1L, "3_view_to_purchase", 60 * m),
        (2L, "1_view_to_click", 20 * m),
        (2L, "2_click_to_purchase", 25 * m),
        (2L, "3_view_to_purchase", 45 * m)),
        "streaming stage latencies diverge from the batch w25 rule")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("funnelStream's partial funnel survives a checkpoint restart") {
    val src = tmp("fr-src"); val ckpt = tmp("fr-ck")
    val schema = StructType(Seq(
      StructField("uid", LongType), StructField("ts", TimestampType),
      StructField("eid", LongType), StructField("etype", StringType)))
    def ev(uid: Long, t: String, eid: Long, tp: String) =
      s"""{"uid":$uid,"ts":"$t","eid":$eid,"etype":"$tp"}"""
    import scala.jdk.CollectionConverters._
    // run 1 delivers view + click only: one latency row, t1/t2 now live
    // ONLY in the checkpointed ValueState
    Files.write(src.resolve("a.json"), Seq(
      ev(1, "2024-01-01T10:00:00.000Z", 1, "view"),
      ev(1, "2024-01-01T10:30:00.000Z", 2, "click")).asJava)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(src.toString)
        val q = CdcStream.funnelStream(stream, "uid", "ts", "eid", "etype")
          .writeStream.foreachBatch {
            (df: org.apache.spark.sql.Dataset[CdcStream.StageLatency], _: Long) =>
              df.collect().foreach(s => got.add((s.key, s.stage, s.dur_us)))
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      runOnce()
      val m = 60L * 1000000
      assert(got.asScala.toSet === Set((1L, "1_view_to_click", 30 * m)),
        "run 1 must emit exactly the view->click latency")
      // run 2, SAME checkpoint: only the purchase arrives. Both purchase
      // latencies need t1 AND t2 from the RECOVERED state — a fresh
      // processor would have no funnel and stay silent.
      Files.write(src.resolve("b.json"), Seq(
        ev(1, "2024-01-01T11:00:00.000Z", 3, "purchase")).asJava)
      runOnce()
      assert(got.asScala.toSet === Set(
        (1L, "1_view_to_click", 30 * m),
        (1L, "2_click_to_purchase", 30 * m),
        (1L, "3_view_to_purchase", 60 * m)),
        "restarted stream lost the partial funnel state")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sketchStream's final per-day registers equal the batch daily sketch") {
    val src = tmp("sk-src"); val ckpt = tmp("sk-ck")
    // the REAL fixture events, re-fed as a 3-chunk stream: the twin claim
    // is that batch boundaries and arrival order cannot change the final
    // sketch (register max is order-free), so the last streamed emission
    // per day must equal the batch-side daily state w22 merges
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts"), col("user_id")).collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1)))
    import scala.jdk.CollectionConverters._
    ev.grouped((ev.length + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(src.resolve(s"c$i.json"),
        chunk.map { case (t, u) => s"""{"ts":"$t","user_id":$u}""" }.toSeq.asJava)
    }
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("user_id", LongType)))
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(src.toString)
      val q = CdcStream.sketchStream(stream)
        .writeStream.format("memory").queryName("sk_out")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // registers only grow -> both emitted columns are monotone per day,
      // so max-per-day IS the final state
      val got = spark.table("sk_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (d, g) =>
          (d, g.map(_._2).max, g.map(_._3).max)
        }.toSeq.sorted
      val expected = graft.queries.Events.sketchRegisterRows(
          Tables.load(spark, "/root/testdata/sf0.001", "events"))
        .groupBy(col("d"), col("reg")).agg(max(col("rho")).as("mrho"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (d, g) =>
          val regs = g.map(x => x._2 -> x._3).toMap
          (d, regs.size.toLong,
            graft.queries.Events.sketchEstimate(
              scala.collection.mutable.Map(regs.toSeq: _*)))
        }.toSeq.sorted
      assert(got === expected, "streamed sketch state diverges from batch")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("attributionStream emits the batch w19 credits across micro-batch boundaries") {
    val src = tmp("at-src"); val ckpt = tmp("at-ck")
    val schema = StructType(Seq(
      StructField("uid", LongType), StructField("ts", TimestampType),
      StructField("eid", LongType), StructField("etype", StringType)))
    def ev(uid: Long, t: String, eid: Long, tp: String) =
      s"""{"uid":$uid,"ts":"$t","eid":$eid,"etype":"$tp"}"""
    import scala.jdk.CollectionConverters._
    // user 1: view then click (click wins as the later touch), purchase
    // in a LATER batch (credit must cross the boundary); then a second
    // purchase 5h after the click — outside the gap, credited 'none'.
    // user 2: purchase with no prior touch at all.
    Files.write(src.resolve("a.json"), Seq(
      ev(1, "2024-01-01T10:00:00.000Z", 1, "view"),
      ev(1, "2024-01-01T10:30:00.000Z", 2, "click"),
      ev(2, "2024-01-01T09:00:00.000Z", 3, "purchase")).asJava)
    Files.write(src.resolve("b.json"), Seq(
      ev(1, "2024-01-01T11:00:00.000Z", 4, "purchase")).asJava)
    Files.write(src.resolve("c.json"), Seq(
      ev(1, "2024-01-01T15:31:00.000Z", 5, "purchase")).asJava)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(src.toString)
      val q = CdcStream.attributionStream(stream, "uid", "ts", "eid", "etype",
          gapUs = 4L * 3600 * 1000000)
        .writeStream.format("memory").queryName("at_out")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("at_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === Set(
        (2L, "none", -1L),
        (1L, "click", 1800L * 1000000),
        (1L, "none", -1L)),
        "streaming credits diverge from the batch w19 rule")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("decayAttributionStream matches the batch w23 arithmetic and caps state at 20 touches") {
    val src = tmp("da-src"); val ckpt = tmp("da-ck")
    val schema = StructType(Seq(
      StructField("uid", LongType), StructField("ts", TimestampType),
      StructField("eid", LongType), StructField("etype", StringType),
      StructField("value", DoubleType)))
    def ev(uid: Long, t: String, eid: Long, tp: String, v: Double = 0.0) =
      s"""{"uid":$uid,"ts":"$t","eid":$eid,"etype":"$tp","value":$v}"""
    import scala.jdk.CollectionConverters._
    // user 1: three views + a click, purchase of 10.0 in a LATER batch
    // (the segment crosses the boundary); a second immediate purchase
    // finds a cleared segment and emits nothing.
    // user 2: 25 views then a purchase — only the 20 most recent carry
    // weight; the 5 oldest views must get no credit (the state cap is
    // exactly the batch rule's zero-weight horizon).
    // user 3: purchase with no touches at all — nothing.
    Files.write(src.resolve("a.json"), (Seq(
      ev(1, "2024-01-01T10:00:00.000Z", 1, "view"),
      ev(1, "2024-01-01T10:10:00.000Z", 2, "view"),
      ev(1, "2024-01-01T10:20:00.000Z", 3, "view"),
      // foreign event types between touches and purchase must be
      // IGNORED (batch w23 filters to view/click/purchase): an "error"
      // must earn no credit, never evict a real touch from the 20-cap,
      // and its null value must not kill the primitive-Double decode
      """{"uid":1,"ts":"2024-01-01T10:25:00.000Z","eid":9,"etype":"error","value":null}""",
      ev(1, "2024-01-01T10:30:00.000Z", 4, "click")) ++
      (0 until 25).map(i =>
        ev(2, f"2024-01-01T09:${i}%02d:00.000Z", 100 + i, "view")) :+
      ev(3, "2024-01-01T08:00:00.000Z", 300, "purchase", 5.0)).asJava)
    Files.write(src.resolve("b.json"), Seq(
      ev(1, "2024-01-01T11:00:00.000Z", 5, "purchase", 10.0),
      ev(1, "2024-01-01T11:00:01.000Z", 6, "purchase", 3.0),
      ev(2, "2024-01-01T09:30:00.000Z", 200, "purchase", 1.0)).asJava)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(src.toString)
      val q = CdcStream.decayAttributionStream(stream, "uid", "ts", "eid", "etype", "value")
        .writeStream.format("memory").queryName("da_out")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("da_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          r.getLong(4))).toSet
      // user 1: the batch arithmetic verbatim
      val w1 = Seq(1000000L, 500000L, 250000L, 125000L) // click, v3, v2, v1
      val sw1 = w1.sum
      val u1 = Set(
        (1L, 5L, "click", w1(0), 10000000L * w1(0) / sw1),
        (1L, 5L, "view", w1(1), 10000000L * w1(1) / sw1),
        (1L, 5L, "view", w1(2), 10000000L * w1(2) / sw1),
        (1L, 5L, "view", w1(3), 10000000L * w1(3) / sw1))
      val w2 = (0 until 20).map(i => 1000000L >> i)
      val sw2 = w2.sum
      val u2 = w2.map(w => (2L, 200L, "view", w, 1000000L * w / sw2)).toSet
      assert(got === u1 ++ u2,
        "streamed decay credits diverge from the batch arithmetic")
      // cap evidence: exactly 20 credits for user 2's 25 touches, and
      // no second-purchase or touchless-purchase rows anywhere
      assert(got.count(_._1 == 2L) === 20)
      assert(!got.exists(_._2 == 6L) && !got.exists(_._1 == 3L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streamStaticDedup flags incoming docs against the static corpus index") {
    import spark.implicits._
    val src = tmp("ssd-src"); val ckpt = tmp("ssd-ck")
    Files.write(src.resolve("in.json"), java.util.Arrays.asList(
      """{"id":100,"ts":"2024-01-01T00:00:00.000Z","payload":"known-text"}""",
      """{"id":101,"ts":"2024-01-01T00:00:01.000Z","payload":"fresh-text"}"""))

    val index = Seq(("known-text", 7L)).toDF("payload", "keeper_id")
    val stream = spark.readStream.schema(eventSchema).json(src.toString)
    val q = CdcStream.streamStaticDedup(stream, index, "payload", "keeper_id")
      .select(col("id"), col("dup_of"))
      .writeStream.format("memory").queryName("ssd_out")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("ssd_out")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(got === Set((100L, Some(7L)), (101L, None)))
  }

  test("streaming near-dup: projection signatures equal the batch pipeline; arriving clone flags") {
    import spark.implicits._
    val docsDf = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "completely different words with no overlap whatsoever here today"))
      .toDF("doc_id", "text")

    // 1. the pure-projection form is row-for-row the batch pipeline
    val batch = graft.queries.Documents.bandSignatures(spark, docsDf)
      .collect().map(_.toString).sorted.toSeq
    val proj = graft.queries.Documents.streamingSignatures(docsDf)
      .collect().map(_.toString).sorted.toSeq
    assert(proj === batch, "projection signatures differ from the batch pipeline")

    // 2. live stream-static flow: doc 100 clones doc 1 (near-dup must
    // flag with dup_of=1), doc 101 is novel (no output row)
    val src = tmp("nd-src"); val ckpt = tmp("nd-ck")
    Files.write(src.resolve("in.json"), java.util.Arrays.asList(
      """{"doc_id":100,"text":"alpha beta gamma delta epsilon zeta eta theta iota kappa"}""",
      """{"doc_id":101,"text":"entirely fresh unseen content streaming in right now friends"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).json(src.toString)
    val corpusSigs = graft.queries.Documents.bandSignatures(spark, docsDf)
    val q = graft.queries.Documents.streamNeardup(stream, corpusSigs)
      .writeStream.format("memory").queryName("nd_out")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("nd_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.map(t => (t._1, t._2)) === Set((100L, 1L)),
      s"expected exactly the planted clone pair, got $got")
    assert(got.forall(_._3 >= 0.5))
  }

  test("streamIntervalJoin pairs events within the bound, evicts beyond it") {
    val clicks = tmp("cl"); val buys = tmp("by"); val ckpt = tmp("jj-ck")
    Files.write(clicks.resolve("c.json"), java.util.Arrays.asList(
      """{"id":7,"ts":"2024-01-01T00:10:00.000Z","payload":"click-in-window"}""",
      """{"id":7,"ts":"2024-01-01T00:40:00.000Z","payload":"click-after"}""",
      """{"id":7,"ts":"2023-12-31T22:00:00.000Z","payload":"click-too-old"}""",
      """{"id":8,"ts":"2024-01-01T00:15:00.000Z","payload":"other-user"}"""))
    Files.write(buys.resolve("b.json"), java.util.Arrays.asList(
      """{"id":7,"ts":"2024-01-01T00:30:00.000Z","payload":"purchase"}"""))

    val clickStream = spark.readStream.schema(eventSchema).json(clicks.toString)
      .select(col("id"), col("ts").as("click_ts"), col("payload").as("click"))
    val buyStream = spark.readStream.schema(eventSchema).json(buys.toString)
      .select(col("id"), col("ts").as("buy_ts"), col("payload").as("buy"))

    val q = CdcStream.streamIntervalJoin(
        buyStream, clickStream,
        key = "id", leftTs = "buy_ts", rightTs = "click_ts",
        bound = "1 hour", watermark = "2 hours")
      .select(col("l.id"), col("click"))
      .writeStream.format("memory").queryName("jj_out")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("jj_out")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // only the click within [buy-1h, buy] for the same user joins
    assert(got === Set((7L, "click-in-window")))
  }

  // ---- per-user state TTL (the round-8 verdict's top scale item): the
  // four per-user twins thread `ttl` through to the state store, so
  // years of one-shot users cannot accumulate in RocksDB forever. Two
  // proofs: (a) an IDLE key's state expires — later events for it find
  // nothing; (b) WITHIN the horizon results are unchanged vs the no-TTL
  // (= batch-rule-equivalent) run. A TTL'd query runs in processing-time
  // mode and never self-terminates (documented on statefulLatestTws), so
  // these poll the sink and stop explicitly.

  private val twinSchema = StructType(Seq(
    StructField("uid", LongType), StructField("ts", TimestampType),
    StructField("eid", LongType), StructField("etype", StringType),
    StructField("value", DoubleType)))

  private def twinEv(uid: Long, t: String, eid: Long, tp: String, v: Double = 0.0) =
    s"""{"uid":$uid,"ts":"$t","eid":$eid,"etype":"$tp","value":$v}"""

  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def pollSink(q: org.apache.spark.sql.streaming.StreamingQuery,
      table: String, atLeast: Long): Unit = {
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (spark.table(table).count() < atLeast && System.nanoTime() < deadline) {
      q.exception.foreach(e => throw e)
      Thread.sleep(200)
    }
    assert(spark.table(table).count() >= atLeast,
      s"sink $table never reached $atLeast rows")
  }

  test("per-user twins with ttl: an idle key's state expires in the store") {
    import java.time.Duration
    import scala.jdk.CollectionConverters._
    val ttl = Some(Duration.ofSeconds(1))
    // one source dir + sink per twin; a shared 2.5 s quiet period between
    // file a (user 1 seeds state everywhere) and file b (user 1 returns
    // AFTER the horizon; user 77 is the fresh in-batch sentinel proving
    // batch b was fully processed). User 60 is the batch-a sentinel.
    val dirs = Seq("fnttl", "atttl", "trttl", "dcttl").map(n => (n, tmp(s"$n-src"), tmp(s"$n-ck")))
    val Seq((_, fnSrc, fnCk), (_, atSrc, atCk), (_, trSrc, trCk), (_, dcSrc, dcCk)) = dirs
    def stream(src: java.nio.file.Path) =
      spark.readStream.schema(twinSchema).json(src.toString)

    Files.write(fnSrc.resolve("a.json"), Seq(
      twinEv(60, "2024-01-01T10:00:00.000Z", 1, "view"),
      twinEv(60, "2024-01-01T10:30:00.000Z", 2, "click"),
      twinEv(1, "2024-01-01T10:00:00.000Z", 3, "view")).asJava)
    Files.write(atSrc.resolve("a.json"), Seq(
      twinEv(60, "2024-01-01T09:00:00.000Z", 1, "view"),
      twinEv(60, "2024-01-01T09:30:00.000Z", 2, "purchase"),
      twinEv(1, "2024-01-01T10:00:00.000Z", 3, "click")).asJava)
    Files.write(trSrc.resolve("a.json"), Seq(
      twinEv(60, "2024-01-01T09:00:00.000Z", 1, "view"),
      twinEv(60, "2024-01-01T09:30:00.000Z", 2, "click"),
      twinEv(1, "2024-01-01T10:00:00.000Z", 3, "view")).asJava)
    Files.write(dcSrc.resolve("a.json"), Seq(
      twinEv(60, "2024-01-01T09:00:00.000Z", 1, "view"),
      twinEv(60, "2024-01-01T09:30:00.000Z", 2, "purchase", 1.0),
      twinEv(1, "2024-01-01T10:00:00.000Z", 3, "click")).asJava)

    withRocksDb {
      val hugeGap = 100L * 3600 * 1000000 // so only the TTL can suppress
      val qs = Seq(
        CdcStream.funnelStream(stream(fnSrc), "uid", "ts", "eid", "etype", ttl)
          .writeStream.format("memory").queryName("fnttl_out")
          .option("checkpointLocation", fnCk.toString).start(),
        CdcStream.attributionStream(stream(atSrc), "uid", "ts", "eid", "etype", hugeGap, ttl)
          .writeStream.format("memory").queryName("atttl_out")
          .option("checkpointLocation", atCk.toString).start(),
        CdcStream.transitionStream(stream(trSrc), "uid", "ts", "eid", "etype", hugeGap, ttl)
          .writeStream.format("memory").queryName("trttl_out")
          .option("checkpointLocation", trCk.toString).start(),
        CdcStream.decayAttributionStream(stream(dcSrc), "uid", "ts", "eid", "etype", "value", ttl)
          .writeStream.format("memory").queryName("dcttl_out")
          .option("checkpointLocation", dcCk.toString).start())
      try {
        // batch-a sentinels visible => user 1's state is written and its
        // TTL clock is running
        pollSink(qs(0), "fnttl_out", 1)
        pollSink(qs(1), "atttl_out", 1)
        pollSink(qs(2), "trttl_out", 1)
        pollSink(qs(3), "dcttl_out", 1)
        Thread.sleep(2500) // > ttl: user 1's state must expire

        Files.write(fnSrc.resolve("b.json"), Seq(
          twinEv(1, "2024-01-01T11:00:00.000Z", 4, "click"),
          twinEv(77, "2024-01-01T09:00:00.000Z", 5, "view"),
          twinEv(77, "2024-01-01T09:30:00.000Z", 6, "click")).asJava)
        Files.write(atSrc.resolve("b.json"), Seq(
          twinEv(1, "2024-01-01T11:00:00.000Z", 4, "purchase"),
          twinEv(77, "2024-01-01T09:00:00.000Z", 5, "click"),
          twinEv(77, "2024-01-01T09:10:00.000Z", 6, "purchase")).asJava)
        Files.write(trSrc.resolve("b.json"), Seq(
          twinEv(1, "2024-01-01T11:00:00.000Z", 4, "click"),
          twinEv(77, "2024-01-01T09:00:00.000Z", 5, "view"),
          twinEv(77, "2024-01-01T09:30:00.000Z", 6, "click")).asJava)
        Files.write(dcSrc.resolve("b.json"), Seq(
          twinEv(1, "2024-01-01T11:00:00.000Z", 4, "purchase", 2.0),
          twinEv(77, "2024-01-01T09:00:00.000Z", 5, "click"),
          twinEv(77, "2024-01-01T09:05:00.000Z", 6, "purchase", 1.0)).asJava)

        pollSink(qs(0), "fnttl_out", 2) // funnel: u77 sentinel only
        pollSink(qs(1), "atttl_out", 3) // attribution: u1 "none" + u77
        pollSink(qs(2), "trttl_out", 2) // transition: u77 edge only
        pollSink(qs(3), "dcttl_out", 2) // decay: u77 credit only
        // the eviction READOUT (w29's evicted_rows column) counts these
        // real expiries: each twin processed user 1's expired state in
        // batch b, so the progress metrics must record at least one
        // TTL removal per query — this is the positive control for the
        // profile's deterministic zero
        qs.zip(Seq("funnel", "attribution", "transition", "decay"))
          .foreach { case (q, n) =>
            // memory-sink rows land during addBatch but the batch's
            // progress entry is appended in finishTrigger — poll past
            // that gap instead of racing it
            def evictions() = graft.streaming.QueryMonitor
              .stateEvictions(q.recentProgress.toSeq)
            val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
            while (evictions() < 1L && System.nanoTime() < deadline)
              Thread.sleep(200)
            assert(evictions() >= 1L,
              s"$n twin recorded no TTL eviction in its progress metrics")
          }
      } finally qs.foreach(_.stop())
    }
    val mUs = 60L * 1000000
    // funnel: user 1's click found its view EXPIRED (no latency row);
    // without the ttl the restart proof above shows it WOULD emit
    assert(spark.table("fnttl_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((60L, "1_view_to_click"), (77L, "1_view_to_click")),
      "an expired partial funnel still credited a stage")
    // attribution: user 1's purchase found its touch EXPIRED -> "none"
    // (an EMITTED eviction witness, not just an absence)
    assert(spark.table("atttl_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      === Set((60L, "view", 30 * mUs), (1L, "none", -1L), (77L, "click", 10 * mUs)),
      "an expired touch still received attribution credit")
    // transition: user 1's post-expiry click opens a FRESH path (no edge)
    assert(spark.table("trttl_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      === Set((60L, "view", "click"), (77L, "view", "click")),
      "an expired last-event still paired into an edge")
    // decay: user 1's purchase found its open segment EXPIRED (no credit)
    assert(spark.table("dcttl_out").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
      === Set((60L, "view"), (77L, "click")),
      "expired open touches still earned decay credit")
  }

  test("per-user twins with ttl: within the horizon results equal the no-ttl rule") {
    import java.time.Duration
    import scala.jdk.CollectionConverters._
    val ttl = Some(Duration.ofHours(1))
    // the same per-key state must SURVIVE a micro-batch boundary (file a
    // then file b via maxFilesPerTrigger=1) and produce exactly the rows
    // the no-ttl twins (proven batch-equivalent above) would
    val dirs = Seq("fnh", "ath", "trh", "dch").map(n => (n, tmp(s"$n-src"), tmp(s"$n-ck")))
    val Seq((_, fnSrc, fnCk), (_, atSrc, atCk), (_, trSrc, trCk), (_, dcSrc, dcCk)) = dirs
    Seq(fnSrc, atSrc, trSrc, dcSrc).foreach { src =>
      Files.write(src.resolve("a.json"), Seq(
        twinEv(1, "2024-01-01T10:00:00.000Z", 1,
          if (src == atSrc || src == dcSrc) "click" else "view")).asJava)
      Files.write(src.resolve("b.json"), Seq(
        twinEv(1, "2024-01-01T11:00:00.000Z", 2,
          if (src == atSrc || src == dcSrc) "purchase" else "click", 2.0)).asJava)
    }
    def stream(src: java.nio.file.Path) =
      spark.readStream.schema(twinSchema).option("maxFilesPerTrigger", 1)
        .json(src.toString)
    withRocksDb {
      val hugeGap = 100L * 3600 * 1000000
      val qs = Seq(
        CdcStream.funnelStream(stream(fnSrc), "uid", "ts", "eid", "etype", ttl)
          .writeStream.format("memory").queryName("fnh_out")
          .option("checkpointLocation", fnCk.toString).start(),
        CdcStream.attributionStream(stream(atSrc), "uid", "ts", "eid", "etype", hugeGap, ttl)
          .writeStream.format("memory").queryName("ath_out")
          .option("checkpointLocation", atCk.toString).start(),
        CdcStream.transitionStream(stream(trSrc), "uid", "ts", "eid", "etype", hugeGap, ttl)
          .writeStream.format("memory").queryName("trh_out")
          .option("checkpointLocation", trCk.toString).start(),
        CdcStream.decayAttributionStream(stream(dcSrc), "uid", "ts", "eid", "etype", "value", ttl)
          .writeStream.format("memory").queryName("dch_out")
          .option("checkpointLocation", dcCk.toString).start())
      try {
        pollSink(qs(0), "fnh_out", 1)
        pollSink(qs(1), "ath_out", 1)
        pollSink(qs(2), "trh_out", 1)
        pollSink(qs(3), "dch_out", 1)
      } finally qs.foreach(_.stop())
    }
    val hourUs = 3600L * 1000000
    assert(spark.table("fnh_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      === Set((1L, "1_view_to_click", hourUs)),
      "funnel state within the ttl horizon diverged from the no-ttl rule")
    assert(spark.table("ath_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      === Set((1L, "click", hourUs)),
      "attribution within the ttl horizon diverged from the no-ttl rule")
    assert(spark.table("trh_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      === Set((1L, "view", "click", hourUs)),
      "transition within the ttl horizon diverged from the no-ttl rule")
    assert(spark.table("dch_out").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4))).toSet
      === Set((1L, "click", 1000000L, 2000000L)),
      "decay credit within the ttl horizon diverged from the no-ttl rule")
  }

  test("w29 state profile matches the batch twins' own readouts") {
    // the profile's two columns per twin, re-derived INDEPENDENTLY from
    // the fixture with batch DataFrames (the oracle gate checks the same
    // numbers against DuckDB; this pins them against the in-repo batch
    // twins so a twin/profile divergence is caught without the oracle)
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val profRows = graft.queries.Events.w29StateProfile(spark, dir).collect()
    // TTL-less, timer-less twins: any nonzero eviction count would mean
    // state silently vanished mid-profile
    profRows.foreach(r => assert(r.getLong(3) === 0L,
      s"${r.getString(0)} twin reported evictions without a TTL"))
    val prof = profRows
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = graft.Tables.load(spark, dir, "events")
    val users = ev.select("user_id").distinct().count()

    // funnel: state = every user; one emission per stage-2 reach, two
    // more per stage-3 — w13's own steps_reached is the readout
    val w13 = graft.queries.Events.w13Funnel(spark, dir)
    val s2 = w13.filter(col("steps_reached") >= 2).count()
    val s3 = w13.filter(col("steps_reached") === 3).count()
    assert(prof("funnel") === ((users, s2 + 2 * s3)),
      "funnel profile diverges from w13's stage counts")

    // last_touch: state only on view/click; every purchase emits once
    val touchUsers = ev.filter(col("event_type").isin("view", "click"))
      .select("user_id").distinct().count()
    val purchases = ev.filter(col("event_type") === "purchase").count()
    assert(prof("last_touch") === ((touchUsers, purchases)),
      "last-touch profile diverges from the fixture's touch/purchase counts")

    // transition: state = every user; emissions = w17's matrix total
    val transitions = graft.queries.Events.w17TransitionMatrix(spark, dir)
      .agg(sum("n_transitions")).head.getLong(0)
    assert(prof("transition") === ((users, transitions)),
      "transition profile diverges from w17's matrix total")

    // decay: open-segment rule — touches after the user's last purchase
    // hold state; each purchase emits its segment's touches capped at 20
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val de = ev.filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("seg", count(when(col("event_type") === "purchase", 1))
        .over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
    val openUsers = de.groupBy("user_id").agg(
        max(when(col("event_type") =!= "purchase", col("rn"))).as("lt"),
        max(when(col("event_type") === "purchase", col("rn"))).as("lp"))
      .filter(col("lt").isNotNull && (col("lp").isNull || col("lt") > col("lp")))
      .count()
    val dtouch = de.filter(col("event_type") =!= "purchase")
      .groupBy("user_id", "seg").agg(count(lit(1)).as("ntouch"))
    val credits = de.filter(col("event_type") === "purchase")
      .join(dtouch, Seq("user_id", "seg"))
      .agg(coalesce(sum(least(col("ntouch"), lit(20L))), lit(0L)))
      .head.getLong(0)
    assert(prof("decay_attribution") === ((openUsers, credits)),
      "decay profile diverges from the open-segment batch rule")
  }

  // ---- streaming retrieval twins (VERDICT r11 #5 / r12 #4): arriving
  // queries against the persisted BM25/embedding state must reproduce
  // the batch p27/v28 rows bit-for-bit on AvailableNow ----

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming RRF twin: arriving queries fuse to the batch p27 rows bit-for-bit") {
    def key(qid: Long, rank: Long) = (qid, rank)
    val batch = graft.queries.Pipeline.p27RankFusion(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getDouble(5)))
      .sortBy(t => key(t._1, t._2)).toSeq
    assert(batch.nonEmpty)

    // the arriving query: doc text (lexical leg) + embedding (vector leg)
    val arrivals = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 3).select(col("doc_id").as("qid"), col("text"))
      .join(Tables.load(spark, sfDir, "embeddings").filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding")), Seq("qid"))
    val src = tmp("rrf-src"); val ckpt = tmp("rrf-ck")
    // each query row delivered TWICE in the same micro-batch: the
    // at-least-once contract — intra-batch duplicates must dedup on the
    // per-query-unique keys, not double-count lexical contribs or
    // halve the distinct candidate pool
    arrivals.unionAll(arrivals).write.parquet(src.resolve("q").toString)

    val stream = spark.readStream.schema(arrivals.schema)
      .parquet(src.resolve("q").toString)
    val out = graft.streaming.RetrievalStream.streamRankFusion(stream,
      graft.queries.Pipeline.bm25Contrib(spark, sfDir),
      Tables.load(spark, sfDir, "embeddings"))
    val q = out.writeStream.format("memory").queryName("rrf_twin")
      .outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("rrf_twin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getDouble(5)))
      .sortBy(t => key(t._1, t._2)).toSeq
    assert(got === batch, "streamed fusion diverges from batch p27")
  }

  test("streaming MMR twin: arriving queries diversify to the batch v28 rows bit-for-bit") {
    val batch = graft.queries.Vectors.v28MmrDiversify(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(batch.nonEmpty)

    val arrivals = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding"))
    val src = tmp("mmr-src"); val ckpt = tmp("mmr-ck")
    // duplicated delivery, as in the RRF twin: the depth-20 pool must
    // hold 20 DISTINCT candidates
    arrivals.unionAll(arrivals).write.parquet(src.resolve("q").toString)

    val stream = spark.readStream.schema(arrivals.schema)
      .parquet(src.resolve("q").toString)
    val out = graft.streaming.RetrievalStream.streamMmrDiversify(stream,
      Tables.load(spark, sfDir, "embeddings"))
    val q = out.writeStream.format("memory").queryName("mmr_twin")
      .outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("mmr_twin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got === batch, "streamed MMR selection diverges from batch v28")
  }

  test("streaming cluster twin: arriving shard converges to the batch d26 labels under duplicate delivery") {
    // VERDICT r13 #6: the incremental-clustering family's streaming twin.
    // The shard docs ARRIVE as a stream (multiple micro-batches, one doc
    // slice re-delivered outright); the maintained star must converge to
    // the batch d26 query's exact labels — same base artifacts (the
    // persisted base signature table and base star), same delta scoring
    // (streamNeardup ≡ the minhash estimator), same re-convergence code
    // (Documents.applyDeltaToStar, shared by construction).
    val dir = "/root/testdata/sf0.001"
    val expected = graft.queries.Documents.d26IncrementalClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(expected.nonEmpty, "batch d26 sanity: the shard must cluster something")

    val shardMod = graft.queries.Documents.D20ShardMod.toLong
    val isShard = pmod(col("doc_id"), lit(shardMod)) === 0
    val baseSigs = graft.queries.Documents.incSigTable(spark, dir)
      .filter(!isShard)
    val baseStar = graft.queries.Documents.incBaseStar(spark, dir)
    val shardDocs = Tables.load(spark, dir, "documents")
      .filter(isShard).select(col("doc_id"), col("text"))

    val src = tmp("cs-src"); val ckpt = tmp("cs-ck"); val state = tmp("cs-state")
    // three appends -> multiple source files: the first half, the second
    // half, then the FIRST HALF AGAIN (an at-least-once duplicate
    // delivery of 25 whole documents) — the sig-store anti-join and the
    // idempotent star application must make the replay a label no-op
    val half1 = shardDocs.filter(pmod(col("doc_id"), lit(2 * shardMod)) === 0)
    val half2 = shardDocs.filter(pmod(col("doc_id"), lit(2 * shardMod)) =!= 0)
    half1.write.mode("append").parquet(src.toString)
    half2.write.mode("append").parquet(src.toString)
    half1.write.mode("append").parquet(src.toString)

    val stream = spark.readStream.schema(shardDocs.schema)
      .option("maxFilesPerTrigger", "2").parquet(src.toString)
    val q = graft.streaming.ClusterStream.start(
      stream, baseSigs, baseStar,
      stateDir = state.toString, checkpointDir = ckpt.toString,
      ccFamily = "cc_twin")
    q.awaitTermination()

    val got = graft.streaming.ClusterStream.labels(spark, state.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected,
      "streamed cluster maintenance diverges from the batch d26 labels")
  }

  test("streaming cluster twin resumes from its checkpoint across restarts") {
    // the CDC resume path: the stream terminates after the first half of
    // the shard, a NEW query incarnation restarts on the same checkpoint
    // and state, and only then does the second half arrive — the
    // checkpoint must skip the processed files and the star/sig stores
    // must carry the first incarnation's state forward to the same
    // converged labels
    val dir = "/root/testdata/sf0.001"
    val expected = graft.queries.Documents.d26IncrementalClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val shardMod = graft.queries.Documents.D20ShardMod.toLong
    val isShard = pmod(col("doc_id"), lit(shardMod)) === 0
    val baseSigs = graft.queries.Documents.incSigTable(spark, dir)
      .filter(!isShard)
    val baseStar = graft.queries.Documents.incBaseStar(spark, dir)
    val shardDocs = Tables.load(spark, dir, "documents")
      .filter(isShard).select(col("doc_id"), col("text"))

    val src = tmp("csr-src"); val ckpt = tmp("csr-ck"); val state = tmp("csr-state")
    def incarnation(): Unit = {
      val stream = spark.readStream.schema(shardDocs.schema)
        .parquet(src.toString)
      val q = graft.streaming.ClusterStream.start(
        stream, baseSigs, baseStar,
        stateDir = state.toString, checkpointDir = ckpt.toString,
        ccFamily = "cc_twin_r")
      q.awaitTermination()
    }
    shardDocs.filter(pmod(col("doc_id"), lit(2 * shardMod)) === 0)
      .write.mode("append").parquet(src.toString)
    incarnation()
    val mid = graft.streaming.ClusterStream.labels(spark, state.toString).count()
    shardDocs.filter(pmod(col("doc_id"), lit(2 * shardMod)) =!= 0)
      .write.mode("append").parquet(src.toString)
    incarnation()

    val got = graft.streaming.ClusterStream.labels(spark, state.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected,
      s"restarted cluster maintenance diverges from batch d26 " +
        s"(first incarnation left $mid labeled docs)")
  }
}
