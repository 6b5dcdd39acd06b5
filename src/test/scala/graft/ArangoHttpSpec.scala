package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{ArangoHttp, ArangoHttpCollectionSource}
import org.apache.spark.sql.functions._

/** The live-Arango edge against a REAL HTTP protocol exchange: an
  * in-process Arango-shaped server (JDK HttpServer — the Derby/SMTP
  * move applied to the source side) serves the documented cursor and
  * replication endpoints, and the client must speak them exactly:
  * basic auth on every call, cursor paging until hasMore=false, WAL
  * tail from an exclusive lower bound, and the spool handoff that turns
  * tailed NDJSON into [[graft.sources.WalSource]] chunks the whole
  * tested replication stack already runs on.
  */
class ArangoHttpSpec extends SparkSpec {

  private val docs = (1 to 5).map(i => s"""{"k":$i,"v":"$i.5"}""")

  /** Arango-shaped mini server: 3-page cursor over `docs`, lastTick,
    * and a tail whose content grows when `headTick` is raised.
    */
  private def miniArango(): (HttpServer, () => Unit, () => Int) = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var headTick = 20L
    @volatile var unauthorized = 0
    val expectAuth = "Basic " + java.util.Base64.getEncoder.encodeToString(
      "root:pw".getBytes(StandardCharsets.UTF_8))
    def reply(ex: HttpExchange, code: Int, body: String,
        headers: Map[String, String] = Map.empty): Unit = {
      headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.close()
    }
    def authed(ex: HttpExchange)(ok: => Unit): Unit =
      if (ex.getRequestHeaders.getFirst("Authorization") != expectAuth) {
        unauthorized += 1; reply(ex, 401, """{"error":true,"code":401}""")
      } else ok
    server.createContext("/_db/d/_api/cursor", (ex: HttpExchange) =>
      authed(ex) {
        val path = ex.getRequestURI.getPath
        if (path.endsWith("/cursor")) // first page
          reply(ex, 201, s"""{"result":[${docs(0)},${docs(1)}],"hasMore":true,"id":"c1","code":201}""")
        else if (path.endsWith("/c1") && ex.getRequestMethod == "PUT")
          reply(ex, 200, s"""{"result":[${docs(2)},${docs(3)}],"hasMore":true,"id":"c2","code":200}""")
        else if (path.endsWith("/c2") && ex.getRequestMethod == "PUT")
          reply(ex, 200, s"""{"result":[${docs(4)}],"hasMore":false,"code":200}""")
        else reply(ex, 404, """{"error":true,"code":404}""")
      })
    server.createContext("/_db/d/_api/wal/lastTick", (ex: HttpExchange) =>
      authed(ex)(reply(ex, 200, s"""{"tick":"$headTick"}""")))
    server.createContext("/_db/d/_api/wal/tail", (ex: HttpExchange) =>
      authed(ex) {
        val from = ex.getRequestURI.getQuery.split("=")(1).toLong
        // envelope lines in the WalSource contract; tick doubles as the
        // offset (Arango ticks are the global order); the payload is in
        // the Doc schema so the resync e2e can transform it
        val lines = ((from + 1) to headTick).map { t =>
          s"""{"tick":"$t","type":2300,"db":"d","cuid":"c1","tid":"t","data":"{\\"k\\": ${t % 4}, \\"v\\": \\"$t.5\\"}","offset":$t}"""
        }
        reply(ex, 200, lines.mkString("\n"),
          Map("X-Arango-Replication-Lastincluded" -> headTick.toString))
      })
    server.start()
    (server, () => headTick = 25L, () => unauthorized)
  }

  test("cursor scan pages to exhaustion, tail spools into WalSource, ticks line up") {
    val (server, advanceHead, unauthorized) = miniArango()
    try {
      val cfg = ArangoHttp.Config(
        s"http://127.0.0.1:${server.getAddress.getPort}", "d", "root", "pw")
      val spool = Files.createTempDirectory("arango-spool").toString
      val src = ArangoHttpCollectionSource(cfg, "events", spool, batchSize = 2)

      // snapshot: all 5 docs across the 3 cursor pages, schema inferred
      val snap = src.snapshot(spark)
      assert(snap.count() === 5)
      assert(snap.agg(sum(col("k"))).head.getLong(0) === 15L)

      // tick BEFORE scan (the resync ordering contract)
      assert(src.currentTick(spark) === 20L)

      // pump 1: spools ticks 1..20 as one atomic chunk
      assert(src.pump() === Some((1L, 20L)))
      assert(src.spoolTick() === 20L)
      // pump with nothing new: no chunk, high water unchanged
      assert(src.pump() === None)
      // upstream advances; pump 2 tails ONLY the delta (from=20)
      advanceHead()
      assert(src.pump() === Some((21L, 25L)))
      assert(src.spoolTick() === 25L)

      // the spool is a first-class WalSource dir: batch-read it and the
      // envelope contract holds end to end (ticks exact, no dup/loss)
      val wal = spark.read.format("graft.sources.WalSource").load(spool)
      assert(wal.count() === 25L)
      assert(wal.agg(min(col("tick")), max(col("tick"))).head match {
        case r => r.getLong(0) == 1L && r.getLong(1) == 25L
      })
      assert(graft.streaming.Sync.currentTick(spark, spool) === 25L)
      // and the streaming form drains the same rows (the r6 machinery)
      val streamed = spark.readStream.format("graft.sources.WalSource")
        .load(spool)
      val q = streamed.writeStream.format("memory").queryName("arango_wal")
        .option("checkpointLocation",
          Files.createTempDirectory("arango-ck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(spark.table("arango_wal").count() === 25L)
      assert(unauthorized() === 0)
    } finally server.stop(0)
  }

  test("full resync lifecycle runs over the live HTTP transport end to end") {
    import graft.config.{ColumnSpec, TableConfig}
    import org.apache.spark.sql.types._
    val (server, advanceHead, _) = miniArango()
    try {
      val cfg = ArangoHttp.Config(
        s"http://127.0.0.1:${server.getAddress.getPort}", "d", "root", "pw")
      val spool = Files.createTempDirectory("rs-spool").toString
      val src = ArangoHttpCollectionSource(cfg, "events", spool, batchSize = 2)
      val config = TableConfig("Doc", Seq(
        ColumnSpec("K", Seq("int"), ref = Some("k"), primaryKey = true),
        ColumnSpec("V", Seq("float"), ref = Some("v"), default = Some(0.0))))
      val payloadSchema = StructType(Seq(
        StructField("k", LongType), StructField("v", StringType)))
      val tableDir = Files.createTempDirectory("rs-tbl").toString
      val ckpt = Files.createTempDirectory("rs-ck").toString
      val clock = lit("2024-01-01").cast("timestamp")

      // backlog already in the WAL when the resync begins: ticks 1..20
      // land in the spool; the tick high-pass drops everything BELOW the
      // resync tick and replays the tick-20 event itself — the inclusive
      // overlap direction (an event at the cutoff may or may not be in
      // the snapshot, and replaying it is idempotent; dropping it could
      // lose a change)
      assert(src.pump() === Some((1L, 20L)))
      val r = graft.streaming.Sync.resync(spark, src, config, payloadSchema,
        tableDir, ckpt, collectionIds = Seq("c1"), clock = clock,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        queryName = None)
      assert(r.initialTick === 20L, "tick must be read from the server BEFORE the scan")
      r.query.awaitTermination()
      val afterSnap = graft.streaming.CdcStream
        .currentView(spark, tableDir, keys = Seq("K"))
        .select("K", "V").collect()
        .map(x => (x.getLong(0), x.getDouble(1))).toMap
      assert(afterSnap ===
        (1 to 5).map(i => i.toLong -> (i + 0.5)).toMap + (0L -> 20.5),
        "backlog below the resync tick must not override the snapshot; " +
          "the tick-20 overlap event must replay (k=0)")

      // upstream moves on; the pump tails only the delta and the SAME
      // checkpoint continues the stream — the steady-state leg
      advanceHead()
      assert(src.pump() === Some((21L, 25L)))
      val q2 = graft.streaming.CdcStream.startReplication(
        src.changes(spark), config, payloadSchema, tableDir, ckpt,
        collectionIds = Seq("c1"), initialTick = Some(r.initialTick), clock = clock)
      q2.awaitTermination()
      val finalView = graft.streaming.CdcStream
        .currentView(spark, tableDir, keys = Seq("K"))
        .select("K", "V").collect()
        .map(x => (x.getLong(0), x.getDouble(1))).toMap
      // ticks 21..25 upsert k = t % 4 with v = t.5; latest tick per key
      // wins over both the snapshot and earlier deltas
      assert(finalView === Map(
        0L -> 24.5, 1L -> 25.5, 2L -> 22.5, 3L -> 23.5,
        4L -> 4.5, 5L -> 5.5),
        "steady-state deltas did not apply latest-wins over the snapshot")
    } finally server.stop(0)
  }

  test("wrong credentials fail loudly with the server's 401, not silently") {
    val (server, _, unauthorized) = miniArango()
    try {
      val bad = ArangoHttp.Config(
        s"http://127.0.0.1:${server.getAddress.getPort}", "d", "root", "WRONG")
      val e = intercept[RuntimeException](new ArangoHttp.Client(bad).lastTick())
      assert(e.getMessage.contains("401"), s"wrong failure mode: ${e.getMessage}")
      assert(unauthorized() === 1)
    } finally server.stop(0)
  }
}
