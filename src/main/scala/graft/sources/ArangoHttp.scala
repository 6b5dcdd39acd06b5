package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Live ArangoDB transport over the PUBLIC HTTP REST API — the last
  * ranked "missing" edge (the reference talks to Arango through client
  * libraries wrapping exactly these endpoints: AQL cursor paging in
  * `arangodb/connect.py:28-63`, WAL tick/tail in `arangodb/wal.py:16-30`).
  * The JDK ships `java.net.http.HttpClient`, so the transport needs no
  * dependency; Jackson (already on Spark's classpath, already used by
  * [[WalSource]]) parses the protocol JSON.
  *
  * Endpoints (Arango's documented replication/cursor API):
  *  - `POST /_db/{db}/_api/cursor` `{query, batchSize}` →
  *    `{result: [...], hasMore, id}`; `PUT /_db/{db}/_api/cursor/{id}`
  *    pages until `hasMore=false` — the reference's `select()` loop.
  *  - `GET /_db/{db}/_api/wal/lastTick` → `{tick: "N"}` — the cursor a
  *    resync reads BEFORE its snapshot scan (`get_last_tick`).
  *  - `GET /_db/{db}/_api/wal/tail?from=N` → NDJSON envelope lines +
  *    `X-Arango-Replication-Lastincluded` header.
  *
  * Offline there is no live Arango; ArangoHttpSpec runs the full
  * protocol against an in-process Arango-shaped HTTP server (the Derby/
  * SMTP move applied to the source edge), including auth, multi-page
  * cursors, incremental tails, and the spool handoff into [[WalSource]].
  */
object ArangoHttp {

  final case class Config(
      baseUrl: String, // e.g. http://host:8529
      db: String,
      user: String,
      password: String,
      timeoutMs: Int = 30000)

  final class Client(cfg: Config) {
    private val http = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(cfg.timeoutMs.toLong))
      .build()
    private val mapper = new ObjectMapper()
    private val auth = "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"${cfg.user}:${cfg.password}".getBytes(StandardCharsets.UTF_8))

    private def send(method: String, path: String, body: Option[String])
        : HttpResponse[String] = {
      val b = HttpRequest.newBuilder(URI.create(s"${cfg.baseUrl}$path"))
        .timeout(java.time.Duration.ofMillis(cfg.timeoutMs.toLong))
        .header("Authorization", auth)
        .header("Content-Type", "application/json")
      val req = (body match {
        case Some(s) => b.method(method, HttpRequest.BodyPublishers.ofString(s))
        case None    => b.method(method, HttpRequest.BodyPublishers.noBody())
      }).build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        sys.error(s"arango $method $path -> HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      resp
    }

    private def json(method: String, path: String, body: Option[String]): JsonNode =
      mapper.readTree(send(method, path, body).body())

    /** `wal.get_last_tick()` — GET lastTick (tick is a STRING in the
      * protocol; Arango ticks exceed double precision).
      */
    def lastTick(): Long =
      json("GET", s"/_db/${cfg.db}/_api/wal/lastTick", None).get("tick").asText.toLong

    /** The reference's `select()` paging loop: run an AQL query, follow
      * the cursor until `hasMore=false`, yield each result element as
      * compact JSON text. Driver-paged exactly like the reference's
      * single-cursor scan; a production deployment shards the collection
      * into key ranges and opens one cursor per executor — the protocol
      * below is what each of those shards speaks.
      */
    def cursorQuery(aql: String, batchSize: Int = 10000): Seq[String] = {
      val out = Seq.newBuilder[String]
      var node = json("POST", s"/_db/${cfg.db}/_api/cursor",
        Some(mapper.createObjectNode()
          .put("query", aql).put("batchSize", batchSize).toString))
      var continue = true
      while (continue) {
        node.get("result").forEach(r => out += r.toString)
        if (node.hasNonNull("hasMore") && node.get("hasMore").asBoolean()) {
          val id = node.get("id").asText
          node = json("PUT", s"/_db/${cfg.db}/_api/cursor/$id", None)
        } else continue = false
      }
      out.result()
    }

    /** One WAL tail call from an exclusive lower bound: the NDJSON
      * envelope lines plus the server's last-included tick (0 when the
      * tail is empty).
      */
    def tail(fromTick: Long): (Seq[String], Long) = {
      val resp = send("GET", s"/_db/${cfg.db}/_api/wal/tail?from=$fromTick", None)
      val lines = resp.body().linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
      val header = resp.headers().firstValue("X-Arango-Replication-Lastincluded")
      val last =
        if (header.isPresent) header.get.toLong
        else if (lines.isEmpty) 0L
        else lines.map { l => // header-less server: derive from payload
          val n = mapper.readTree(l).get("tick")
          if (n.isTextual) n.asText.toLong else n.asLong
        }.max
      (lines, last)
    }
  }
}

/** [[CollectionSource]] over the live HTTP transport: snapshot = the
  * cursor scan; changes = [[WalSource]] over a local SPOOL directory
  * that [[pump]] fills from `/_api/wal/tail` — the same shape as the
  * reference's producer (HTTP tail in, durable chunks out, consumers
  * stream from the chunks). The spool gives the tail exactly the
  * resumability WalSource already proves (checkpointed chunk offsets,
  * AvailableNow drains); the pump's high-water mark IS the spool, so a
  * crashed pump resumes from what it durably wrote, never from memory.
  */
final case class ArangoHttpCollectionSource(
    cfg: ArangoHttp.Config,
    collection: String,
    spoolDir: String,
    batchSize: Int = 10000) extends CollectionSource {

  private val client = new ArangoHttp.Client(cfg)
  private val mapper = new ObjectMapper()

  override def snapshot(spark: SparkSession): DataFrame = {
    val rows = client.cursorQuery(s"FOR d IN $collection RETURN d", batchSize)
    import spark.implicits._
    spark.read.json(spark.createDataset(rows))
  }

  override def changes(spark: SparkSession): DataFrame =
    spark.readStream.format("graft.sources.WalSource").load(spoolDir)

  override def currentTick(spark: SparkSession): Long = client.lastTick()

  /** The spool's durable high-water tick (0 on an empty spool). */
  def spoolTick(): Long = {
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(spoolDir)
    if (!Files.isDirectory(dir)) 0L
    else {
      val stream = Files.list(dir)
      try stream.iterator().asScala
        .flatMap(p => WalSource.tickRange(p.getFileName.toString))
        .map(_._2).maxOption.getOrElse(0L)
      finally stream.close()
    }
  }

  /** One pump cycle: tail everything after the spool's high water and
    * land it as ONE tick-named chunk via write-temp-then-atomic-rename
    * (a half-written chunk is never visible to WalSource's listing).
    * Returns the chunk's (firstTick, lastTick) or None when the tail
    * was empty. A deployment loops this on the reference's poll cadence
    * (`Supervisor` owns the restart policy, as for every other stream).
    */
  def pump(): Option[(Long, Long)] = {
    val from = spoolTick()
    val (lines, _) = client.tail(from)
    if (lines.isEmpty) None
    else {
      val ticks = lines.map { l =>
        val n = mapper.readTree(l).get("tick")
        if (n.isTextual) n.asText.toLong else n.asLong
      }
      val (lo, hi) = (ticks.min, ticks.max)
      val dir = Paths.get(spoolDir)
      Files.createDirectories(dir)
      val tmp = dir.resolve(s".wal-$lo-$hi.json.tmp")
      Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dir.resolve(s"wal-$lo-$hi.json"),
        StandardCopyOption.ATOMIC_MOVE)
      Some((lo, hi))
    }
  }

}
