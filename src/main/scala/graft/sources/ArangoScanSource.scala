package graft.sources

import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch connector for a LIVE ArangoDB collection scan,
  * partitioned by `_key` ranges — the executor-distributed form of the
  * reference's snapshot cursor (`replication/replicator/store.py:16-22`
  * pages ONE server cursor; at 100 TB that single stream, and the one
  * JVM it transits, is the bottleneck).
  *
  * Plan-time (driver, O(numPartitions) tiny AQL calls, no data):
  *  1. `RETURN LENGTH(c)` — collection count;
  *  2. `numPartitions - 1` boundary probes
  *     `FOR d IN c SORT d._key LIMIT off, 1 RETURN d._key` — each an
  *     index seek returning ONE key (Arango keeps a persistent index on
  *     `_key`), at offsets i·count/n, issued with bounded (≤8-way)
  *     client-side concurrency and assembled in OFFSET order (AQL LIMIT
  *     takes only constant/bind-param offsets, so the probes cannot be
  *     one server-side query; sequentially they would put numPartitions
  *     consecutive round trips on the plan-time critical path).
  * The boundaries split the key space into half-open ranges
  * `(-inf, b1), [b1, b2), …, [bk, +inf)` under the SERVER's collation
  * (boundaries are kept in probe order — the server's own SORT order —
  * never re-sorted client-side): coverage is complete by construction
  * and ranges are disjoint on a quiescent collection; probe staleness
  * under concurrent writes only skews partition sizes or duplicates
  * boundary-adjacent documents, never loses rows — and the scan is
  * non-transactional exactly like the reference's single cursor, with
  * the resync tick protocol (capture tick BEFORE scan, replay overlap,
  * versions collapse) absorbing concurrent changes either way.
  *
  * Run-time: each executor opens its OWN server-side cursor
  * `FOR d IN c FILTER d._key >= @lo AND d._key < @hi RETURN d`
  * (bind vars, never string-spliced keys) and streams pages through a
  * bounded buffer — one page in memory per reader, documents emitted as
  * raw JSON text rows `(doc string)` for the caller to parse
  * (`from_json` with the table's payload schema, or distributed
  * inference via `spark.read.json`).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.ArangoScanSource")
  *   .option("url", ...).option("db", ...).option("user", ...)
  *   .option("password", ...).option("collection", c)
  *   .option("numPartitions", 16).load()
  * }}}
  */
class ArangoScanSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArangoScanSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // DSv2 options are case-insensitive by contract (getTable receives
    // the original-case map): a wrongly-cased numPartitions/batchSize
    // must tune the scan, not silently fall back to the default
    val opts = new CaseInsensitiveStringMap(properties)
    def req(k: String): String = Option(opts.get(k)).getOrElse(
      throw new IllegalArgumentException(s"graft arango scan requires option '$k'"))
    val numPartitions = Option(opts.get("numPartitions"))
      .map(_.toInt).getOrElse(1)
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    val batchSize = Option(opts.get("batchSize")).map(_.toInt).getOrElse(10000)
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    new ArangoScanTable(
      ArangoHttp.Config(req("url"), req("db"), req("user"), req("password")),
      // the name is spliced into the count/probe/range AQL below — gate it
      // on Arango's collection-name charset so a hostile option value
      // cannot inject query text (keys/bounds go through bindVars)
      ArangoHttp.requireValidCollectionName(req("collection")),
      numPartitions, batchSize)
  }
}

object ArangoScanSource {
  /** Raw document JSON; payload schemas are config-driven downstream
    * (SURVEY §1.1), exactly as [[WalSource]] keeps `data` a string.
    */
  val schema: StructType = StructType(Seq(StructField("doc", StringType)))
}

private class ArangoScanTable(
    cfg: ArangoHttp.Config,
    collection: String,
    numPartitions: Int,
    batchSize: Int) extends Table with SupportsRead {

  override def name(): String = s"graft_arango(${cfg.db}/$collection)"
  override def schema(): StructType = ArangoScanSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new ArangoScan(cfg, collection, numPartitions, batchSize)
}

private class ArangoScan(
    cfg: ArangoHttp.Config,
    collection: String,
    numPartitions: Int,
    batchSize: Int) extends Scan with Batch {

  override def readSchema(): StructType = ArangoScanSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft arango scan $collection, $numPartitions key ranges"

  override def planInputPartitions(): Array[InputPartition] = {
    val client = new ArangoHttp.Client(cfg)
    val mapper = new ObjectMapper()
    val count = client.cursorQuery(s"RETURN LENGTH($collection)")
      .headOption.map(_.toLong).getOrElse(0L)
    if (count == 0L) return Array.empty
    // boundary keys at offsets i·count/n — O(1) result each; duplicates
    // (possible when n > count or keys cluster) collapse, shrinking the
    // partition count rather than emitting overlapping ranges.
    //
    // ORDER: boundaries stay in probe-offset order, which IS the
    // server's own collation order (offsets ascend under the server's
    // SORT d._key) — the order the range FILTERs are evaluated under.
    // Re-sorting client-side (JVM codepoint order) would scramble
    // mixed-case/non-ASCII keys (ICU collates 'a' < 'B'; codepoints the
    // reverse) into OVERLAPPING ranges that emit documents twice.
    // Seq#distinct preserves first-occurrence order. A concurrent write
    // shifting offsets between probes can still reorder boundaries —
    // coverage stays complete (every range is anchored to ±inf ends),
    // duplicates are possible exactly as with the reference's
    // non-transactional cursor, and the resync version-collapse absorbs
    // them; under a quiescent collection ranges are disjoint.
    val offsets = (1 until numPartitions)
      .map(i => i * count / numPartitions)
      .filter(off => off > 0 && off < count)
      .distinct
    // Probes are independent single-key index seeks — issue them with
    // BOUNDED client-side concurrency (AQL's LIMIT takes only constant/
    // bind-param offsets, so there is no one-query server-side form):
    // sequential probes serialize numPartitions round trips on the
    // driver's critical path at plan time — at 1000 partitions that is
    // 1000 consecutive RTTs before the first task can launch. Results
    // are assembled IN OFFSET ORDER regardless of completion order
    // (futures are awaited positionally), preserving the
    // server-collation boundary order the range FILTERs require.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(8, offsets.size)),
      (r: Runnable) => { // daemon: a wedged probe can't block JVM exit
        val t = new Thread(r, "graft-arango-probe"); t.setDaemon(true); t
      })
    val boundaries =
      try {
        offsets.map { off =>
          pool.submit(new java.util.concurrent.Callable[Option[String]] {
            // a concurrent shrink between count and probe can empty a
            // probe; a dropped boundary only widens a range, never
            // loses coverage
            override def call(): Option[String] = client.cursorQuery(
              s"FOR d IN $collection SORT d._key LIMIT $off, 1 RETURN d._key")
              .headOption.map(mapper.readTree(_).asText)
          })
        }.flatMap { f =>
          try f.get()
          catch { case e: java.util.concurrent.ExecutionException =>
            // re-wrap so the PLANNING-site stack survives (a bare
            // `throw e.getCause` keeps only the probe thread's trace)
            throw new RuntimeException(
              s"arango boundary probe failed: ${e.getCause}", e.getCause)
          }
        }
      } catch { case t: Throwable =>
        // EVERY failure path — ExecutionException, an interrupt landing
        // in f.get(), cancellation — must halt the queued probes NOW:
        // plain shutdown() lets them keep running (and retry-backing-
        // off) against a server we already know is failing
        pool.shutdownNow()
        // f.get() delivers a kill as InterruptedException with the flag
        // CLEARED — restore it so flag-polling callers (Spark's task
        // reaper) still see the pending interrupt
        if (t.isInstanceOf[InterruptedException])
          Thread.currentThread().interrupt()
        throw t
      } finally pool.shutdown()
    val dedupedBoundaries = boundaries.distinct
    val los = None +: dedupedBoundaries.map(Option(_))
    val his = dedupedBoundaries.map(Option(_)) :+ None
    los.zip(his).map { case (lo, hi) =>
      ArangoRangePartition(cfg, collection, lo, hi, batchSize): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArangoRangeReaderFactory
}

private case class ArangoRangePartition(
    cfg: ArangoHttp.Config,
    collection: String,
    lo: Option[String], // inclusive; None = open
    hi: Option[String], // exclusive; None = open
    batchSize: Int) extends InputPartition

private class ArangoRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ArangoRangeReader(partition.asInstanceOf[ArangoRangePartition])
}

/** Pages one key-range cursor; at most one page buffered. The client is
  * constructed HERE (executor side) — only the serializable Config and
  * range travel in the partition.
  */
private class ArangoRangeReader(p: ArangoRangePartition)
  extends PartitionReader[InternalRow] {

  private val client = new ArangoHttp.Client(p.cfg)
  private val (aql, bindVars) = {
    val conds =
      p.lo.map(_ => "d._key >= @lo").toSeq ++ p.hi.map(_ => "d._key < @hi").toSeq
    val filter = if (conds.isEmpty) "" else conds.mkString(" FILTER ", " AND ", "")
    (s"FOR d IN ${p.collection}$filter RETURN d",
      p.lo.map("lo" -> _).toMap ++ p.hi.map("hi" -> _).toMap)
  }

  // lazy page-at-a-time pull: the iterator issues the next HTTP page
  // fetch only when the previous page's rows are consumed, so exactly
  // one page (batchSize documents) is resident per reader
  private val pageIt = client.cursorPageIterator(aql, p.batchSize, bindVars)
  private var current: Iterator[String] = Iterator.empty
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (!current.hasNext && pageIt.hasNext) current = pageIt.next().iterator
    if (current.hasNext) {
      row = InternalRow(UTF8String.fromString(current.next())); true
    } else false
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
