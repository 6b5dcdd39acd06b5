package graft

import graft.operators.PersistedIndex
import org.apache.hadoop.fs.Path

/** The build-once contract of [[PersistedIndex.ensure]] under contention —
  * the scenario a shared engine session actually hits: several catalog
  * queries (d16+d18, d20/d21/d26 all share index tables) constructed on
  * different threads race `ensure` for the SAME index. The per-name lock
  * must admit exactly ONE `build` (the loser's pre-build cleanup would
  * otherwise delete the winner's in-flight write out from under it), and
  * every racer must read back the same complete table.
  *
  * Also pinned here: the completion-marker protocol (a marker-less table
  * is a partial build — rebuilt, never trusted) and fingerprint
  * supersession retention (a changed fingerprint keeps the newest prior
  * COMPLETE generation readable for in-flight consumers and reclaims
  * anything older — ADVICE r11).
  */
@graft.tags.Soak
class PersistedIndexConcurrencySpec extends SparkSpec {

  private def warehouse: Path =
    new Path(spark.sessionState.conf.getConfString("spark.sql.warehouse.dir"))
  private def fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val dir = "/root/testdata/sf0.001/region.parquet"

  test("8 threads racing ensure admit exactly one build; all read the result") {
    val base = "graft_pic_race"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = {
            start.await()
            PersistedIndex.ensure(spark, base, dir, Seq(dir), "p=race") { t =>
              builds.incrementAndGet()
              // a deliberately slow build widens the race window: every
              // other thread must WAIT on the lock, not start a second
              // build or sweep this one's partial write
              Thread.sleep(200)
              spark.range(5).write.format("parquet").saveAsTable(t)
            }.count()
          }
        })
      }
      start.countDown()
      val counts = tasks.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(counts.forall(_ === 5L),
        s"racers saw inconsistent tables: ${counts.mkString(",")}")
      assert(builds.get() === 1,
        s"${builds.get()} builds ran for one (name, fingerprint) — the " +
          "per-name lock admitted a concurrent rebuild")
    } finally {
      pool.shutdownNow()
      PersistedIndex.dropAll(spark, base)
    }
  }

  test("a marker-less table is a partial build: rebuilt, never trusted") {
    val base = "graft_pic_marker"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def ensure() = PersistedIndex.ensure(spark, base, dir, Seq(dir), "p=1") { t =>
      builds.incrementAndGet()
      spark.range(4).write.format("parquet").saveAsTable(t)
    }
    try {
      assert(ensure().count() === 4 && builds.get() === 1)
      // same session, same fingerprint: reuse, no second build
      assert(ensure().count() === 4 && builds.get() === 1)
      // simulate a crash between saveAsTable and the marker stamp: the
      // table EXISTS but its completion marker does not
      val table = spark.sessionState.catalog
        .listTables("default", s"${base}_*").head.table
      val loc = new Path(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
      fs.delete(new Path(loc, "_GRAFT_COMPLETE"), false)
      assert(ensure().count() === 4)
      assert(builds.get() === 2,
        "a marker-less (partial) table was trusted instead of rebuilt")
    } finally PersistedIndex.dropAll(spark, base)
  }

  test("different-fingerprint ensures serialize: builds never overlap, both read intact") {
    val base = "graft_pic_mixed"
    // per-build [start, end) windows — the serialization contract is
    // that they never overlap (under per-NAME locks the second ensure's
    // stale-sibling sweep would run DURING the first's build and drop
    // its in-flight saveAsTable)
    val windows = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    def race(params: String, rows: Int) =
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          start.await()
          PersistedIndex.ensure(spark, base, dir, Seq(dir), params) { t =>
            val t0 = System.nanoTime()
            Thread.sleep(150)
            spark.range(rows).write.format("parquet").saveAsTable(t)
            windows.put(params, (t0, System.nanoTime()))
          }.count()
        }
      })
    try {
      val a = race("p=a", 3); val b = race("p=b", 7)
      start.countDown()
      // under the r12 retention contract the LOSER's just-built table
      // survives as the previous generation, so BOTH racers read their
      // own full row count — no swallowed supersession failure
      // (ADVICE r11: the old contract forced this test to tolerate a
      // silent PATH_NOT_FOUND on the loser)
      val got = Seq(a.get(120, java.util.concurrent.TimeUnit.SECONDS),
        b.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(got === Seq(3L, 7L),
        s"racers read $got, expected their own intact tables Seq(3, 7)")
      val Seq((s1, e1), (s2, e2)) =
        Seq("p=a", "p=b").map(windows.get(_)): @unchecked
      assert(e1 <= s2 || e2 <= s1,
        "two different-fingerprint builds of one (base, dir) ran concurrently")
      // both generations live: the newer is the active table, the older
      // the retained previous generation
      assert(spark.sessionState.catalog
        .listTables("default", s"${base}_*").size === 2)
    } finally {
      pool.shutdownNow()
      PersistedIndex.dropAll(spark, base)
    }
  }

  test("real catalog queries racing a shared index (d16 ∥ d18) match their sequential runs") {
    // d16 (substring spans) and d18 (clip spans) share the persisted
    // k-gram index — the exact sibling-query contention a shared engine
    // session produces. Sequential runs first (reference results), then
    // a fresh index raced from two threads: both must reproduce the
    // sequential rows and the index must build once.
    val dirSf = "/root/testdata/sf0.001"
    def run(name: String) = graft.SparkEntry.queries(name)(spark, dirSf)
      .collect().map(_.toSeq).toSeq
    try {
      val seq16 = run("d16_substring_spans")
      val seq18 = run("d18_clip_spans")
      graft.operators.PersistedIndex.dropAll(spark, "graft_kgram_idx")
      val start = new java.util.concurrent.CountDownLatch(1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val t16 = pool.submit(new java.util.concurrent.Callable[Seq[Seq[Any]]] {
          override def call() = { start.await(); run("d16_substring_spans") }
        })
        val t18 = pool.submit(new java.util.concurrent.Callable[Seq[Seq[Any]]] {
          override def call() = { start.await(); run("d18_clip_spans") }
        })
        start.countDown()
        assert(t16.get(180, java.util.concurrent.TimeUnit.SECONDS) === seq16,
          "d16 under contention diverged from its sequential run")
        assert(t18.get(180, java.util.concurrent.TimeUnit.SECONDS) === seq18,
          "d18 under contention diverged from its sequential run")
      } finally pool.shutdownNow()
      // exactly one live fingerprint of the shared index after the race
      val tables = spark.sessionState.catalog
        .listTables("default", "graft_kgram_idx_*")
      assert(tables.size === 1,
        s"expected one shared k-gram index, found ${tables.map(_.table)}")
    } finally graft.operators.PersistedIndex.dropAll(spark, "graft_kgram_idx")
  }

  test("supersession retains one readable prior generation; grandparents are dropped") {
    val base = "graft_pic_super"
    def tid(t: String) = org.apache.spark.sql.catalyst.TableIdentifier(t)
    def tables() = spark.sessionState.catalog
      .listTables("default", s"${base}_*").map(_.table)
    try {
      val gen1Df = PersistedIndex.ensure(spark, base, dir, Seq(dir), "p=g1") { t =>
        spark.range(2).write.format("parquet").saveAsTable(t)
      }
      val gen1 = tables().head
      val gen1Loc = new Path(spark.sessionState.catalog
        .getTableMetadata(tid(gen1)).location)
      val gen2Df = PersistedIndex.ensure(spark, base, dir, Seq(dir), "p=g2") { t =>
        spark.range(7).write.format("parquet").saveAsTable(t)
      }
      // one supersession deep: BOTH generations readable (the in-flight
      // reader protection ADVICE r11 asked for), newest is the active one
      assert(gen2Df.count() === 7)
      assert(gen1Df.count() === 2,
        "a one-generation-stale DataFrame lost its files on supersession")
      assert(tables().size === 2)
      val gen2 = tables().filterNot(_ == gen1).head
      val gen2Loc = new Path(spark.sessionState.catalog
        .getTableMetadata(tid(gen2)).location)
      PersistedIndex.ensure(spark, base, dir, Seq(dir), "p=g3") { t =>
        spark.range(11).write.format("parquet").saveAsTable(t)
      }
      // two supersessions deep: the grandparent's table AND storage are
      // reclaimed; the family never exceeds 2 generations of storage
      assert(!spark.sessionState.catalog.tableExists(tid(gen1)),
        "the two-generations-stale sibling survived in the catalog")
      assert(!fs.exists(gen1Loc), "the grandparent's storage survived")
      assert(fs.exists(gen2Loc), "the previous generation was dropped early")
      assert(tables().size === 2)
    } finally PersistedIndex.dropAll(spark, base)
  }

  test("reuse-path ensure refreshes the retained prior generation's heartbeat") {
    val base = "graft_pic_reusehb"
    def tid(t: String) = org.apache.spark.sql.catalyst.TableIdentifier(t)
    def locOf(t: String) =
      new Path(spark.sessionState.catalog.getTableMetadata(tid(t)).location)
    def tables() = spark.sessionState.catalog
      .listTables("default", s"${base}_*").map(_.table)
    try {
      PersistedIndex.ensure(spark, base, dir, Seq(dir), "p=g1") { t =>
        spark.range(2).write.format("parquet").saveAsTable(t)
      }
      val gen1 = tables().head
      PersistedIndex.ensure(spark, base, dir, Seq(dir), "p=g2") { t =>
        spark.range(7).write.format("parquet").saveAsTable(t)
      }
      val hb = graft.operators.LivenessMarker.heartbeatPath(locOf(gen1))
      assert(fs.exists(hb),
        "supersession did not stamp the retained generation's heartbeat")
      // The retention contract says the retained generation stays
      // sweep-safe "on every ensure of its family" — including REUSE
      // ensures once the active fingerprint is complete. Before the
      // ADVICE r12 fix only build-path ensures touched it, so 30 quiet
      // minutes after a supersession a concurrent session's orphan
      // sweep could reclaim it under an in-flight reader even while
      // this session actively ensured the family. Deleting the
      // heartbeat and re-ensuring proves the reuse path recreates it.
      fs.delete(hb, false)
      PersistedIndex.ensure(spark, base, dir, Seq(dir), "p=g2") { _ =>
        fail("reuse-path ensure must not rebuild a complete index")
      }
      assert(fs.exists(hb),
        "reuse-path ensure left the retained generation's heartbeat absent")
    } finally PersistedIndex.dropAll(spark, base)
  }
}
