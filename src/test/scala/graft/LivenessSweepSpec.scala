package graft

import graft.operators.{ConnectedComponents, LivenessMarker, PersistedIndex}
import org.apache.hadoop.fs.Path

/** The orphan sweeps' liveness contract (round-8 verdict #4): the
  * warehouse cleanups in [[ConnectedComponents.freshTableRounds]] and
  * [[PersistedIndex.ensure]] used to reclaim anything untouched for
  * >30 min — encoding "a build finishes inside 30 minutes", which a
  * 100 TB build phase can violate. Now a [[LivenessMarker]] heartbeat
  * (refreshed by a ticker for the build's whole duration) overrides the
  * age test: an OLD but ACTIVELY-BUILT directory survives, a dead one
  * without a fresh heartbeat is still reclaimed, and stale heartbeat
  * files age out like any other orphan.
  */
@graft.tags.Soak
class LivenessSweepSpec extends SparkSpec {

  private def warehouse: Path =
    new Path(spark.sessionState.conf.getConfString("spark.sql.warehouse.dir"))
  private def fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val oldMillis = System.currentTimeMillis() - 40L * 60 * 1000

  private def mkOldDir(name: String): Path = {
    val p = new Path(warehouse, name)
    fs.mkdirs(p)
    fs.create(new Path(p, "part-0.parquet"), true).close()
    fs.setTimes(p, oldMillis, -1)
    p
  }

  test("an old but actively-written round-table dir survives the CC sweep") {
    // dead orphan: >30 min old, no heartbeat -> reclaimed
    val dead = mkOldDir("ccls_deadbeef_0")
    // live long build: dir equally old (creation mtime — files land at
    // round end) but its prefix heartbeat is FRESH -> must survive
    val live = mkOldDir("ccls_f00dcafe_1")
    LivenessMarker.touch(fs, new Path(warehouse, "ccls_f00dcafe"))
    // a dead builder's stale heartbeat file -> reclaimed too
    val staleHb = new Path(warehouse, "ccls_0ldbeat" + LivenessMarker.Suffix)
    fs.create(staleHb, true).close()
    fs.setTimes(staleHb, oldMillis, -1)

    val rounds = ConnectedComponents.freshTableRounds(spark, "ccls")
    try {
      assert(!fs.exists(dead), "a dead >30-min orphan dir survived the sweep")
      assert(fs.exists(live),
        "an actively-heartbeated dir was swept — a live long build would lose its round table")
      assert(!fs.exists(staleHb), "a dead builder's stale heartbeat survived")

      // a real run under TableRounds maintains the heartbeat itself
      import spark.implicits._
      val nodes = Seq(1L, 2L, 3L).toDF("id")
      val edges = Seq((1L, 2L)).toDF("src", "dst")
      val labels = ConnectedComponents.run(nodes, edges, store = rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
      val hb = new Path(warehouse, rounds.prefix + LivenessMarker.Suffix)
      assert(fs.exists(hb), "TableRounds run left no heartbeat")
      assert(fs.getFileStatus(hb).getModificationTime >
        System.currentTimeMillis() - 5L * 60 * 1000,
        "the run's heartbeat was not refreshed")
    } finally {
      rounds.reset()
      Seq(live, new Path(warehouse, "ccls_f00dcafe" + LivenessMarker.Suffix),
        new Path(warehouse, rounds.prefix + LivenessMarker.Suffix))
        .foreach(p => fs.delete(p, true))
    }
  }

  test("an old but actively-built index location survives the PersistedIndex sweep") {
    val dir = "/root/testdata/sf0.001/region.parquet"
    // compute the dir tag the same way scopedName does (md5(dir) take 6)
    val dirTag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(6)
    val base = "graft_lsidx"
    val dead = mkOldDir(s"${base}_${dirTag}_deadfp00_sdead00")
    val live = mkOldDir(s"${base}_${dirTag}_livefp00_slive00")
    LivenessMarker.touch(fs, live)
    try {
      // ensure() triggers the orphan sweep before building its own table
      val built = PersistedIndex.ensure(spark, base, dir, Seq(dir), "p=1") { t =>
        spark.range(3).write.format("parquet").saveAsTable(t)
      }
      assert(built.count() === 3)
      assert(!fs.exists(dead), "a dead >30-min orphan index survived the sweep")
      assert(fs.exists(live),
        "an actively-heartbeated index location was swept mid-build")
      // the build itself left a heartbeat beside its table (ticker's
      // initial touch) — proof the whileAlive wrapper engaged
      val mine = fs.globStatus(new Path(warehouse,
        s"${base}_${dirTag}_*" + LivenessMarker.Suffix))
      assert(mine.nonEmpty, "the build ran without a liveness heartbeat")
    } finally {
      PersistedIndex.dropAll(spark, base)
      fs.globStatus(new Path(warehouse, s"${base}_*"))
        .foreach(st => fs.delete(st.getPath, true))
    }
  }
}
