package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier

/** Persist-once catalog tables scoped by a SOURCE FINGERPRINT — the reuse
  * discipline for the engine's durable index tables (the k-gram substring
  * index, the near-dup signature tables).
  *
  * Two problems with a fixed global table name (VERDICT r4 / ADVICE r4):
  *  1. every DataFrame construction re-drops and re-writes the table, so
  *     running detection (d16) and clipping (d18) in one session builds
  *     the same index twice — the exact recompute the persisted path
  *     exists to avoid;
  *  2. concurrent or interleaved sessions over DIFFERENT corpora (mixed
  *     scale factors, test vs bench) clobber each other's index.
  *
  * Both disappear when the table name carries the identity of what it was
  * built from: `<base>_<dirTag>_<fpTag>`, where dirTag hashes the corpus
  * directory (so different corpora never share a name) and fpTag hashes
  * the source files' (path, length, mtime) listing plus the build
  * parameters (so a changed corpus or parameter set gets a fresh build
  * instead of a stale read). [[ensure]] then builds only when the
  * fingerprint-matched table is absent from this session's catalog:
  * the first query of a pass pays the build, every later consumer — the
  * same query's second bench pass, the sibling query sharing the index —
  * reads co-located buckets from durable parquet.
  *
  * The name also carries a SESSION tag (hash of the Spark applicationId):
  * cross-JVM table sharing was never possible anyway — the in-memory
  * catalog forgets tables at process exit — so two concurrent sessions
  * over the SAME corpus gain nothing from sharing a name, and with a
  * fixed name the second session's sibling sweep would delete the first
  * session's LIVE table out from under its readers. Session-scoped names
  * make concurrent same-corpus sessions fully independent (each pays its
  * own build; none can clobber another).
  *
  * What a build cleans up: stale same-session siblings in the catalog
  * AND their storage — EXCEPT the newest prior COMPLETE generation,
  * retained readable for in-flight consumers (see [[ensure]]'s
  * supersession-retention contract); the target location
  * itself if a crashed earlier build of this session left a partial
  * write; and orphan sibling locations left by DEAD sessions — identified
  * by age (untouched for >30 min and absent from this session's catalog)
  * AND by the absence of a live [[LivenessMarker]] heartbeat — every
  * build runs under a 5-minute heartbeat ticker, so a genuinely long
  * build at scale (hours) is provably alive to concurrent sweeps, not
  * merely assumed to finish inside the 30-minute age window.
  */
object PersistedIndex {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Stable identity of the source files: sorted (path, length, mtime)
    * rows for every file under `paths` (recursively; a plain file lists
    * itself). Listing is a handful of namenode calls — never data reads.
    */
  def sourceFingerprint(spark: SparkSession, paths: Seq[String]): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val rows = paths.sorted.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(hconf)
      if (!fs.exists(path)) Seq(s"$p:absent")
      else {
        val it = fs.listFiles(path, true)
        val b = Seq.newBuilder[String]
        while (it.hasNext) {
          val st = it.next()
          b += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
        }
        b.result().sorted
      }
    }
    md5Hex(rows.mkString("\n"))
  }

  private def dirTag(dir: String): String = md5Hex(dir).take(6)

  private def sessionTag(spark: SparkSession): String =
    md5Hex(spark.sparkContext.applicationId).take(6)

  /** The fingerprint-scoped table name for (`base`, corpus `dir`, build
    * parameters `params`, current source-file state, this session).
    * Lowercase hex, so it survives the catalog's case handling.
    */
  def scopedName(
      spark: SparkSession,
      base: String,
      dir: String,
      sources: Seq[String],
      params: String): String = {
    val fp = md5Hex(params + "\u0000" + sourceFingerprint(spark, sources)).take(8)
    s"${base}_${dirTag(dir)}_${fp}_s${sessionTag(spark)}"
  }

  /** Completion marker, written into the table location AFTER `build`
    * returns: a multi-step build (e.g. the incremental signature table's
    * base create + shard append) that dies between steps leaves a table
    * that EXISTS but is wrong; without the marker an in-session retry
    * would accept it and silently diverge from the full rebuild. A table
    * without its marker is a partial build — dropped and rebuilt.
    */
  private val Marker = "_GRAFT_COMPLETE"

  /** Per-(base, dir) build locks: two threads of one session racing
    * `ensure` for the same index must not both run `build` (the loser's
    * pre-build glob delete would remove the winner's in-flight write).
    * The lock is deliberately WIDER than the fingerprint-scoped table
    * name: the pre-build cleanup sweeps same-(base, dir) sibling tables
    * (stale fingerprints), so two different-fingerprint ensures racing
    * under per-name locks could drop each other's in-flight build
    * mid-`saveAsTable`. Serializing per (base, dir) makes supersession
    * well-defined. The key is the structural pair (base, dirTag), not
    * their string concatenation — a base name that itself ends in
    * `_` + 6 hex chars cannot alias another (base, dir)'s lock
    * (ADVICE r11).
    */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Object]()

  /** The prior generation RETAINED at each family's last supersession
    * (if any), remembered per (base, dirTag) so REUSE-path ensures can
    * refresh its heartbeat too. Without this, only build-path ensures
    * (the !complete branch) touched the retained table — once the
    * active fingerprint was complete, every later ensure took the reuse
    * branch and touched the active table alone, so 30 quiet minutes
    * after a supersession a concurrent session's orphan sweep could
    * reclaim the retained generation out from under an in-flight reader
    * EVEN WHILE this session actively ensured the family — the exact
    * cross-session race the retention scaladoc promises is bounded
    * (ADVICE r12). Entries drop when the family supersedes with no
    * prior COMPLETE generation or when the remembered table leaves the
    * catalog. */
  private val retainedPrior =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Reuse the fingerprint-matched table if this session already built
    * it (and its completion marker is present); otherwise clean up
    * stale/orphan same-dir siblings, run `build` (which must
    * `saveAsTable` the given name), and stamp the marker. On reuse the
    * location's mtime is refreshed, so a LIVE long-running session's
    * actively-read index never ages into another session's >30-min
    * orphan sweep (an idle session can still lose its index after 30
    * quiet minutes — the next ensure simply rebuilds it). Returns the
    * table read back from the catalog, RESOLVED INSIDE THE LOCK — no
    * other ensure can sweep it between build and resolution.
    *
    * Supersession retention (ADVICE r11): a different-fingerprint
    * ensure does NOT drop the newest prior COMPLETE sibling — it stays
    * in the catalog as the readable previous generation, so a
    * DataFrame a concurrent caller obtained just before the
    * supersession still reads real files instead of dying with
    * PATH_NOT_FOUND mid-plan. Only generations beyond the newest prior
    * one (plus every marker-less partial) are swept, bounding a
    * (base, dir) family at 2× one index's storage — the price of
    * making the realistic race (ONE in-flight supersession) safe. A
    * reader two supersessions stale can still lose its files; that
    * truly is a caller sequencing error, and it takes two corpus/param
    * changes mid-read to manufacture. Cross-session bound: the
    * retained generation's heartbeat refreshes on every ensure of its
    * family, so it is sweep-safe while this session stays active; a
    * session idle past the 30-minute orphan window can lose it to a
    * concurrent session's sweep — the same bound the ACTIVE table
    * already carries via its reuse-path touch.
    */
  def ensure(
      spark: SparkSession,
      base: String,
      dir: String,
      sources: Seq[String],
      params: String)(build: String => Unit): DataFrame = {
    val table = scopedName(spark, base, dir, sources, params)
    locks.computeIfAbsent((base, dirTag(dir)), _ => new Object).synchronized {
      val catalog = spark.sessionState.catalog
      val parent = new Path(catalog.defaultTablePath(TableIdentifier(table))).getParent
      val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def loc(t: String): Path =
        new Path(catalog.getTableMetadata(TableIdentifier(t)).location)
      val complete = catalog.tableExists(TableIdentifier(table)) &&
        fs.exists(new Path(loc(table), Marker))
      if (!complete) {
        val pattern = s"${base}_${dirTag(dir)}_*"
        // same-session siblings: only THIS session registers tables in
        // its in-memory catalog, so these are all ours. A marker-less
        // sibling (including a partial build of the target itself) is
        // garbage — dropped. COMPLETE siblings are prior generations:
        // the newest is RETAINED for in-flight readers (scaladoc
        // above); older ones go.
        val siblings = catalog.listTables("default", pattern)
          .map(_.table).filterNot(_ == table)
        if (catalog.tableExists(TableIdentifier(table)))
          ReplicaTable.dropTableAndLocation(spark, table)
        // one stat per sibling marker, exception-safe: a marker swept
        // by a concurrent session between an exists() and a
        // getFileStatus() must read as "partial" (drop + rebuild),
        // never throw out of ensure (r12 session-diff review)
        def markerMtime(t: String): Option[Long] =
          try Some(fs.getFileStatus(new Path(loc(t), Marker))
            .getModificationTime)
          catch { case _: Exception => None }
        val stamped = siblings.map(t => t -> markerMtime(t))
        stamped.collect { case (t, None) => t }
          .foreach(ReplicaTable.dropTableAndLocation(spark, _))
        val done = stamped.collect { case (t, Some(m)) => (t, m) }
          .sortBy(_._2).map(_._1)
        done.dropRight(1)
          .foreach(ReplicaTable.dropTableAndLocation(spark, _))
        // the RETAINED prior generation must stay provably alive for
        // the cross-session orphan sweep: its marker mtime froze at its
        // own build, so >30 idle minutes after the supersession another
        // session could reclaim it under a still-reading DataFrame —
        // refresh its heartbeat here (every ensure of the family while
        // this session lives keeps it fresh; a session idle past the
        // sweep window can still lose it, the same documented bound as
        // the active table's reuse-path touch)
        done.takeRight(1).foreach { t =>
          LivenessMarker.touch(fs, loc(t))
          retainedPrior.put((base, dirTag(dir)), t)
        }
        if (done.isEmpty) retainedPrior.remove((base, dirTag(dir)))
        if (fs.exists(parent)) {
          // a partial write a crashed earlier build of THIS session left
          // at the target (the session tag makes the name ours alone)
          // would wedge the create — always cleared (including our own
          // stale heartbeat; whileAlive below mints a fresh one)
          val mine = new Path(parent, s"$table*")
          fs.globStatus(mine).foreach(st => fs.delete(st.getPath, true))
          // orphan sibling locations from DEAD sessions: absent from this
          // catalog, untouched for >30 min, AND without a live heartbeat
          // — the one sweep rule, shared with the CC round-table store
          // via [[LivenessMarker.sweepStale]]
          LivenessMarker.sweepStale(fs, parent,
            cutoffMillis = System.currentTimeMillis() - 30L * 60 * 1000,
            matches = _.startsWith(s"${base}_${dirTag(dir)}_"),
            inCatalog = n => catalog.tableExists(TableIdentifier(n)))
        }
        // heartbeat for the build's whole duration (ticker refreshes
        // every 5 min), so a multi-hour build at scale is never swept
        // mid-write by a concurrent session's cleanup above
        LivenessMarker.whileAlive(fs, new Path(parent, table)) {
          build(table)
        }
        fs.create(new Path(loc(table), Marker), true).close()
      } else {
        // best-effort liveness signal for the cross-session orphan sweep:
        // refresh the HEARTBEAT (overwrite-create — works on every
        // FileSystem), never fs.setTimes on the dir, whose Hadoop base
        // impl is a silent no-op that object stores don't override — a
        // setTimes-only refresh left a >30-min actively-REUSED index
        // sweepable by a concurrent session on S3A-like stores, exactly
        // the deletion the scaladoc promises cannot happen
        LivenessMarker.touch(fs, loc(table))
        // ...and the family's retained prior generation, if one exists:
        // the retention contract's "refreshes on every ensure of its
        // family" must include REUSE-path ensures, or the retained
        // table ages into a concurrent session's sweep window while
        // this session is demonstrably active (ADVICE r12)
        Option(retainedPrior.get((base, dirTag(dir)))).foreach { t =>
          if (catalog.tableExists(TableIdentifier(t)))
            LivenessMarker.touch(fs, loc(t))
          else retainedPrior.remove((base, dirTag(dir)))
        }
      }
      // resolved INSIDE the lock: a racing different-fingerprint ensure
      // cannot sweep the table between our build/reuse and this lookup
      spark.table(table)
    }
  }

  /** Test hygiene: drop every table (and location) THIS SESSION built
    * under `base`. The filesystem glob carries the session tag — a bare
    * `${base}_*` glob would delete a concurrently-running OTHER JVM's
    * live index out from under its readers (observed: a test-suite
    * teardown racing a Verify run killed d21 with PATH_NOT_FOUND).
    * Dead-session orphans are not this method's job; [[ensure]]'s
    * >30-min age sweep reclaims those safely.
    */
  def dropAll(spark: SparkSession, base: String): Unit = {
    spark.sessionState.catalog.listTables("default", s"${base}_*")
      .foreach(t => ReplicaTable.dropTableAndLocation(spark, t.table))
    val parent = new Path(spark.sessionState.catalog
      .defaultTablePath(TableIdentifier(s"${base}_x"))).getParent
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(parent))
      fs.globStatus(new Path(parent, s"${base}_*_s${sessionTag(spark)}"))
        .foreach(st => fs.delete(st.getPath, true))
  }
}
