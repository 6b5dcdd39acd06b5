package graft.operators

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Liveness heartbeats for the age-guarded orphan sweeps.
  *
  * [[PersistedIndex]] and [[ConnectedComponents.TableRounds]] reclaim
  * warehouse directories orphaned by dead JVMs with an "untouched for
  * >30 min" age test. That test encodes an assumption — a live build
  * finishes well inside 30 minutes — which holds at sf0.1 (seconds) but
  * not necessarily at 100 TB, where one genuinely long build phase could
  * age past the cutoff mid-write and be swept by a CONCURRENT session's
  * cleanup. Liveness, not age, is the correct guard.
  *
  * The heartbeat is a sibling FILE (`<dir>._GRAFT_ALIVE`, beside the
  * guarded directory, never inside it — `saveAsTable` insists on creating
  * its own directory) whose mtime a builder refreshes: once per build
  * phase, plus a daemon ticker every [[TickSeconds]] while a long-running
  * build is in flight, so even a single multi-hour phase stays provably
  * alive. Sweeps consult [[isAlive]]: a directory with a fresh heartbeat
  * is skipped regardless of its own mtime. Stale heartbeat files
  * (builder long dead) age out under the same cutoff and are reclaimed
  * by the sweeps that honor them.
  */
object LivenessMarker {

  val Suffix = "._GRAFT_ALIVE"

  /** Ticker cadence: 6x inside the 30-min sweep cutoff, so a single
    * missed tick (GC pause, slow namenode) cannot fake death. */
  val TickSeconds = 300L

  /** The heartbeat path guarding `dir`: a sibling file, not a child. */
  def heartbeatPath(dir: Path): Path =
    new Path(dir.getParent, dir.getName + Suffix)

  /** Create-or-refresh the heartbeat for `dir`. Refresh is
    * OVERWRITE-CREATE, never `setTimes`: Hadoop's FileSystem base
    * implementation of setTimes is a silent no-op and object-store
    * filesystems (S3A and friends — the norm at the scale this guard
    * exists for) don't override it, so a setTimes-based refresh would
    * quietly degrade liveness back to the age-only sweep this marker
    * was built to replace. Re-creating the (empty) file bumps mtime on
    * every FileSystem. Best-effort by design: a failed touch degrades
    * to the age guard, never fails the build. */
  def touch(fs: FileSystem, dir: Path): Unit =
    try fs.create(heartbeatPath(dir), true).close()
    catch { case _: Exception => () }

  /** True when `dir` has a heartbeat younger than `cutoffMillis` —
    * i.e. some session is (or very recently was) actively building it. */
  def isAlive(fs: FileSystem, dir: Path, cutoffMillis: Long): Boolean =
    try {
      val hb = heartbeatPath(dir)
      fs.exists(hb) && fs.getFileStatus(hb).getModificationTime >= cutoffMillis
    } catch { case _: Exception => false }

  /** True for heartbeat files themselves (sweeps listing a parent see
    * them next to the dirs they guard and must not treat them as data). */
  def isMarkerName(name: String): Boolean = name.endsWith(Suffix)

  def remove(fs: FileSystem, dir: Path): Unit =
    try fs.delete(heartbeatPath(dir), false)
    catch { case _: Exception => () }

  /** The ONE stale-orphan sweep rule both warehouse stores share
    * ([[PersistedIndex.ensure]]'s sibling cleanup and
    * [[ConnectedComponents]]'s round-table sweep previously held
    * separate copies — a fix to the liveness rule applied to one would
    * silently leave the other sweeping under the old rule): children of
    * `parent` whose name `matches` and whose own mtime predates
    * `cutoffMillis` are reclaimed — a heartbeat marker file deletes
    * flat; a directory deletes recursively ONLY when the caller's
    * catalog doesn't know it (`inCatalog`) AND the heartbeat guarding
    * it (`guardFor` — the dir itself by default; the CC store guards a
    * PREFIX covering both alternating round tables) is absent or
    * equally stale. Age alone is never grounds: a concurrent session's
    * genuinely long build keeps its marker fresh via [[whileAlive]]'s
    * ticker and survives every sweep.
    */
  def sweepStale(
      fs: FileSystem,
      parent: Path,
      cutoffMillis: Long,
      matches: String => Boolean,
      inCatalog: String => Boolean,
      guardFor: Path => Path = identity): Unit = {
    if (!fs.exists(parent)) return
    fs.listStatus(parent).foreach { st =>
      val n = st.getPath.getName
      if (matches(n) && st.getModificationTime < cutoffMillis) {
        if (isMarkerName(n)) fs.delete(st.getPath, false)
        else if (!inCatalog(n) && !isAlive(fs, guardFor(st.getPath), cutoffMillis))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** Run `f` with a daemon ticker refreshing `dir`'s heartbeat every
    * [[TickSeconds]] (plus one immediate touch), so an arbitrarily long
    * build phase stays alive for concurrent sweeps. The ticker dies with
    * `f`; the final heartbeat mtime (= roughly `f`'s completion) then
    * ages out normally.
    */
  def whileAlive[T](fs: FileSystem, dir: Path)(f: => T): T = {
    touch(fs, dir)
    val exec: ScheduledExecutorService =
      Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, s"graft-liveness-${dir.getName}")
        t.setDaemon(true)
        t
      })
    exec.scheduleAtFixedRate(() => touch(fs, dir),
      TickSeconds, TickSeconds, TimeUnit.SECONDS)
    try f finally exec.shutdownNow()
  }
}
