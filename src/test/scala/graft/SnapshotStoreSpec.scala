package graft

import graft.operators.SnapshotStore
import java.nio.file.Files

/** Snapshot atomic-swap semantics (reference K3, minus its
  * drop-then-rename visibility gap).
  */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  test("writeSnapshot swaps atomically and survives re-snapshot") {
    val dir = Files.createTempDirectory("snap").toString + "/t"
    val n1 = SnapshotStore.writeSnapshot(spark, Seq(1, 2, 3).toDF("v"), dir)
    assert(n1 == 3)
    assert(SnapshotStore.readSnapshot(spark, dir).count() == 3)
    // second snapshot replaces the first, no leftover staging/old dirs
    val n2 = SnapshotStore.writeSnapshot(spark, Seq(4, 5).toDF("v"), dir)
    assert(n2 == 2)
    val vals = SnapshotStore.readSnapshot(spark, dir).as[Int].collect().sorted
    assert(vals.toSeq == Seq(4, 5))
    assert(!new java.io.File(dir + ".staging").exists)
    assert(!new java.io.File(dir + ".old").exists)
  }

  test("a crash between the swap's two renames is healed, forward or back") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

    // FORWARD: live renamed out, complete marked staging present — the
    // crash hit after live->old; recovery must finish the swap (promote
    // staging), not resurrect the stale old
    val d1 = Files.createTempDirectory("snapf").toString + "/t"
    SnapshotStore.writeSnapshot(spark, Seq(1, 2, 3).toDF("v"), d1)
    // simulate the next swap's crash point: staging fully written +
    // ready-marked, live staged out to .old
    Seq(10, 20).toDF("v").write.parquet(d1 + ".staging")
    fs.create(new Path(d1 + ".staging", "_graft_swap_ready"), true).close()
    assert(fs.rename(new Path(d1), new Path(d1 + ".old")))
    SnapshotStore.recoverInterruptedSwap(spark, d1)
    assert(SnapshotStore.readSnapshot(spark, d1).as[Int].collect().sorted.toSeq
      === Seq(10, 20), "recovery must complete the marked swap forward")
    assert(!fs.exists(new Path(d1 + ".old")) && !fs.exists(new Path(d1 + ".staging")))

    // BACKWARD: live missing, staging absent or unmarked (crash mid
    // staging-write of a later attempt) — roll the old snapshot back
    val d2 = Files.createTempDirectory("snapb").toString + "/t"
    SnapshotStore.writeSnapshot(spark, Seq(7, 8).toDF("v"), d2)
    assert(fs.rename(new Path(d2), new Path(d2 + ".old")))
    Seq(99).toDF("v").write.parquet(d2 + ".staging") // NO ready marker
    SnapshotStore.recoverInterruptedSwap(spark, d2)
    assert(SnapshotStore.readSnapshot(spark, d2).as[Int].collect().sorted.toSeq
      === Seq(7, 8), "recovery must roll an unmarked swap back")

    // and writeSnapshot itself heals before writing (the in-stream
    // compaction path crashes here too)
    val d3 = Files.createTempDirectory("snapw").toString + "/t"
    SnapshotStore.writeSnapshot(spark, Seq(1).toDF("v"), d3)
    assert(fs.rename(new Path(d3), new Path(d3 + ".old"))) // staged out, no staging
    val n = SnapshotStore.writeSnapshot(spark, Seq(2, 3).toDF("v"), d3)
    assert(n === 2 && !fs.exists(new Path(d3 + ".old")))
  }
}
