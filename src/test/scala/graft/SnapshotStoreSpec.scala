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
}
