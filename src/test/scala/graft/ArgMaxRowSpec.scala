package graft

import graft.operators.ReplicaTable
import org.apache.spark.sql.functions._

/** The custom hash-friendly argmax aggregate behind ReplicaTable.latest. */
class ArgMaxRowSpec extends SparkSpec {

  test("latest picks the max-version row per key via ObjectHashAggregate") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "old", 0), (1L, 30L, "newest", 0), (1L, 20L, "mid", 0),
      (2L, 5L, "only", 1),
      (3L, 7L, "a", 0), (3L, 7L, "a", 0)) // exact duplicate (replay)
      .toDF("k", "_ver", "payload", "_deleted")

    val latest = ReplicaTable.latest(df, keys = Seq("k"), ver = "_ver")
    val plan = latest.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected hash agg, got:\n$plan")
    assert(!plan.contains("SortAggregate"))

    val got = latest.orderBy("k").select("k", "_ver", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === Seq((1L, 30L, "newest"), (2L, 5L, "only"), (3L, 7L, "a")))
  }

  test("agrees with built-in max_by on the events fixture") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val viaArgMax = ReplicaTable.latest(events, Seq("user_id"), "event_id")
      .select("user_id", "event_id", "event_type", "value")
    val viaMaxBy = events.groupBy(col("user_id"))
      .agg(max_by(struct(events.columns.map(col): _*), col("event_id")).as("r"))
      .select(col("r.user_id"), col("r.event_id"), col("r.event_type"), col("r.value"))
    assert(viaArgMax.exceptAll(viaMaxBy).isEmpty && viaMaxBy.exceptAll(viaArgMax).isEmpty)
  }

  test("null versions are ignored; all-null key yields null payload row") {
    import spark.implicits._
    val df = Seq((1L, Some(10L), "live"), (1L, None, "null-ver"), (2L, None, "gone"))
      .toDF("k", "_ver", "payload")
    val got = ReplicaTable.latest(df, Seq("k"), "_ver")
      .orderBy("k").collect()
    // struct(null-ver, ...) still compares (nulls first) — key 2 keeps its
    // only row because the ordering struct itself is non-null
    assert(got.length === 2)
    assert(got(0).getString(2) === "live")
    assert(got(1).getString(2) === "gone")
  }
}
