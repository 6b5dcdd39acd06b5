package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Proof that bucketed co-location removes the join shuffle entirely:
  * the same join over plain tables plans two exchanges, over bucketed
  * tables plans none, and both return identical rows.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize THIS QueryExecution before reading its plan
    df.queryExecution.executedPlan.toString
  }

  test("joining same-bucketed tables is exchange-free and value-identical") {
    val orders = (0L until 1000L).map(i => (i, s"o$i")).toDF("k", "ov")
    val items = (0L until 3000L).map(i => (i % 1000L, s"i$i")).toDF("k", "iv")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(orders, "bk_orders", 4, "k")
      Bucketing.writeBucketed(items, "bk_items", 4, "k")

      val bucketed = Bucketing.coLocatedJoin(spark, "bk_orders", "bk_items", "k")
      val bucketedPlan = planOf(bucketed)
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$bucketedPlan")
      assert(bucketedPlan.contains("SortMergeJoin"))

      val plain = orders.join(items, "k")
      assert(planOf(plain).contains("Exchange"),
        "control: the un-bucketed join must shuffle for this test to prove anything")

      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getString(1), r.getString(2))
      assert(bucketed.collect().map(key).sorted.toSeq ===
        plain.collect().map(key).sorted.toSeq)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bk_orders")
      spark.sql("DROP TABLE IF EXISTS bk_items")
    }
  }

  test("a replica stored bucketed by key gives an exchange-free dedup view") {
    // the payoff case: the append-only versioned store is written once,
    // bucketed on its primary key, and every latest-version-wins read
    // (the engine's hottest recurring aggregation) runs with no shuffle
    val rows = Seq(
      (1L, 1L, 0, "a-v1"), (1L, 2L, 0, "a-v2"),
      (2L, 1L, 0, "b-v1"), (2L, 2L, 1, "b-tomb"),
      (3L, 5L, 0, "c-v5")).toDF("k", "_ver", "_deleted", "payload")
    try {
      Bucketing.writeBucketed(rows, "bk_replica", 4, "k")
      val view = graft.operators.ReplicaTable.current(
        spark.table("bk_replica"), Seq("k"), "_ver")
      val got = view.collect().map(r => (r.getLong(0), r.getString(3))).toSet
      assert(got === Set((1L, "a-v2"), (3L, "c-v5"))) // key 2 tombstoned
      val plan = view.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"dedup view over the bucketed replica should not shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_replica")
    }
  }

  test("config-declared replica table: create bucketed, append, read exchange-free") {
    val cfg = graft.config.TableConfig("bk_cfg_replica", Seq(
      graft.config.ColumnSpec("Id", Seq("int"), primaryKey = true),
      graft.config.ColumnSpec("Name", Seq("str"))))
    try {
      graft.operators.ReplicaTable.createTable(spark, cfg, numBuckets = 4)
      val b1 = Seq((1L, "a", 1L, 0), (2L, "b", 1L, 0))
        .toDF("Id", "Name", "_ver", "_deleted")
      val b2 = Seq((1L, "a2", 2L, 0), (2L, "b", 2L, 1)) // replay-ish overlap
        .toDF("Id", "Name", "_ver", "_deleted")
      graft.operators.ReplicaTable.appendBatch(b1, cfg, numBuckets = 4)
      graft.operators.ReplicaTable.appendBatch(b2, cfg, numBuckets = 4)

      // the DDL path declares the replica contract in the catalog, so the
      // bare table scan IS the FINAL view (graft.plans.ReplicaFinalRule) —
      // no manual current() wrapping
      val view = spark.table(cfg.name)
      val got = view.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((1L, "a2"))) // Id=2 tombstoned at v2
      val plan = view.queryExecution.executedPlan.toString
      assert(plan.contains("arg_max_row"), s"transparent FINAL missing:\n$plan")
      assert(!plan.contains("Exchange"),
        s"config-declared replica read should not shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_cfg_replica")
    }
  }

  test("groupBy on the bucket key also skips the exchange") {
    val events = (0L until 2000L).map(i => (i % 500L, i)).toDF("k", "amt")
    try {
      Bucketing.writeBucketed(events, "bk_events", 4, "k")
      val agg = spark.table("bk_events").groupBy("k").agg(sum("amt").as("s"))
      val plan = planOf(agg)
      assert(!plan.contains("Exchange"),
        s"aggregation on the bucket key should not shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_events")
    }
  }
}
