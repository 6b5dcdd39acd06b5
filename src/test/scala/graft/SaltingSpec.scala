package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._

/** Skew-salting operators: results must equal the unsalted equivalents. */
class SaltingSpec extends SparkSpec {

  test("saltedAgg equals plain aggregation on a skewed key") {
    import spark.implicits._
    // 10k rows on one hot key + a long tail
    val df = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")

    val salted = Salting.saltedAgg(df, Seq("k"), saltSource = col("v"), buckets = 8,
      partial = Seq("cnt" -> count(lit(1)), "sum_v" -> sum(col("v")), "max_v" -> max(col("v"))),
      merge = Seq("cnt" -> sum(col("cnt")), "sum_v" -> sum(col("sum_v")), "max_v" -> max(col("max_v"))))
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"), max(col("v")).as("max_v"))

    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the pre-aggregation really splits the hot key across salt buckets
    val pre = df.withColumn("_salt", Salting.saltExpr(col("v"), 8))
      .filter(col("k") === "hot").select("_salt").distinct().count()
    assert(pre === 8)
  }

  test("saltedJoin equals plain join, including left rows with no match") {
    import spark.implicits._
    val probe = ((1 to 5000).map(i => ("hot", i.toLong)) ++
      Seq(("cold", 1L), ("miss", 2L))).toDF("k", "v")
    val build = Seq(("hot", "H"), ("cold", "C"), ("unused", "U")).toDF("k", "label")

    for (jt <- Seq("inner", "left")) {
      val salted = Salting.saltedJoin(probe, build, Seq("k"), col("v"), buckets = 4, joinType = jt)
      val plain = probe.join(build, Seq("k"), jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty, s"joinType=$jt")
    }
  }

  test("AQE skew-join really fires on a genuinely skewed join key") {
    import spark.implicits._
    // one key carrying ~100k rows against a flat tail; thresholds lowered
    // so the skew detector triggers at test scale (defaults are 256MB)
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1k")

      val probe = ((1 to 100000).map(i => ("hot", i.toLong)) ++
        (1 to 200).map(i => (s"k${i % 50}", i.toLong))).toDF("k", "v")
      val build = ((1 to 50).map(i => (s"k$i", s"t$i")) :+ (("hot", "H"))).toDF("k", "tag")

      val joined = probe.join(build, Seq("k"))
      // collect() executes THIS DataFrame's QueryExecution (count() would
      // plan a separate aggregate query, leaving this plan un-finalized)
      // tail keys are k0..k49, build has k1..k50: the 4 k0 rows miss
      assert(joined.collect().length === 100000 + 196)
      // the executed adaptive plan must contain a skew-split shuffle read
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("skewed"),
        s"no AQE skew split in plan:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("SQL functions registered by GraftExtensions work end-to-end") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot_fold(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(dot === 11.0)

    import spark.implicits._
    Seq((1, 10, "a"), (1, 20, "b"), (2, 5, "c")).toDF("k", "ver", "p")
      .createOrReplaceTempView("amr_t")
    val rows = spark.sql(
      "SELECT k, arg_max_row(ver, struct(ver, p)).p AS latest FROM amr_t GROUP BY k ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows === Seq((1, "b"), (2, "c")))
  }
}
