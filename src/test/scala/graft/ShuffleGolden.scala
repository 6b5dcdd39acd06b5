package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Shuffle accounting for the plan goldens: `count` walks a physical
  * plan (descending through AQE wrappers and subqueries) counting
  * ShuffleExchange nodes; the `main` prints the count for every catalog
  * query so PlanAuditSpec's golden map can be regenerated after an
  * intentional plan change:
  * `sbt "Test/runMain graft.ShuffleGolden"`. */
object ShuffleGolden {
  def count(plan: org.apache.spark.sql.execution.SparkPlan): Int = {
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case _: ShuffleExchangeExec => n += 1
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    n
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      // match SparkSpec/Bench/Verify: persisted-index re-reads ride the
      // bucket layout, so goldens must be generated under the same confs
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        println(s"GOLDEN $name ${count(df.queryExecution.executedPlan)}")
      } catch { case e: Throwable => println(s"GOLDEN $name ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
