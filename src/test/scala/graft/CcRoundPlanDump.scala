package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dumps the physical plan of ONE CC fixpoint round, before/after the
  * r15 star rewrite, so the per-round exchange-count claim is checkable
  * from committed files (`plans/r15/cc_star_round_{before,after}.txt`):
  * the catalog queries' own plan dumps show only the final labels query
  * — the rounds execute at construction time. The "before" round is the
  * r14 groupBy+join-back form reproduced verbatim; the "after" round is
  * the live smallStar(largeStar-multiset) path. Measurement only.
  */
object CcRoundPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = (1L until 500L).map(i => (i, i / 3)).toDF("src", "dst")
      .where(col("src") =!= col("dst"))
    e.write.mode("overwrite").saveAsTable("cc_plan_probe")
    val t = spark.table("cc_plan_probe")

    // r14 form: two groupBy+join-back stars with an intermediate distinct
    def largeStarOld(e: DataFrame): DataFrame = {
      val sym = e.select(col("src"), col("dst"))
        .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src"))
        .agg(least(min(col("dst")), col("src")).as("m"))
      sym.join(mins, "src")
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }
    def smallStarOld(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val moved = e.join(mins, "src")
        .where(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
      val self = mins.select(col("src"), col("m").as("dst"))
      moved.unionByName(self)
        .where(col("src") =!= col("dst"))
        .distinct()
    }

    def dump(df: DataFrame, name: String): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("plans/r15", name), plan.getBytes("UTF-8"))
      val n = ShuffleGolden.count(df.queryExecution.executedPlan)
      println(s"[ccplan] $name shuffle exchanges = $n")
    }
    dump(smallStarOld(largeStarOld(t)), "cc_star_round_before.txt")
    dump(graft.operators.ConnectedComponents.smallStar(
      graft.operators.ConnectedComponents.largeStar(t)),
      "cc_star_round_after_unfused.txt")
    // the fused path run() actually executes (largeStar multiset,
    // no intermediate distinct) — reproduce via the public pieces:
    // smallStar dedupes the multiset, so largeStar().distinct() ==
    // largeStar-multiset through smallStar; the run() fusion is
    // starRound, private — its plan equals smallStar(largeStarMulti):
    dump(graft.operators.ConnectedComponents.starRoundForPlanDump(t),
      "cc_star_round_after.txt")
    spark.sql("DROP TABLE IF EXISTS cc_plan_probe")
    spark.stop()
  }
}
