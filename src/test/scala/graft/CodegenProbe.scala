package graft

/** Measures whole-stage-codegen compilation churn per bench pass: if the
  * codegen cache hit, pass 2 compiles nothing; fresh compiles inside
  * tasks explain run>>cpu blocked time. Test-scope measurement only.
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.find(_.startsWith("/root/testdata"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.metrics.source.CodegenMetrics
    def stats(): (Long, Long) = (
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
      CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
    for (pass <- 1 to 3; n <- names) {
      val (c0, _) = stats()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      val (c1, _) = stats()
      println(f"CODEGEN pass$pass $n $t%.2f s compiles=${c1 - c0}")
    }
    spark.stop()
  }
}
