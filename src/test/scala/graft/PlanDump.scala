package graft

/** Bulk plan-dump helper for the optimization rounds: write the
  * `.explain("formatted")` output of every catalog query (or a named
  * subset) to one file per query —
  * `sbt "Test/runMain graft.PlanDump plans/r14 _before [names] [sfdir]"`.
  *
  * Uses GraftSession.builder at SPARK_GRAFT_CPUS so the dumped plan is
  * the one Bench actually runs (ExplainMain's local[4] session can flip
  * broadcast/shuffle decisions vs the bench's 32-slot session).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else "_before"
    val names: Seq[String] =
      if (args.length > 2 && args(2) != "all") args(2).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val dir = args.find(_.startsWith("/root/testdata")).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$n$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $n$suffix")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: $e")
      }
    }
    spark.stop()
  }
}
