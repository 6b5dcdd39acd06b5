package graft

/** Run one catalog query and show its result —
  * `sbt "Test/runMain graft.RunOneMain r6_resync_e2e [sfdir]"`.
  */
object RunOneMain {
  def main(args: Array[String]): Unit = {
    val names = args.filterNot(_.startsWith("/"))
    val dir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      df.show(20, truncate = false)
      println(f"ROWS $n ${df.count()} in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
