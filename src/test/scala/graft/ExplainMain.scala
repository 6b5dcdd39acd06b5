package graft

/** Plan inspection helper: print the formatted physical plan of one or
  * more catalog queries over a fixture dir —
  * `sbt "Test/runMain graft.ExplainMain q20_qualified_suppliers [sfdir]"`.
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val names = args.filterNot(_.startsWith("/"))
    val dir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
