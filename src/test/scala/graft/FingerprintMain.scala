package graft

/** Print the [[graft.operators.PersistedIndex.sourceFingerprint]] of each
  * fixture directory — the stamp correctness claims carry so staleness
  * against a regenerated fixture is detectable (VERDICT r5 item 3):
  * `sbt "Test/runMain graft.FingerprintMain"`.
  */
object FingerprintMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
    dirs.foreach { d =>
      val fp = graft.operators.PersistedIndex.sourceFingerprint(spark, Seq(d))
      println(s"FIXTURE $d $fp")
    }
    spark.stop()
  }
}
