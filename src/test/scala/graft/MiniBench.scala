package graft
import org.apache.spark.sql.SparkSession
object MiniBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the SAME session Bench runs (r14: including the catalog-sized
    // codegen cache) — a private builder here measured a different
    // engine (100-entry codegen cache => every pass recompiles)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup at the smallest SF, mirroring Bench, unless disabled
    if (!sys.env.contains("GRAFT_MINI_NOWARM"))
      names.foreach { n =>
        try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[mini] warmup $n: $e") }
      }
    for (pass <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"MINI pass$pass $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
