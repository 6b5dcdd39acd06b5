package graft

/** Interleaved A/B of a session conf over catalog queries —
  * `sbt "Test/runMain graft.ABProbe <conf>=<valA>|<valB> q1,q23 [sfdir]"`.
  * Runs N alternating rounds per arm in ONE JVM (same codegen cache,
  * same box window) and reports per-arm minima — the bench's own
  * noise-floor estimator, interleaved so a co-tenant stall cannot bias
  * one arm.
  */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val Array(conf, valA, valB) = {
      val Array(k, vs) = args(0).split("=", 2)
      val Array(a, b) = vs.split("\\|", 2)
      Array(k, a, b)
    }
    val names = args(1).split(",").toSeq
    val sfDir = args.find(_.startsWith("/root/testdata"))
      .getOrElse("/root/testdata/sf0.1")
    val rounds = sys.env.get("GRAFT_AB_ROUNDS").flatMap(_.toIntOption).getOrElse(3)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup (codegen/JIT) at the probe dir itself, once per query
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[ab] warmup $n: $e") }
    }
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (r <- 1 to rounds; v <- Seq(valA, valB); n <- names) {
      spark.conf.set(conf, v)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      best((n, v)) = math.min(best.getOrElse((n, v), Double.MaxValue), t)
      println(f"AB round$r $conf=$v $n $t%.2f s")
    }
    for (n <- names)
      println(f"ABMIN $n  $valA=${best((n, valA))}%.2f  $valB=${best((n, valB))}%.2f")
    spark.stop()
  }
}
