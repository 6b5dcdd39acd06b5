package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job wall-time profiler for one or more catalog queries —
  * `sbt "Test/runMain graft.JobProfile d12_dup_clusters [sfdir]"`.
  *
  * Prints every Spark job the query triggers (construction-time actions
  * included — CC fixpoint rounds, persisted-index builds, headroom
  * probes) with its wall duration, so the bench seconds decompose into
  * the actions that spend them. Measurement only; no production code.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.find(_.startsWith("/root/testdata"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageTimes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          lines.add(f"JOB ${je.jobId}%4d start=${t0 % 1000000}%6d ms dur=${(je.time - t0) / 1e3}%7.2f s end=${je.time % 1000000}%6d  $desc")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        for (s <- si.submissionTime; c <- si.completionTime)
          stageTimes.add(
            f"STAGE ${si.stageId}%4d ${(c - s) / 1e3}%7.2f s tasks=${si.numTasks}%4d " +
              f"run=${m.executorRunTime / 1e3}%6.2f cpu=${m.executorCpuTime / 1e9}%6.2f " +
              f"deser=${m.executorDeserializeTime / 1e3}%5.2f gc=${m.jvmGCTime / 1e3}%5.2f " +
              f"shr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB shw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB " +
              si.name.take(60))
      }
    }

    // warmup at sf0.001 (codegen/JIT), mirroring Bench
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[profile] warmup $n: $e") }
    }
    spark.sparkContext.addSparkListener(listener)
    for (pass <- 1 to 2; n <- names) {
      lines.clear(); stageTimes.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      // listener events are async — give the bus a beat to drain
      Thread.sleep(300)
      println(f"===== $n pass$pass total $total%.2f s =====")
      lines.forEach(l => println(l))
      if (sys.env.contains("GRAFT_PROFILE_STAGES"))
        stageTimes.forEach(l => println(l))
    }
    spark.stop()
  }
}
