package graft

/** Throwaway diagnostic: per-stage shuffle-write volumes for one query.
  * `sbt "Test/runMain graft.VolProbe d7_simhash /root/testdata/sf0.1"`.
  */
object VolProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.neardup.persistPairs", "false")
    spark.conf.set("graft.substring.persistIndex", "false")
    val stages = new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    val names = new java.util.concurrent.ConcurrentHashMap[Integer, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          stages.merge(t.stageId, t.taskMetrics.shuffleWriteMetrics.recordsWritten, (a, b) => a + b)
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        names.put(s.stageInfo.stageId, s.stageInfo.name.take(120))
    })
    SparkEntry.queries(args(0))(spark, args(1))
      .write.format("noop").mode("overwrite").save()
    org.apache.spark.GraftTestBridge.drainListeners(spark.sparkContext)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2).take(8).foreach { case (id, v) =>
      println(s"VOLPROBE stage=$id written=$v name=${names.getOrDefault(id, "?")}")
    }
    spark.stop()
  }
}
