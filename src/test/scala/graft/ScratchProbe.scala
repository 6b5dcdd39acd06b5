package graft.queries
import graft.{GraftSession, SparkEntry, Tables}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc measurement scratchpad for the optimization round (test scope,
  * never part of the driver contract). Edit freely between runs.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // d11 with an AQE materialization barrier before the final sort: the
    // narrow repartition makes the range-sampling pass read materialized
    // shuffle blocks instead of recomputing the winnowing pipeline.
    def d11Barrier(spark: SparkSession, dir: String): DataFrame = {
      val base = SparkEntry.queries("d11_winnowing")
      // rebuild: same pipeline but barrier before orderBy — easiest is to
      // reuse the catalog query minus its trailing sort, which we cannot
      // do generically; so replicate via sortWithinPartitions trick:
      // orderBy on a repartitioned frame.
      base(spark, dir) // placeholder, replaced below
    }

    val K = 8; val W = 4
    import graft.functions.WrapMulAdd
    def gramHash(text: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (0 until K).foldLeft(lit(0L).cast("long"))(
        (h, j) => WrapMulAdd(h, 31L, 0L)
          .bitwiseXOR(ascii(text.substr(i + j, lit(1))).cast("long")))
    def d11Variant(barrier: Boolean)(spark: SparkSession, dir: String): DataFrame = {
      val core = Tables.load(spark, dir, "documents")
        .filter(length(col("text")) >= K + W - 1)
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          transform(sequence(lit(1), length(col("text")) - (K - 1)),
            i => gramHash(col("text"), i)).as("hs"))
        .select(col("doc_id"),
          array_distinct(transform(sequence(lit(1), size(col("hs")) - (W - 1)),
            p => array_min(slice(col("hs"), p, lit(W))))).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fingerprints"),
          array_min(col("fps")).as("min_fp"))
      (if (barrier) core.localCheckpoint(false) else core)
        .orderBy(col("doc_id"))
    }

    val stageTimes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        for (s <- si.submissionTime; c <- si.completionTime)
          stageTimes.add(
            f"STAGE ${si.stageId}%4d ${(c - s) / 1e3}%6.2f s tasks=${si.numTasks}%3d " +
              f"run=${m.executorRunTime / 1e3}%6.2f cpu=${m.executorCpuTime / 1e9}%6.2f " +
              f"shr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%6.1fMB shw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%6.1fMB")
      }
    })
    val arms: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "d11_plain" -> d11Variant(false) _,
      "d11_barrier" -> d11Variant(true) _)
    arms.foreach { case (_, f) =>
      f(spark, sfDir).write.format("noop").mode("overwrite").save() }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 1 to 3; (n, f) <- arms) {
      stageTimes.clear()
      val t0 = System.nanoTime()
      f(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
      Thread.sleep(200)
      println(f"SCRATCH round$r $n $t%.2f s")
      if (r == 3) stageTimes.forEach(l => println(s"  $n $l"))
    }
    best.toSeq.sortBy(_._1).foreach { case (n, t) => println(f"SCRATCHMIN $n $t%.2f") }
    spark.stop()
  }
}
