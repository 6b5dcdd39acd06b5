package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B attribution for the round-6 catalog-wide bench drift
  * (VERDICT r6 "what's wrong" #1): the 111 queries shared with
  * `BENCH_local_r5c.json` moved ~1.7× in lockstep between rounds with no
  * plan changes, and the repo's own cross-night records cannot separate
  * (a) session composition — 37 more queries per pass, more persisted-
  * index builds interleaved, catalog/GC growth — from (b) box noise from
  * (c) a real regression.
  *
  * Design: ONE session, same config as [[Bench]], full-catalog warmup at
  * sf0.001 (so codegen compilation is paid identically for both arms),
  * then alternating whole-catalog passes S,F,S,F where S times ONLY the
  * r5c subset and F times the full catalog. If the subset-arm minima for
  * the 111 common queries match the full-arm minima, the extra 37
  * queries do not inflate the rest and the cross-round drift is box/
  * session-external; a consistent full-arm penalty would localize the
  * overhead IN-session. Pass totals are also printed in run order so
  * session aging (later passes slower on identical work) is visible.
  *
  * `sbt "Test/runMain graft.BenchAB [subset-record.json]"` — the subset
  * is the "queries" key set of the given bench record (default
  * BENCH_local_r5c.json), intersected with the current catalog.
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val subsetFile = args.headOption.getOrElse("BENCH_local_r5c.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.get("SPARK_GRAFT_AB_ROUNDS")
      .flatMap(_.toIntOption).getOrElse(2).max(1)
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(subsetFile)), "UTF-8")
    val qStart = txt.indexOf("\"queries\":{")
    require(qStart >= 0, s"$subsetFile has no \"queries\" object")
    val qSec = txt.substring(qStart + 11, txt.indexOf("}", qStart))
    val subsetNames = "\"([a-zA-Z0-9_]+)\":".r
      .findAllMatchIn(qSec).map(_.group(1)).toSet
    // the flat-brace extraction above assumes "queries" holds no nested
    // objects; if the record format ever changes, fail loudly instead of
    // silently timing a truncated subset
    require(subsetNames.nonEmpty,
      s"$subsetFile: parsed an empty \"queries\" subset — record format changed?")
    val catalog = SparkEntry.queries
    val subset = (subsetNames intersect catalog.keySet).toSeq.sorted
    val full = catalog.keys.toSeq.sorted
    System.err.println(
      s"[ab] subset=${subset.size} of ${subsetNames.size} in $subsetFile; " +
        s"full=${full.size}; rounds=$rounds; sf=$sfDir")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // identical warmup to Bench: both arms enter the timed phase with the
    // same codegen cache
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val warmDir = "/root/testdata/sf0.001"
    full.foreach { n =>
      try catalog(n)(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[ab] warmup $n failed: $e") }
    }

    def pass(arm: String, names: Seq[String]): (Double, Map[String, Double]) = {
      val times = names.flatMap { n =>
        val t0 = System.nanoTime()
        try {
          catalog(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some(n -> (System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[ab] $arm $n failed: $e"); None
        }
      }.toMap
      (times.values.sum, times)
    }

    val passLog = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (r <- 1 to rounds; arm <- Seq("subset", "full")) {
      val names = if (arm == "subset") subset else full
      val (total, times) = pass(s"$arm$r", names)
      passLog += (s"$arm$r" -> total)
      System.err.println(f"[ab] pass $arm$r total $total%.1f s")
      times.foreach { case (n, t) =>
        val k = (arm, n)
        best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
      }
    }

    def tot(arm: String, names: Seq[String]): Double =
      names.flatMap(n => best.get((arm, n))).sum
    val commonSub = tot("subset", subset)
    val commonFull = tot("full", subset)
    def qjson(arm: String, names: Seq[String]): String = names
      .flatMap(n => best.get((arm, n)).map(t => "\"" + n + f"""":$t%.3f"""))
      .mkString("{", ",", "}")
    val passes = passLog
      .map { case (p, t) => "\"" + p + f"""":$t%.1f""" }.mkString("{", ",", "}")
    val json =
      f"""{"metric":"ab_common_ratio","value":${commonFull / commonSub}%.3f,"unit":"x","common_n":${subset.size},"subset_arm_common_sec":$commonSub%.1f,"full_arm_common_sec":$commonFull%.1f,"full_arm_total_sec":${tot("full", full)}%.1f,"pass_totals":$passes,"sf":"$sfDir","subset_queries":${qjson("subset", subset)},"full_queries":${qjson("full", full)}}"""
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_AB_OUT", "BENCH_local_ab.json")),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[ab] artifact write failed: $e") }
    spark.stop()
  }
}
