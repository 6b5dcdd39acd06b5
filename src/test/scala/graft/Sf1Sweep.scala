package graft

/** One-off sf1 scaling sweep of the documents-family heavy tail
  * (VERDICT r14 #7): the driver's fixtures stop at sf0.1, where EVERY
  * query is overhead-bound and 8 cores beat 32 — so the 100 TB claims
  * rested on code-level gating alone. This main times the heavy-tail
  * queries on [[ScalingCorpus]]'s deterministic 50,000-doc corpus
  * (10x sf0.1 — "sf1") at the session's core count; run it once with
  * SPARK_GRAFT_CPUS=32 and once with 8 and compare:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.Sf1Sweep"
  *   SPARK_GRAFT_CPUS=8  sbt "Test/runMain graft.Sf1Sweep"
  *
  * Bench methodology (noop sink, warmup at sf0.001, min over 2 passes).
  * Only documents-backed queries: the corpus generator mints documents
  * only — q1/m4-style fact scans stay covered by scanSpread's byte gate
  * (provably a no-op above cores x openCostInBytes), which needs no
  * measurement to hold at scale. Measurement only; never part of the
  * driver contract.
  */
object Sf1Sweep {
  private val Names = Seq(
    "d7_simhash", "d11_winnowing", "d12_dup_clusters",
    "d26_incremental_clusters", "d28_deletion_clusters",
    "d9_langid_ngram", "d20_incremental_spans", "p9_bloom_decontaminate",
    "d5_ngram_jaccard")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = ScalingCorpus.ensure(spark, 50000L)
    Names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[sf1] warmup $n: $e") }
    }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to 2; n <- Names) {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
      } catch { case e: Throwable =>
        System.err.println(s"[sf1] $n failed: $e")
      }
    }
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = Names.flatMap(n => best.get(n).map(v => s""""$n":${f3(v)}"""))
      .mkString("{", ",", "}")
    println(s"""SF1SWEEP {"cpus":$cpus,"n_docs":50000,"queries":$qs}""")
    spark.stop()
  }
}
