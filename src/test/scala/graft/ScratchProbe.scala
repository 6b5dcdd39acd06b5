package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Ad-hoc measurement scratchpad for the optimization round (test scope,
  * never part of the driver contract). Edit freely between runs.
  *
  * Current experiment: decompose the per-round cost of the CC fixpoint's
  * durable TableRounds store — how much of a round goes to the DROP
  * TABLE, the parquet write (planning + jobs + commit), the catalog
  * re-read, the count, and the convergence EXCEPT.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    /** Manual replica of the TableRounds fixpoint loop, phase-timed. */
    def timedRun(prefix: String): Unit = {
      def name(round: Int) = s"${prefix}_${round % 2}"
      def put(df: DataFrame, round: Int): DataFrame = {
        val n = name(round)
        val t0 = System.nanoTime()
        graft.operators.ReplicaTable.dropTableAndLocation(spark, n)
        val t1 = System.nanoTime()
        df.write.format("parquet").saveAsTable(n)
        val t2 = System.nanoTime()
        val out = spark.table(n)
        val t3 = System.nanoTime()
        println(f"PUT round=$round drop=${(t1 - t0) / 1e6}%6.1f ms " +
          f"write=${(t2 - t1) / 1e6}%7.1f ms read=${(t3 - t2) / 1e6}%5.1f ms")
        out
      }
      // a chain + stars graph, a few thousand edges: 4-5 rounds
      val edges = ((1L until 4000L).map(i => (i, i - 1)) ++
        (0L until 2000L).map(i => (i * 3 + 10000, i))).toDF("src", "dst")
      val t0 = System.nanoTime()
      var e = put(edges
        .select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .where(col("src") =!= col("dst")).distinct(), 0)
      var cnt = { val t = System.nanoTime(); val c = e.count()
        println(f"COUNT ${(System.nanoTime() - t) / 1e6}%6.1f ms"); c }
      var converged = cnt == 0L
      var iter = 0
      while (!converged && iter < 50) {
        val next = put(graft.operators.ConnectedComponents.smallStar(
          graft.operators.ConnectedComponents.largeStar(e)), iter + 1)
        val tc = System.nanoTime()
        val nc = next.count()
        println(f"COUNT ${(System.nanoTime() - tc) / 1e6}%6.1f ms")
        val tx = System.nanoTime()
        converged = nc == cnt && next.except(e).isEmpty
        if (nc == cnt) println(f"EXCEPT ${(System.nanoTime() - tx) / 1e6}%6.1f ms")
        e = next; cnt = nc; iter += 1
      }
      println(f"RUN $prefix rounds=$iter total=${(System.nanoTime() - t0) / 1e9}%.2f s")
      Seq(name(0), name(1)).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
    timedRun("scr_1")
    timedRun("scr_2")
    // A/B: is the per-round write cost AQE stage-job overhead? (If so,
    // disabling AQE for round writes would fuse the 3 exchanges into
    // one job — at the price of losing reducer coalescing: 32 output
    // files per MB-sized round instead of 1.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timedRun("scr_noaqe_1")
    timedRun("scr_noaqe_2")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
