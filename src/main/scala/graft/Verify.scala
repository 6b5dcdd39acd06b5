package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    * Shared with [[Bench]]'s artifact line.
    */
  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional subset for local iteration: GRAFT_ONLY=q1_x,q2_y
    val only = sys.env.get("GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a mistyped name would silently yield an empty successful run
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"GRAFT_ONLY names not in the catalog: ${unknown.mkString(", ")}")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a PRIOR run's dump for this query must not survive the
        // failure — the oracle compare would read it and report a
        // stale PASS for a query that no longer runs. The cleanup is
        // itself guarded: an FS error here must not abort the loop and
        // zero every REMAINING query's dump
        try {
          val dump = new org.apache.hadoop.fs.Path(s"$outDir/$name")
          val fs = dump.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(dump)) fs.delete(dump, true)
        } catch { case c: Throwable =>
          System.err.println(s"[verify] $name stale-dump cleanup failed: $c")
        }
      }
    }
    // a SUBSET run restricts the oracle manifest to the subset too: the
    // compare iterates the manifest, so a deselected query's STALE dump
    // (left in outDir by a prior full run against an older build) can
    // never pair with a manifest entry and report a stale PASS for code
    // that was never re-run
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
