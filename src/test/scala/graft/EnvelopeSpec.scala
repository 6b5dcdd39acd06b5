package graft

import graft.operators.Envelope
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden port of the reference's consumer envelope test
  * (test/test_consumer.py:6-37): 4 records — below-tick upsert, in-range
  * upsert, remove, tombstone — with initial_tick=101 yield exactly 2 rows
  * with the computed _ver and _deleted.
  */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val dataSchema = StructType(Seq(
    StructField("_key", StringType), StructField("name", StringType)))

  test("golden envelope: tick filter, tombstone drop, _ver/_deleted synthesis") {
    val records = Seq(
      (0L, "100", 2300, """{"_key":"1","name":"t1"}"""),
      (1L, "101", 2300, """{"_key":"2","name":"t2"}"""),
      (2L, "102", 2302, """{"_key":"2","name":"t2"}"""),
      (3L, "103", 2300, null.asInstanceOf[String])) // tombstone
      .toDF("offset", "tick", "type", "data")

    val out = Envelope.preProcess(records, dataSchema,
      initialTick = Some(101L),
      clock = lit("2024-01-01").cast("timestamp"))
      .orderBy("offset").collect()

    // tick-100 filtered, tombstone dropped => 2 rows
    assert(out.toSeq == Seq(
      Row(1L, "2", "t2", 20240011L, 0),
      Row(2L, "2", "t2", 20240012L, 1)))
  }

  test("_ver formula is yyyyDDD ++ offset parsed as long (loader.py:76)") {
    val df = Seq((123L, "1", 2300, """{"_key":"k","name":"n"}"""))
      .toDF("offset", "tick", "type", "data")
    val out = Envelope.preProcess(df, dataSchema,
      clock = lit("2025-12-31").cast("timestamp")).collect()(0)
    assert(out.getLong(out.fieldIndex("_ver")) == 2025365123L)
  }

  test("_ver renders the UTC day regardless of the session timezone") {
    val key = "spark.sql.session.timeZone"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "America/New_York")
    try {
      // 01:00 UTC on Jan 2 == 20:00 Jan 1 in New York: the reference's
      // utcnow formula says day 002; a session-timezone date_format
      // would say 001 and pick different replay winners for the same
      // (key, offset) on any non-UTC deployment
      val df = Seq((7L, "1", 2300, """{"_key":"k","name":"n"}"""))
        .toDF("offset", "tick", "type", "data")
      val out = Envelope.preProcess(df, dataSchema,
        clock = lit("2024-01-02T01:00:00Z").cast("timestamp")).collect()(0)
      assert(out.getLong(out.fieldIndex("_ver")) == 20240027L)
    } finally spark.conf.set(key, prev)
  }

  test("op filter keeps upsert/remove on synced collections only (F1)") {
    val df = Seq(
      ("1", 2300, "c1"), ("2", 2302, "c1"), // kept
      ("3", 2200, "c1"), ("4", 2201, "c1"), ("5", 2202, "c1"), // txn markers
      ("6", 2300, "foreign")) // other collection
      .toDF("tick", "type", "cuid")
    val out = Envelope.opFilter(df, Seq("c1")).select("tick").as[String].collect()
    assert(out.sorted.toSeq == Seq("1", "2"))
  }

  test("payload fields colliding with reserved envelope columns fail loudly") {
    import org.apache.spark.sql.types._
    val df = Seq((123L, "1", 2300, """{"offset":9}"""))
      .toDF("offset", "tick", "type", "data")
    // a payload field named 'offset' would emit a DUPLICATE output
    // column and every downstream col("offset") would die with
    // AMBIGUOUS_REFERENCE mid-stream — the config must be rejected at
    // build time instead
    val e = intercept[IllegalArgumentException] {
      Envelope.preProcess(df,
        StructType(Seq(StructField("offset", LongType))))
    }
    assert(e.getMessage.contains("reserved"))
  }
}
