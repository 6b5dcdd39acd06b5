package graft

import graft.operators.SchemaEvolution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The multi-generation unification primitive behind r18: widest-type
  * resolution along the safe numeric ladders, typed-NULL backfill for
  * columns a generation lacks (in EITHER direction — added or dropped),
  * first-seen column order, and loud failure on genuine type conflicts.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("widen follows the numeric ladders and rejects real conflicts") {
    assert(SchemaEvolution.widen(IntegerType, LongType) === LongType)
    assert(SchemaEvolution.widen(LongType, IntegerType) === LongType)
    assert(SchemaEvolution.widen(ByteType, ShortType) === ShortType)
    assert(SchemaEvolution.widen(FloatType, DoubleType) === DoubleType)
    assert(SchemaEvolution.widen(LongType, DoubleType) === DoubleType)
    assert(SchemaEvolution.widen(IntegerType, FloatType) === DoubleType)
    assert(SchemaEvolution.widen(StringType, StringType) === StringType)
    val e = intercept[IllegalArgumentException](
      SchemaEvolution.widen(StringType, LongType))
    assert(e.getMessage.contains("cannot reconcile"))
  }

  test("unionEvolved widens types, backfills dropped AND added columns as typed NULL") {
    // gen 1: amount int, legacy string (dropped later); gen 2: amount
    // widened to double, new column k (added later)
    val g1 = Seq((1L, 10, "old")).toDF("id", "amount", "legacy")
      .select(col("id"), col("amount").cast("int").as("amount"), col("legacy"))
    val g2 = Seq((2L, 2.5, 7L)).toDF("id", "amount", "k")
    val u = SchemaEvolution.unionEvolved(Seq(g1, g2))
    // first-seen column order; amount widened to double everywhere
    assert(u.columns.toSeq === Seq("id", "amount", "legacy", "k"))
    assert(u.schema("amount").dataType === DoubleType)
    assert(u.schema("legacy").dataType === StringType)
    assert(u.schema("k").dataType === LongType)
    val rows = u.orderBy("id").collect()
    assert(rows(0).getDouble(1) === 10.0 && rows(0).getString(2) === "old"
      && rows(0).isNullAt(3), "gen-1 row lost its own columns or invented k")
    assert(rows(1).getDouble(1) === 2.5 && rows(1).isNullAt(2)
      && rows(1).getLong(3) === 7L, "gen-2 row must surface legacy as NULL")
    // a single generation passes through untouched
    assert(SchemaEvolution.unionEvolved(Seq(g2)).collect().toSeq
      === g2.collect().toSeq)
    // conflicting column types across generations fail loudly
    val bad = Seq(("x", 1L)).toDF("id", "amount") // id string vs long
    intercept[IllegalArgumentException](
      SchemaEvolution.unionEvolved(Seq(g1.withColumn("id", lit("s")), g2)))
    intercept[IllegalArgumentException](
      SchemaEvolution.unionEvolved(Seq(bad.withColumn("amount", lit("s")), g2)))
  }
}
