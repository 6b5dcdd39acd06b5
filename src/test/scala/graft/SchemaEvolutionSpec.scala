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

  test("nested types equal up to nullability are NOT conflicts") {
    // literal-built frames infer NOT NULL nested fields; parsed/read
    // data infers nullable — the same logical column either way
    val strict = StructType(Seq(StructField("a", IntegerType, nullable = false)))
    val loose = StructType(Seq(StructField("a", IntegerType, nullable = true)))
    assert(SchemaEvolution.widen(strict, loose) === loose)
    assert(SchemaEvolution.widen(
        ArrayType(IntegerType, containsNull = false),
        ArrayType(IntegerType, containsNull = true))
      === ArrayType(IntegerType, containsNull = true))
    // end to end: frames whose struct column differs only in nested
    // nullability union instead of throwing
    val g1 = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, org.apache.spark.sql.Row(10))),
      StructType(Seq(StructField("id", LongType),
        StructField("props", strict, nullable = false))))
    val g2 = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(2L, org.apache.spark.sql.Row(20))),
      StructType(Seq(StructField("id", LongType),
        StructField("props", loose, nullable = true))))
    val u = SchemaEvolution.unionEvolved(Seq(g1, g2))
    assert(u.orderBy("id").collect().map(_.getStruct(1).getInt(0)).toSeq === Seq(10, 20))
  }

  test("numeric widening descends through same-shape struct/array/map") {
    // the r18 family's missing migration (VERDICT r9 #4): upstream
    // widens a NESTED leaf — struct<x:int> becomes struct<x:double>,
    // array<int> becomes array<double>. Same-shape nesting widens
    // recursively; shape changes stay loud (tested below).
    assert(SchemaEvolution.widen(
        StructType(Seq(StructField("x", IntegerType))),
        StructType(Seq(StructField("x", DoubleType))))
      === StructType(Seq(StructField("x", DoubleType))))
    assert(SchemaEvolution.widen(ArrayType(IntegerType), ArrayType(DoubleType))
      === ArrayType(DoubleType, containsNull = true))
    assert(SchemaEvolution.widen(
        MapType(IntegerType, FloatType), MapType(LongType, DoubleType))
      === MapType(LongType, DoubleType, valueContainsNull = true))
    // deep nesting: the ladder reaches a leaf two levels down
    def deep(leaf: DataType) = StructType(Seq(StructField("arr",
      ArrayType(StructType(Seq(StructField("v", leaf)))))))
    val wide = SchemaEvolution.widen(deep(IntegerType), deep(DoubleType))
    assert(wide.asInstanceOf[StructType]("arr").dataType
      .asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType]("v").dataType === DoubleType)
    // struct field names match case-insensitively, like top level
    assert(SchemaEvolution.widen(
        StructType(Seq(StructField("X", IntegerType))),
        StructType(Seq(StructField("x", LongType))))
      .asInstanceOf[StructType].head.dataType === LongType)

    // end to end: the widened struct column casts up positionally and
    // unions — gen-1 ints surface as exact .0 doubles
    val g1 = Seq(1L).toDF("id")
      .selectExpr("id", "named_struct('amount', cast(10 as int)) as meta")
    val g2 = Seq(2L).toDF("id")
      .selectExpr("id", "named_struct('amount', cast(2.5 as double)) as meta")
    val u = SchemaEvolution.unionEvolved(Seq(g1, g2))
    assert(u.schema("meta").dataType
      .asInstanceOf[StructType]("amount").dataType === DoubleType)
    assert(u.orderBy("id").collect()
      .map(_.getStruct(1).getDouble(0)).toSeq === Seq(10.0, 2.5))
  }

  test("nested shape changes and leaf conflicts fail loudly with the field path") {
    // field add/drop inside a struct: a positional cast would move
    // values between fields — must throw, never guess
    val e1 = intercept[IllegalArgumentException](SchemaEvolution.widen(
      StructType(Seq(StructField("x", IntegerType), StructField("y", IntegerType))),
      StructType(Seq(StructField("x", IntegerType)))))
    assert(e1.getMessage.contains("cannot reconcile"))
    // reorder: same fields, different positions — same hazard
    intercept[IllegalArgumentException](SchemaEvolution.widen(
      StructType(Seq(StructField("x", IntegerType), StructField("y", LongType))),
      StructType(Seq(StructField("y", LongType), StructField("x", IntegerType)))))
    // a genuine leaf conflict names the nested field it died in
    val e3 = intercept[IllegalArgumentException](SchemaEvolution.widen(
      StructType(Seq(StructField("x", StringType))),
      StructType(Seq(StructField("x", LongType)))))
    assert(e3.getMessage.contains("in struct field 'x'"))
    // ...and conflicts under arrays/maps carry their level too (review
    // catch: only the struct case wrapped the message at first)
    val e4 = intercept[IllegalArgumentException](SchemaEvolution.widen(
      ArrayType(StringType), ArrayType(LongType)))
    assert(e4.getMessage.contains("in array element"))
    val e5 = intercept[IllegalArgumentException](SchemaEvolution.widen(
      StructType(Seq(StructField("m", MapType(StringType, IntegerType)))),
      StructType(Seq(StructField("m", MapType(LongType, IntegerType))))))
    assert(e5.getMessage.contains("in struct field 'm'") &&
      e5.getMessage.contains("in map key"))
  }

  test("column names match case-insensitively, first-seen spelling wins") {
    // a generation that respelled Amount -> amount is the same column
    // evolving (Spark's default resolver is case-insensitive); exact-case
    // keying would emit BOTH columns, the twin NULL-backfilled
    val g1 = Seq((1L, 10)).toDF("id", "Amount")
      .select(col("id"), col("Amount").cast("int").as("Amount"))
    val g2 = Seq((2L, 2.5)).toDF("id", "amount")
    val u = SchemaEvolution.unionEvolved(Seq(g1, g2))
    assert(u.columns.toSeq === Seq("id", "Amount"),
      s"case-respelled column duplicated: ${u.columns.toSeq}")
    assert(u.schema("Amount").dataType === DoubleType)
    assert(u.orderBy("id").collect().map(_.getDouble(1)).toSeq === Seq(10.0, 2.5))
  }
}
