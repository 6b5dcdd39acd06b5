package graft

import graft.config.{CastRegistry, ColumnSpec, TableConfig}
import graft.operators.SchemaTransform
import org.apache.spark.sql.Row

/** Port of the reference's casting/constraint matrix
  * (test/test_schema.py:34-85) plus the custom to_array transformer
  * (tables/transform.py, test/test_clickhouse.py:40-49).
  */
class SchemaTransformSpec extends SparkSpec {
  import spark.implicits._

  // mirror of test_schema.py:7-31's inline schema
  private val config = TableConfig(
    name = "Test",
    columns = Seq(
      ColumnSpec("Id", Seq("int"), ref = Some("_key"), primaryKey = true),
      ColumnSpec("Name", Seq("str"), ref = Some("name"), default = Some("temp")),
      ColumnSpec("Attr1", Seq("int"), ref = Some("attr1"), default = Some(10L)),
      ColumnSpec("Attr2", Seq("int"), ref = Some("attr2"), required = true)))

  test("string->int cast: '1' casts to 1 (test_schema.py:40-41)") {
    val df = Seq(("1", "n1", "2", "3")).toDF("_key", "name", "attr1", "attr2")
    val out = SchemaTransform(df, config).valid.collect()
    assert(out.toSeq == Seq(Row(1L, "n1", 2L, 3L)))
  }

  test("default applied when field missing (test_schema.py:44-45)") {
    val df = Seq(("7", "42")).toDF("_key", "attr2") // no name, no attr1
    val out = SchemaTransform(df, config).valid.collect()
    assert(out.toSeq == Seq(Row(7L, "temp", 10L, 42L)))
  }

  test("missing primary key rejects row (test_schema.py:53-55)") {
    val df = Seq((Option.empty[String], "n", "1", "2")).toDF("_key", "name", "attr1", "attr2")
    val res = SchemaTransform(df, config)
    assert(res.valid.count() == 0)
    val err = res.errors.collect()
    assert(err.length == 1 && err(0).getString(1).contains("primary key"))
  }

  test("missing required field rejects row (test_schema.py:57-59)") {
    val df = Seq(("1", "n", "1", Option.empty[String])).toDF("_key", "name", "attr1", "attr2")
    val res = SchemaTransform(df, config)
    assert(res.valid.count() == 0)
    assert(res.errors.collect()(0).getString(1).contains("required"))
  }

  test("uncastable value rejects row and lands in error channel") {
    val df = Seq(("1", "n", "1", "not-a-number")).toDF("_key", "name", "attr1", "attr2")
    val res = SchemaTransform(df, config)
    assert(res.valid.count() == 0)
    assert(res.errors.collect()(0).getString(1).contains("cast failed"))
  }

  test("unknown cast tag is a config error (test_schema.py:71-85)") {
    assertThrows[IllegalArgumentException] {
      CastRegistry.caster("no_such_cast")
    }
  }

  test("multi-type fallback tries casters in order (transformer.py:84-92)") {
    val spec = TableConfig("T", Seq(
      ColumnSpec("V", Seq("int", "str"), ref = Some("v"), primaryKey = true)))
    val df = Seq("123", "abc").toDF("v")
    val out = SchemaTransform(df, spec).valid.orderBy("V").collect().map(_.get(0))
    // int cast wins for "123"; str fallback keeps "abc"
    assert(out.toSet == Set("123", "abc"))
  }

  test("custom to_array transformer: CSV split (tables/transform.py:1-8)") {
    val spec = TableConfig("T", Seq(
      ColumnSpec("Id", Seq("int"), ref = Some("k"), primaryKey = true),
      ColumnSpec("Answers", Seq("to_array"), ref = Some("a"))))
    val df = Seq(("1", " x,y,z ")).toDF("k", "a")
    val out = SchemaTransform(df, spec).valid.collect()(0)
    assert(out.getSeq[String](1) == Seq("x", "y", "z"))
  }

  test("unknown source fields are dropped (transformer.py:65-67)") {
    val df = Seq(("1", "n", "2", "3", "junk")).toDF("_key", "name", "attr1", "attr2", "extra")
    val out = SchemaTransform(df, config).valid
    assert(out.columns.toSeq == Seq("Id", "Name", "Attr1", "Attr2"))
  }

  test("source-field presence matches case-insensitively, like Spark's resolver") {
    // '_Key' vs ref '_key': exact-case contains() would declare the
    // primary key MISSING and dead-letter every row, even though
    // col(\"_key\") resolves fine under the default resolver
    val df = Seq(("1", "n", "2", "3")).toDF("_Key", "Name", "ATTR1", "attr2")
    val t = SchemaTransform(df, config)
    assert(t.errors.isEmpty,
      s"case-respelled columns dead-lettered: ${t.errors.collect().toSeq}")
    val r = t.valid.collect().head
    assert(r.getLong(0) === 1L && r.getString(1) === "n")
  }
}
