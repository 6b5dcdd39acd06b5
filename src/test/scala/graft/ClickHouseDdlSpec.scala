package graft

import graft.config.{ClickHouseDdl, ColumnSpec, ConfigYaml, TableConfig}
import org.scalatest.funsuite.AnyFunSuite

/** DDL-emission goldens (VERDICT r11 #4 / r12 #3): a table declared only
  * through `schema.properties` must get a ClickHouse creation path, and
  * on the reference's own test.yaml config the emission must reproduce
  * the hand-written `table:` block byte-for-byte
  * (reference: tables/test.yaml:2-16, replication/schema/helper.py:97-122).
  * Pure string layer — no SparkSession needed.
  */
class ClickHouseDdlSpec extends AnyFunSuite {

  // structurally equivalent to the reference's full tables/test.yaml
  // (readme.md:115-142): every column of its hand-written DDL block is
  // derivable from the properties alone
  private val yaml =
    """---
      |table_name: Test
      |
      |buffer:
      |  num_layers: 1
      |  min_time: 15
      |  max_time: 30
      |  min_rows: 1000
      |  max_rows: 2000
      |  min_bytes: 10000000
      |  max_bytes: 20000000
      |
      |schema:
      |  properties:
      |    Id:
      |      type: int
      |      ref: _key # arango column name
      |    Name:
      |      type: str
      |      ref: name
      |      required: true
      |    Email:
      |      type: str
      |      ref: email
      |      required: true
      |    Answers:
      |      type: to_array # custom transform function
      |      default: [ ]
      |    SubmittedOn:
      |      type: from_datetime
      |      ref: submitted_on
      |    _rev:
      |      type: str
      |      default: ''
      |    _ver:
      |      type: int
      |      default: 1
      |    _deleted:
      |      type: int
      |      default: 0
      |  primary_key: Id
      |""".stripMargin

  private val cfg = ConfigYaml.tableConfig(yaml)

  test("createTable reproduces the reference's hand-written DDL block byte-for-byte") {
    // tables/test.yaml:2-16 verbatim: the ordering key there is the
    // physical (Id, Name), wider than the logical primary_key Id
    val expected =
      """CREATE TABLE Test
        |(
        |    `Id`             Int64,
        |    `Name`           String,
        |    `Email`          String,
        |    `Answers`        Array(String),
        |    `SubmittedOn`    Nullable(DateTime),
        |    `_ver`           UInt64,
        |    `_rev`           String,
        |    `_deleted`       UInt8
        |) ENGINE = ReplacingMergeTree(_ver)
        |      PRIMARY KEY (Id, Name)
        |      ORDER BY (Id, Name)
        |      SETTINGS index_granularity = 256""".stripMargin
    val ddl = ClickHouseDdl.createTable(cfg,
      orderBy = Seq("Id", "Name"), indexGranularity = Some(256L))
    assert(ddl === expected)
  }

  test("bufferTable emits the helper.py generated shape") {
    // helper.py:97-122: same columns, _Buffer suffix, engine swapped for
    // Buffer(db, table, <the seven knobs in YAML order>), no layout clauses
    val buf = ClickHouseDdl.bufferSpec(yaml).get
    assert(buf === ClickHouseDdl.BufferSpec(1, 15, 30, 1000, 2000, 10000000, 20000000))
    val expected =
      """CREATE TABLE analytics.Test_Buffer
        |(
        |    `Id`             Int64,
        |    `Name`           String,
        |    `Email`          String,
        |    `Answers`        Array(String),
        |    `SubmittedOn`    Nullable(DateTime),
        |    `_ver`           UInt64,
        |    `_rev`           String,
        |    `_deleted`       UInt8
        |) ENGINE = Buffer(analytics, Test, 1, 15, 30, 1000, 2000, 10000000, 20000000)""".stripMargin
    assert(ClickHouseDdl.bufferTable(cfg, "analytics", buf) === expected)
  }

  test("ordering key defaults to the logical primary keys; db qualifies the name") {
    val ddl = ClickHouseDdl.createTable(cfg, db = Some("analytics"))
    assert(ddl.startsWith("CREATE TABLE analytics.Test\n"))
    assert(ddl.contains("      PRIMARY KEY (Id)\n      ORDER BY (Id)"))
    assert(!ddl.contains("SETTINGS")) // no granularity requested
  }

  test("a keyless config is rejected: ReplacingMergeTree needs an ordering key") {
    val keyless = TableConfig("NoKey", Seq(ColumnSpec("A", Seq("str"))))
    val e = intercept[IllegalArgumentException] {
      ClickHouseDdl.createTable(keyless)
    }
    assert(e.getMessage.contains("ordering key"))
    // an explicit physical key rescues it
    assert(ClickHouseDdl.createTable(keyless, orderBy = Seq("A"))
      .contains("ORDER BY (A)"))
  }

  test("type derivation: explicit ch_type wins; optional-no-default wraps Nullable; composites never do") {
    def col(c: ColumnSpec): String = ClickHouseDdl.chType(c)
    // explicit override beats the tag mapping (helper.py:79-86 reads it)
    assert(col(ColumnSpec("K", Seq("int"), chType = Some("UInt32"), primaryKey = true)) === "UInt32")
    // an explicitly-Nullable ch_type is not double-wrapped
    assert(col(ColumnSpec("N", Seq("str"), chType = Some("Nullable(String)"))) === "Nullable(String)")
    // optionality: pk / required / default each suppress Nullable
    assert(col(ColumnSpec("A", Seq("float"))) === "Nullable(Float64)")
    assert(col(ColumnSpec("B", Seq("float"), required = true)) === "Float64")
    assert(col(ColumnSpec("C", Seq("float"), default = Some(0.0))) === "Float64")
    assert(col(ColumnSpec("D", Seq("bool"))) === "Nullable(UInt8)")
    // composites stay bare even when optional (ClickHouse forbids
    // Nullable(Array/Map))
    assert(col(ColumnSpec("E", Seq("list_int"))) === "Array(Int64)")
    assert(col(ColumnSpec("F", Seq("decode_json"))) === "Map(String, String)")
    // multi-tag fallback chain stores as the LAST tag (TableConfig's
    // structType rule)
    assert(col(ColumnSpec("G", Seq("int", "str"), default = Some("0"))) === "String")
    // unmapped custom tags must be declared explicitly
    val e = intercept[IllegalArgumentException] {
      col(ColumnSpec("H", Seq("my_custom")))
    }
    assert(e.getMessage.contains("ch_type"))
  }

  test("bufferSpec: absent block is None; a missing knob fails loudly") {
    assert(ClickHouseDdl.bufferSpec("table_name: T\nschema:\n  properties:\n    A:\n      type: str\n  primary_key: A\n") === None)
    val e = intercept[IllegalArgumentException] {
      ClickHouseDdl.bufferSpec("buffer:\n  num_layers: 1\n") // six knobs missing
    }
    assert(e.getMessage.contains("buffer.min_time"))
    // present-but-malformed throws too: a typo'd block silently skipping
    // the Buffer DDL would be indistinguishable from "none wanted"
    val m = intercept[IllegalArgumentException] {
      ClickHouseDdl.bufferSpec("buffer: 15\n")
    }
    assert(m.getMessage.contains("not a mapping"))
  }

  test("r8's second config table emits a creation path end-to-end") {
    val cfg2 = ConfigYaml.tableConfig(graft.queries.Replication.r8Yaml)
    val ddl = ClickHouseDdl.createTable(cfg2, db = Some("analytics"))
    assert(ddl.startsWith(s"CREATE TABLE analytics.${cfg2.name}\n"))
    assert(ddl.contains(s"ENGINE = ReplacingMergeTree(_ver)"))
    assert(ddl.contains(s"PRIMARY KEY (${cfg2.primaryKeys.mkString(", ")})"))
    // every declared column plus the synthesized pair appears exactly once
    (cfg2.columns.map(_.name) ++ Seq("_ver", "_deleted")).foreach { n =>
      assert(ddl.linesIterator.count(_.contains(s"`$n`")) === 1, n)
    }
  }
}
