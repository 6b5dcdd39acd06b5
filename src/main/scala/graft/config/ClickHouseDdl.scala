package graft.config

/** ClickHouse DDL emission from a [[TableConfig]] — the table-creation
  * path a live ClickHouse sink would need (VERDICT r11 #4 / r12 #3).
  *
  * The reference ships the base `CREATE TABLE` as a hand-written literal
  * block in each `tables/<name>.yaml` (reference: tables/test.yaml:2-16)
  * and *generates* only the Buffer front table, by string surgery on the
  * base DDL it reads back from `system.tables`
  * (reference: replication/schema/helper.py:97-122): strip the engine
  * clause, rename `db.T` -> `db.T_Buffer`, append
  * `Buffer(db, T, num_layers, min_time, max_time, min_rows, max_rows,
  * min_bytes, max_bytes)`. This emitter derives BOTH from the parsed
  * config, so a table declared only through `schema.properties` gets a
  * creation path without a hand-written DDL block; [[createTable]] on the
  * reference's own test.yaml config reproduces its hand-written block
  * byte-for-byte (golden-pinned in ClickHouseDdlSpec).
  *
  * Cfg-only, like the Kafka transport surfaces (S4/K1): the environment
  * has no ClickHouse server or JDBC driver, so the emitted text is the
  * tested artifact; execution is the deployment's concern.
  *
  * Shape decisions, each anchored to the reference:
  *  - engine `ReplacingMergeTree(_ver)` with the config's version column
  *    (tables/test.yaml:12; the latest-version-wins contract V1).
  *  - column order: regular columns in declaration order, then the
  *    synthesized version column, then underscore-prefixed source-metadata
  *    columns (`_rev`), then the tombstone flag — the metadata-tail
  *    convention of tables/test.yaml:5-13 (`_ver`, `_rev`, `_deleted`).
  *  - `_ver UInt64` / `_deleted UInt8` (tables/test.yaml:11,13) — the
  *    engine synthesizes both in the envelope step, so [[TableConfig]]
  *    carries no ColumnSpec for them.
  *  - nullability: a column is `Nullable(T)` iff it is optional — not a
  *    primary key, not required, and without a default — and T is not a
  *    composite (ClickHouse forbids Nullable(Array/Map)). Reproduces
  *    test.yaml exactly: `SubmittedOn Nullable(DateTime)` is the only
  *    optional-no-default column there.
  *  - `PRIMARY KEY`/`ORDER BY` print the full ordering key: the
  *    reference's hand-written DDL uses `(Id, Name)` in both clauses
  *    (tables/test.yaml:13-14) even though `schema.primary_key` is `Id`
  *    alone — the ordering key is a physical-layout choice wider than the
  *    logical key, so it is a parameter here, defaulting to the logical
  *    primary keys.
  *  - the Buffer engine clause is emitted with a single space after
  *    `ENGINE =`; the reference's concatenation produces a double space
  *    (helper.py:115-118, `f"{schema} Buffer("` after a strip that leaves
  *    `ENGINE = ` trailing) which ClickHouse's parser ignores.
  */
object ClickHouseDdl {

  /** The reference's Buffer-table tuning block, `tables/test.yaml:19-26`;
    * all seven knobs are required there (helper.py:115-118 indexes each).
    */
  final case class BufferSpec(
      numLayers: Long,
      minTime: Long,
      maxTime: Long,
      minRows: Long,
      maxRows: Long,
      minBytes: Long,
      maxBytes: Long)

  /** Parse the optional `buffer:` block of a table YAML. Absent → None
    * (no Buffer front table wanted); present but malformed → throws,
    * like a missing knob — a typo'd block silently skipping the Buffer
    * DDL is the one failure shape worse than failing loudly.
    */
  def bufferSpec(yaml: String): Option[BufferSpec] = {
    val root = ConfigYaml.parse(yaml)
    root.get("buffer").map {
      case n: ConfigYaml.Node =>
        def req(k: String): Long = n.get(k) match {
          case Some(v: Long) => v
          case other => throw new IllegalArgumentException(
            s"buffer.$k missing or not an integer: $other")
        }
        BufferSpec(req("num_layers"), req("min_time"), req("max_time"),
          req("min_rows"), req("max_rows"), req("min_bytes"), req("max_bytes"))
      case other => throw new IllegalArgumentException(
        s"buffer block is not a mapping: $other")
    }
  }

  /** ClickHouse type for one declared column: explicit `ch_type` wins
    * (the reference reads it for the primary key,
    * helper.py:79-86); otherwise derived from the LAST cast tag — the
    * storage type rule [[TableConfig.structType]] already uses.
    */
  def chType(c: ColumnSpec): String = {
    val base = c.chType.getOrElse(baseType(c.types.last))
    val composite = base.startsWith("Array(") || base.startsWith("Map(")
    val optional = !c.primaryKey && !c.required && c.default.isEmpty
    if (optional && !composite && !base.startsWith("Nullable(")) s"Nullable($base)"
    else base
  }

  private def baseType(tag: String): String = tag match {
    case "str"           => "String"
    case "int"           => "Int64"
    case "float"         => "Float64"
    case "bool"          => "UInt8"
    case "from_datetime" => "DateTime"
    case "to_array"      => "Array(String)"
    case "list_str"      => "Array(String)"
    case "list_int"      => "Array(Int64)"
    case "decode_json"   => "Map(String, String)"
    case other => throw new IllegalArgumentException(
      s"no ClickHouse type mapping for cast tag '$other'; declare ch_type")
  }

  /** Emit the base `CREATE TABLE` in the reference's hand-written shape
    * (tables/test.yaml:2-16): 4-space column indent, backticked names
    * padded to the widest + 4, 6-space engine-clause continuation lines.
    *
    * @param orderBy physical ordering key; defaults to the logical
    *                primary keys when empty. `PRIMARY KEY` prints the
    *                same list (see the shape notes above).
    */
  def createTable(
      cfg: TableConfig,
      db: Option[String] = None,
      orderBy: Seq[String] = Nil,
      indexGranularity: Option[Long] = None): String = {
    val qualified = db.map(_ + ".").getOrElse("") + cfg.name
    val cols = orderedColumns(cfg)
    val keys = if (orderBy.nonEmpty) orderBy else cfg.primaryKeys
    require(keys.nonEmpty,
      s"table ${cfg.name}: ReplacingMergeTree requires an ordering key " +
        "(declare schema.primary_key or pass orderBy)")
    val keyList = keys.mkString("(", ", ", ")")
    val tail =
      Seq(s"PRIMARY KEY $keyList", s"ORDER BY $keyList") ++
        indexGranularity.map(g => s"SETTINGS index_granularity = $g")
    s"""CREATE TABLE $qualified
       |(
       |${columnBlock(cols)}
       |) ENGINE = ReplacingMergeTree(${cfg.versionColumn})
       |""".stripMargin + tail.map("      " + _).mkString("\n")
  }

  /** Emit the Buffer front table the reference generates at runtime
    * (helper.py:97-122): same column block, `_Buffer` suffix, engine
    * `Buffer(db, table, <the seven knobs>)`, no ordering clauses (the
    * Buffer engine flushes into the base table, which owns layout).
    * The reference always works db-qualified here (it reads
    * `system.tables` by database), so `db` is required.
    */
  def bufferTable(cfg: TableConfig, db: String, buffer: BufferSpec): String = {
    val cols = orderedColumns(cfg)
    s"""CREATE TABLE $db.${cfg.name}_Buffer
       |(
       |${columnBlock(cols)}
       |) ENGINE = Buffer($db, ${cfg.name}, ${buffer.numLayers}, ${buffer.minTime}, ${buffer.maxTime}, ${buffer.minRows}, ${buffer.maxRows}, ${buffer.minBytes}, ${buffer.maxBytes})""".stripMargin
  }

  /** (name, ch-type) pairs in the metadata-tail order described above. */
  private def orderedColumns(cfg: TableConfig): Seq[(String, String)] = {
    val (meta, regular) = cfg.columns.partition(_.name.startsWith("_"))
    regular.map(c => c.name -> chType(c)) ++
      Seq(cfg.versionColumn -> "UInt64") ++
      meta.map(c => c.name -> chType(c)) ++
      Seq(cfg.deletedColumn -> "UInt8")
  }

  private def columnBlock(cols: Seq[(String, String)]): String = {
    val width = cols.map(_._1.length + 2).max + 4
    cols.zipWithIndex.map { case ((name, typ), i) =>
      val comma = if (i == cols.length - 1) "" else ","
      "    " + s"`$name`".padTo(width, ' ') + typ + comma
    }.mkString("\n")
  }
}
