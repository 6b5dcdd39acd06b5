package graft.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One target column of a replicated table.
  *
  * Mirrors the reference's per-column YAML schema block
  * (reference: tables/test.yaml:30-57, readme.md:115-142):
  *   - `types`: ordered cast-fallback chain — first cast that succeeds wins
  *     (reference: replication/consumer/transformer.py:84-92).
  *   - `ref`: source document field when it differs from the column name
  *     (reference: replication/consumer/transformer.py:67).
  *   - `default`: applied when the source field is missing/null and the
  *     column is not required (reference: transformer.py:72-77).
  *   - `required`: missing value rejects the whole row
  *     (reference: transformer.py:78-79).
  *   - `primaryKey`: missing value rejects the whole row
  *     (reference: transformer.py:70-71).
  *   - `chType`: the target engine's column type for DDL generation — the
  *     reference reads it only for the primary key
  *     (replication/schema/helper.py:79-86).
  */
final case class ColumnSpec(
    name: String,
    types: Seq[String],
    ref: Option[String] = None,
    default: Option[Any] = None,
    required: Boolean = false,
    primaryKey: Boolean = false,
    chType: Option[String] = None) {
  def sourceField: String = ref.getOrElse(name)
}

/** Declarative table spec: the engine's equivalent of one `tables/<name>.yaml`
  * entry in the reference (reference: replication/schema/helper.py:13-38).
  * Pure metadata — the executable form is built by
  * [[graft.operators.SchemaTransform]] as Catalyst column expressions, so
  * the whole per-row transform loop of the reference
  * (replication/consumer/transformer.py:63-96) becomes one codegen'd
  * `select`.
  */
final case class TableConfig(
    name: String,
    columns: Seq[ColumnSpec],
    versionColumn: String = "_ver",
    deletedColumn: String = "_deleted") {

  require(columns.nonEmpty, s"table $name has no columns")

  def primaryKeys: Seq[String] = columns.filter(_.primaryKey).map(_.name)

  /** DDL type of the (first) primary key — reference
    * `get_type_of_primary_key` (replication/schema/helper.py:79-86).
    */
  def primaryKeyChType: Option[String] =
    columns.find(_.primaryKey).flatMap(_.chType)

  /** Target schema (all columns nullable — constraint enforcement happens in
    * SchemaTransform's validity predicate, not the storage schema).
    */
  def structType: StructType =
    StructType(columns.map(c => StructField(c.name, CastRegistry.sparkType(c.types.last))))
}

/** Named cast registry with ordered multi-type fallback.
  *
  * Reference: replication/consumer/transformer.py:99-108 (`cast_dict`) plus
  * the custom-transformer plugin dict (transformer.py:8-11,107;
  * tables/transform.py:1-8). Re-expressed as `Column => Column` builders so
  * Catalyst code-generates the transform; a failed cast yields NULL
  * (`try_cast`) and SchemaTransform turns source-present-but-null-result
  * into a row-level error — the expression-level equivalent of the
  * reference's per-row exception routing (loader.py:40-49).
  *
  * Scale note: everything here stays inside whole-stage codegen — no Scala
  * UDFs, no per-row closures — so the transform runs at scan speed on a
  * 1000-executor cluster.
  */
object CastRegistry {
  type Caster = Column => Column

  /** Spark type produced by each named cast (for schema derivation). */
  def sparkType(tag: String): DataType = tag match {
    case "str"           => StringType
    case "int"           => LongType
    case "float"         => DoubleType
    case "bool"          => BooleanType
    case "from_datetime" => TimestampType
    case "list_str"      => ArrayType(StringType)
    case "list_int"      => ArrayType(LongType)
    case "to_array"      => ArrayType(StringType)
    case "decode_json"   => MapType(StringType, StringType)
    case other           => custom.get(other).map(_._2).getOrElse(
      throw new IllegalArgumentException(s"unknown cast tag: $other"))
  }

  /** Custom transformer plugins: name -> (caster, resultType).
    * `to_array` ships as the reference's example custom transformer
    * (tables/transform.py:1-8: assert str, strip, split on ',').
    */
  val custom: Map[String, (Caster, DataType)] = Map(
    "to_array" -> ((c: Column) => split(trim(c.cast(StringType)), ","), ArrayType(StringType))
  )

  /** Build the cast expression for one tag. Uses try_cast so invalid input
    * becomes NULL instead of failing the task (ANSI-safe at scale).
    */
  def caster(tag: String): Caster = tag match {
    case "str"           => _.cast(StringType)
    case "int"           => _.try_cast(LongType)
    case "float"         => _.try_cast(DoubleType)
    case "bool"          => _.try_cast(BooleanType)
    case "from_datetime" => c => try_to_timestamp(c.cast(StringType))
    case "list_str"      => c => transform(c, x => x.cast(StringType))
    case "list_int"      => c => transform(c, x => x.try_cast(LongType))
    case "decode_json"   => c => from_json(c.cast(StringType), MapType(StringType, StringType))
    case other           => custom.get(other).map(_._1).getOrElse(
      throw new IllegalArgumentException(s"unknown cast tag: $other"))
  }

  /** Ordered multi-type fallback: first cast producing a non-null value wins
    * (reference: transformer.py:84-92 — casters tried in order until one
    * succeeds). Compiles to a `coalesce(try_cast, try_cast, ...)` chain.
    * The column's storage type is the LAST tag's (the permissive fallback);
    * every branch is try_cast to it so ANSI coercion cannot throw.
    */
  def chain(tags: Seq[String])(c: Column): Column =
    if (tags.size == 1) caster(tags.head)(c)
    else {
      val target = sparkType(tags.last)
      coalesce(tags.map(t => caster(t)(c).try_cast(target)): _*)
    }
}
