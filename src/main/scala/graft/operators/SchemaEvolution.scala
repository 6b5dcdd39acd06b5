package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Multi-generation schema unification — the read-side answer to
  * upstream migrations the reference's frozen column configs cannot
  * express (`config/table_config.py` is fixed at deploy time; SURVEY
  * §2.7). r11 proved column ADDITION via Spark's own
  * `unionByName(allowMissingColumns = true)`; the two other real
  * migrations — a column DROPPED upstream, and a type WIDENED upstream
  * (int `amount` becomes double) — need one more primitive, because
  * Spark's union rejects mismatched numeric types and parquet
  * `mergeSchema` likewise fails on int-vs-long conflicts rather than
  * widening.
  *
  * [[unionEvolved]] computes the unified schema by NAME across all
  * generations — first-seen column order, widest type per column under
  * the safe numeric lattice — casts every generation up to it (typed
  * NULLs for columns a generation lacks, exactly r11's rule: absence
  * stays observable, never invented), and unions. The result reads every
  * generation's files with every generation's semantics intact:
  *  - a column only the OLD generation has (dropped upstream) surfaces
  *    as typed NULL on new rows;
  *  - a column only the NEW generation has (added upstream) surfaces as
  *    typed NULL on old rows (r11's case, subsumed);
  *  - a column whose type widened upstream is read at the WIDE type
  *    everywhere, old rows cast up losslessly along the integral /
  *    fractional ladders (mixed integral-vs-fractional widens to
  *    double — lossy above 2^53, the same trade parquet readers and
  *    every SQL engine make, documented here rather than hidden).
  *
  * Scale: the unification is pure projection (casts) — no shuffle, no
  * data movement beyond the per-generation scans the caller already
  * pays; generations at 100 TB are literally disjoint file sets, each
  * read once.
  */
object SchemaEvolution {

  private val integralLadder: Seq[DataType] =
    Seq(ByteType, ShortType, IntegerType, LongType)
  private val fractionalLadder: Seq[DataType] = Seq(FloatType, DoubleType)

  private def numeric(t: DataType): Boolean =
    integralLadder.contains(t) || fractionalLadder.contains(t)

  /** Recursively mark every nesting level nullable: two generations of
    * the SAME logical struct/array/map column routinely differ only in
    * nested nullability flags (literal-built frames infer NOT NULL,
    * parsed data infers nullable) — that is not a type conflict, and
    * the union's result is nullable at every level anyway.
    */
  private def relaxNullability(t: DataType): DataType = t match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = relaxNullability(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(relaxNullability(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(relaxNullability(m.keyType), relaxNullability(m.valueType),
        valueContainsNull = true)
    case other => other
  }

  /** The widest of two column types under the safe ladder; types equal
    * up to (nested) nullability pass through in nullable form (any
    * type, including nested), numeric pairs widen — RECURSIVELY through
    * same-shape nested types (`struct<x:int>` vs `struct<x:double>`,
    * `array<int>` vs `array<double>`, map keys/values) — anything else
    * is a REAL conflict and fails loudly with the nested field path;
    * silently stringifying a conflicted column would corrupt every
    * reader.
    *
    * Struct recursion requires the SAME field names in the SAME order
    * (case-insensitive): Spark's struct cast maps fields POSITIONALLY,
    * so widening across a reorder or a nested add/drop would silently
    * move values between fields — those migrations fail loudly and need
    * an explicit per-generation projection before the union (the
    * top-level by-name machinery of [[unionEvolved]] does not descend
    * into structs by design: a positional cast is the only shape the
    * engine executes without rebuilding the column).
    */
  /** [[widen]] one nesting level down, prefixing any conflict message
    * with where in the nested type it died — a 100-generation union's
    * error must name the field to fix, not just the two leaf types.
    */
  private def widenAt(where: String, a: DataType, b: DataType): DataType =
    try widen(a, b)
    catch { case e: IllegalArgumentException =>
      throw new IllegalArgumentException(s"$where: ${e.getMessage}")
    }

  def widen(a: DataType, b: DataType): DataType =
    if (relaxNullability(a) == relaxNullability(b)) relaxNullability(a)
    else (a, b) match {
      case (sa: StructType, sb: StructType)
          if sa.length == sb.length &&
            sa.fields.map(_.name.toLowerCase(java.util.Locale.ROOT)).toSeq ==
              sb.fields.map(_.name.toLowerCase(java.util.Locale.ROOT)).toSeq =>
        StructType(sa.fields.zip(sb.fields).map { case (fa, fb) =>
          StructField(fa.name,
            widenAt(s"in struct field '${fa.name}'", fa.dataType, fb.dataType),
            nullable = true)
        })
      case (aa: ArrayType, ab: ArrayType) =>
        ArrayType(widenAt("in array element", aa.elementType, ab.elementType),
          containsNull = true)
      case (ma: MapType, mb: MapType) =>
        MapType(widenAt("in map key", ma.keyType, mb.keyType),
          widenAt("in map value", ma.valueType, mb.valueType),
          valueContainsNull = true)
      case _ if integralLadder.contains(a) && integralLadder.contains(b) =>
        if (integralLadder.indexOf(a) >= integralLadder.indexOf(b)) a else b
      case _ if fractionalLadder.contains(a) && fractionalLadder.contains(b) =>
        if (fractionalLadder.indexOf(a) >= fractionalLadder.indexOf(b)) a else b
      case _ if numeric(a) && numeric(b) =>
        DoubleType // mixed integral/fractional: the standard (documented) trade
      case _ =>
        throw new IllegalArgumentException(
          s"schema evolution cannot reconcile column types $a and $b — " +
            "only numeric widening (top-level or through same-shape " +
            "struct/array/map) and exact matches are safe; a struct " +
            "field add/drop/reorder or a genuine type conflict needs an " +
            "explicit transform, not a silent guess")
    }

  /** Union `gens` under the unified (widest, by-name) schema. Column
    * order is first-seen across the generations in the given order.
    * Names match CASE-INSENSITIVELY (Spark's own default resolution):
    * a generation that renamed `Amount` to `amount` is the same column
    * evolving, not two columns — keying by exact case would emit both,
    * with the backfilled twin shadowing the real one under the default
    * resolver. The first-seen spelling wins for the output schema.
    */
  def unionEvolved(gens: Seq[DataFrame]): DataFrame = {
    require(gens.nonEmpty, "unionEvolved needs at least one generation")
    // lowercase key -> (first-seen display name, widest type)
    val unified = scala.collection.mutable.LinkedHashMap.empty[String, (String, DataType)]
    gens.foreach(_.schema.fields.foreach { f =>
      val k = f.name.toLowerCase(java.util.Locale.ROOT)
      unified(k) = unified.get(k) match {
        case Some((display, t)) => (display, widen(t, f.dataType))
        case None                => (f.name, f.dataType)
      }
    })
    gens.map { g =>
      val have = g.schema.fields
        .map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> (f.name, f.dataType))
        .toMap
      g.select(unified.toSeq.map { case (k, (display, t)) =>
        have.get(k) match {
          case Some((n, dt)) if dt == t => col(n).as(display)
          case Some((n, _))             => col(n).cast(t).as(display)
          case None                     => lit(null).cast(t).as(display)
        }
      }: _*)
    }.reduce(_.unionByName(_))
  }
}
