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

  /** The widest of two column types under the safe ladder; identical
    * types pass through (any type, including nested), numeric pairs
    * widen, anything else is a REAL conflict and fails loudly — silently
    * stringifying a conflicted column would corrupt every reader.
    */
  def widen(a: DataType, b: DataType): DataType =
    if (a == b) a
    else if (integralLadder.contains(a) && integralLadder.contains(b)) {
      if (integralLadder.indexOf(a) >= integralLadder.indexOf(b)) a else b
    } else if (fractionalLadder.contains(a) && fractionalLadder.contains(b)) {
      if (fractionalLadder.indexOf(a) >= fractionalLadder.indexOf(b)) a else b
    } else if (numeric(a) && numeric(b)) {
      DoubleType // mixed integral/fractional: the standard (documented) trade
    } else {
      throw new IllegalArgumentException(
        s"schema evolution cannot reconcile column types $a and $b — " +
          "only numeric widening and exact matches are safe; a genuine " +
          "type conflict needs an explicit transform, not a silent guess")
    }

  /** Union `gens` under the unified (widest, by-name) schema. Column
    * order is first-seen across the generations in the given order.
    */
  def unionEvolved(gens: Seq[DataFrame]): DataFrame = {
    require(gens.nonEmpty, "unionEvolved needs at least one generation")
    val unified = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    gens.foreach(_.schema.fields.foreach { f =>
      unified(f.name) =
        unified.get(f.name).map(widen(_, f.dataType)).getOrElse(f.dataType)
    })
    gens.map { g =>
      val have = g.schema.fields.map(f => f.name -> f.dataType).toMap
      g.select(unified.toSeq.map { case (n, t) =>
        have.get(n) match {
          case Some(dt) if dt == t => col(n)
          case Some(_)             => col(n).cast(t).as(n)
          case None                => lit(null).cast(t).as(n)
        }
      }: _*)
    }.reduce(_.unionByName(_))
  }
}
