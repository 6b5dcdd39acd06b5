package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashes shared by the dedup/similarity operators.
  *
  * The engine needs a 64-bit hash that (a) stays inside whole-stage codegen
  * and (b) is reproducible in external systems for cross-checking (the
  * DuckDB oracle, or a ClickHouse reader downstream). Spark's murmur
  * `hash()`/`xxhash64()` are Spark-private algorithms, so we derive the
  * hash from MD5 instead: `md5NumberLower` mirrors DuckDB's
  * `md5_number_lower` (bytes 8..15 of the digest, little-endian, as a
  * signed 64-bit integer).
  */
object HashFunctions {

  /** Signed 64-bit integer from bytes 8..15 (little-endian) of md5(c) —
    * bit-compatible with DuckDB's `CAST(md5_number_lower(x) AS BIGINT)`.
    * Pure expression: md5 + substring shuffles + conv, all codegen'd.
    *
    * This is the REFERENCE form, spec-pinned against the driver-side
    * twin ([[md5NumberLowerLocal]]) and the DuckDB semantics; queries on
    * hot paths use [[md5NumberBigEndian]] (one md5 subtree) or fold the
    * hash at plan time via the local twin. NOTE the byte-swap references
    * the md5 subtree once per byte — codegen's subexpression
    * elimination collapses that, but an interpreted lambda context
    * would re-evaluate it, so don't embed THIS form in higher-order
    * functions.
    */
  def md5NumberLower(c: Column): Column = {
    // hex chars 17..32 are bytes 8..15; parse big-endian, then
    // byte-swap with long ops
    val be = conv(substring(md5(c), 17, 16), 16, -10).cast("long")
    (0 until 8)
      .map(i => shiftleft(shiftrightunsigned(be, 56 - 8 * i).bitwiseAND(lit(0xffL)), 8 * i))
      .reduce(_ bitwiseOR _)
  }

  /** Driver-side twin of [[md5NumberLower]] for constant folding (e.g.
    * LSH plane weights computed at plan time).
    */
  def md5NumberLowerLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (0 until 8).foldLeft(0L)((acc, i) => acc | ((d(8 + i) & 0xffL) << (8 * i)))
  }

  /** Signed 64-bit integer from bytes 8..15 of md5(c) read BIG-endian —
    * the native [[Md5Long]] expression (digest bytes folded in place, no
    * hex round-trip; value-identical to the composed
    * `conv(substring(md5(c),17,16),16,-10)` form, FunctionsSpec-pinned).
    * Preferred for hash families evaluated once per shingle/frame/gram
    * (the near-dup family's base hash). DuckDB replays it as
    * CAST('0x' || substring(md5(x),17,16) AS UBIGINT) two's-complement
    * mapped to BIGINT.
    */
  def md5NumberBigEndian(c: Column): Column = Md5Long(c)

  /** The engine's ONE train/val/test split rule (80/10/10 by the first
    * 8 md5 hex chars of the id, mod 100): p2 assigns with it, d40
    * audits leakage across it, p23 decontaminates within it. A retune
    * (ratios or hash prefix) lands here and nowhere else — a local
    * copy drifting from the split in force would make the audits
    * silently audit the wrong split (r12 review).
    */
  def splitOf(id: Column): Column = {
    val bucket = org.apache.spark.sql.functions
      .conv(org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    // null id -> null split (no otherwise): an `otherwise("test")` would
    // sweep every null-id row into the test partition — silently
    // inflating/contaminating the most sensitive split with exactly the
    // rows whose identity is broken. (The DuckDB oracle twins spell the
    // rule as CASE ... ELSE 'test' over table-key/join-key columns,
    // which are non-null by construction there, so the two engines
    // agree on every reachable input.)
    org.apache.spark.sql.functions.when(bucket < 80, "train")
      .when(bucket < 90, "val").when(bucket.isNotNull, "test")
  }

  /** Driver-side twin of [[md5NumberBigEndian]]. */
  def md5NumberBigEndianLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (8 until 16).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
  }

  /** Family of 64-bit hash functions indexed by seed (for MinHash):
    * h_i(x) = md5NumberBigEndian(i || ':' || x).
    */
  def seededHash(seed: Column, c: Column): Column =
    md5NumberBigEndian(concat(seed.cast("string"), lit(":"), c))

  /** Stable document fingerprint: md5 of whitespace-normalized, lowercased
    * text (the engine's exact-dedup key).
    */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")))
}
