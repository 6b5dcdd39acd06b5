package graft

import graft.functions.{HashFunctions => H, TextFunctions => T}
import org.apache.spark.sql.functions._

/** Hash/text primitives: cross-checks between the Column expressions,
  * their driver-side twins, and known DuckDB md5_number_lower values.
  */
class FunctionsSpec extends SparkSpec {

  test("md5NumberLower matches the driver-side twin and DuckDB semantics") {
    import spark.implicits._
    val inputs = Seq("", "a", "abc", "0:the quick brown", "plane:7", "é世界")
    val got = inputs.toDF("s")
      .select(H.md5NumberLower(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(got === inputs.map(H.md5NumberLowerLocal))
    // pinned value computed independently with python hashlib:
    // int.from_bytes(md5(b'abc').digest()[8:16], 'little', signed=True)
    assert(H.md5NumberLowerLocal("abc") === 8250560606382298838L)
  }

  test("shingles: guard for short docs, distinct, k-gram content") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "", "x x x x").toDF("t")
      .select(T.shingles(T.tokens(col("t")), 3).as("s"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(
      List("a b c", "b c d"),
      Nil, // 2 tokens -> no shingle (sequence(1,0) would DESCEND without the guard)
      Nil, // "" splits to [""] -> 1 token
      List("x x x"))) // duplicates collapse
  }

  test("seededHash differs by seed, is stable across evaluation") {
    import spark.implicits._
    val df = Seq("shingle one").toDF("s")
      .select(H.seededHash(lit(0), col("s")).as("h0"), H.seededHash(lit(1), col("s")).as("h1"))
    val r = df.collect().head
    assert(r.getLong(0) !== r.getLong(1))
    assert(r.getLong(0) === H.md5NumberBigEndianLocal("0:shingle one"))
  }

  test("md5NumberBigEndian matches its driver-side twin") {
    import spark.implicits._
    val inputs = Seq("", "a", "abc", "0:the quick brown")
    val got = inputs.toDF("s")
      .select(H.md5NumberBigEndian(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(got === inputs.map(H.md5NumberBigEndianLocal))
    // pinned: int.from_bytes(md5(b'abc').digest()[8:16], 'big', signed=True)
    assert(H.md5NumberBigEndianLocal("abc") === -2984127896297046158L)
  }
}
