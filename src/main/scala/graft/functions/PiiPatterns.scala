package graft.functions

/** PII detection patterns, shared by the standalone scrub (d13) and the
  * end-to-end pipeline (p5) so the composed pipeline can never drift from
  * the stage it claims to compose. Patterns stay inside the regex subset
  * where Java (Spark) and RE2 (DuckDB) agree — character classes, bounded
  * repetition, no backreferences or lookaround — and each constant is
  * interpolated verbatim into BOTH the Catalyst expression and the oracle
  * SQL string (the rendered literal contains a single backslash, which is
  * what DuckDB's single-quoted regex literal expects).
  */
object PiiPatterns {
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Phone = "555-[0-9]{4}"
}
