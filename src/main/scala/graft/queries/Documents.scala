package graft.queries

import graft.Tables
import graft.functions.{HashFunctions => H, TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents`: exact dedup,
  * n-gram-Jaccard near-dup, MinHash+LSH near-dup, SimHash, text quality,
  * token stats, language ID, fingerprinting.
  *
  * Scale tiers (100 TB):
  *  - exact dedup and fingerprints are a single hash-shuffle;
  *  - n-gram Jaccard self-joins on the shingle — exact but quadratic on
  *    hot shingles (correctness tier; fine to SF~1);
  *  - MinHash+LSH is the scale path: fixed 16-hash signature per doc, one
  *    shuffle per band on (band, signature) — candidate generation is
  *    linear in docs, independent of pairwise similarity structure;
  *  - SimHash gives constant-size sketches for hamming-distance dedup.
  * All hashes are md5-derived (see HashFunctions) so the DuckDB oracle
  * replays them bit-for-bit.
  */
object Documents {

  type Q = (SparkSession, String) => DataFrame

  private val NumHashes = 16
  private val BandSize = 4 // 4 bands x 4 rows

  /** DuckDB SQL for md5_number_lower reinterpreted as SIGNED int64 (the
    * plain CAST range-checks instead of wrapping two's-complement).
    */
  private def signedMd5Sql(arg: String): String =
    s"""CAST(CAST(md5_number_lower($arg) AS HUGEINT) -
       | CASE WHEN md5_number_lower($arg) >= 9223372036854775808
       |      THEN 18446744073709551616 ELSE 0 END AS BIGINT)""".stripMargin

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** Exact dedup over a deterministically duplicated corpus (the fixture
    * has no exact dups, so union a shifted copy — dedup then provably
    * collapses 2 copies to the min-id keeper).
    */
  def d1ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    val copy = d.select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    d.unionByName(copy)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))
      .orderBy(col("keeper_id"))
  }

  val d1Sql: String =
    """SELECT md5(text) AS content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_id
      |FROM (SELECT doc_id, text FROM documents
      |      UNION ALL SELECT doc_id + 1000000, text FROM documents)
      |GROUP BY 1 ORDER BY keeper_id""".stripMargin

  /** Token statistics per language: docs, tokens (whitespace + regex
    * tokenizers), chars.
    */
  def d2TokenStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), col("n_chars"),
        size(T.tokens(col("text"))).cast("long").as("n_tok"),
        size(T.tokensRegex(col("text"))).cast("long").as("n_tok_re"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(col("n_tok_re")).as("total_tokens_regex"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))

  val d2Sql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS total_tokens_regex,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Per-document quality features: token count, lexical diversity,
    * stopword ratio, mean token length — the standard pre-training
    * quality-filter feature set. Pure arithmetic on exact ints, so the
    * doubles are bit-identical to the oracle's.
    */
  def d3QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val w = T.tokens(col("text"))
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(w).cast("long").as("n_tokens"),
        T.lexicalDiversity(w).as("lex_diversity"),
        T.stopwordRatio(w).as("stopword_ratio"),
        T.meanTokenLength(w).as("mean_tok_len"))
      .filter(col("n_tokens") >= 40 && col("lex_diversity") > 0.3)
      .orderBy(col("doc_id"))
  }

  val d3Sql: String =
    """SELECT doc_id,
      |  len(w) AS n_tokens,
      |  len(list_distinct(w)) / CAST(len(w) AS DOUBLE) AS lex_diversity,
      |  len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) / CAST(len(w) AS DOUBLE) AS stopword_ratio,
      |  list_sum(list_transform(w, x -> CAST(length(x) AS BIGINT))) / CAST(len(w) AS DOUBLE) AS mean_tok_len
      |FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
      |WHERE len(w) >= 40 AND len(list_distinct(w)) / CAST(len(w) AS DOUBLE) > 0.3
      |ORDER BY doc_id""".stripMargin

  /** Normalized-content fingerprint (rolling-hash stand-in): stable dedup
    * key for near-identical whitespace/case variants.
    */
  def d4Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), H.fingerprint(col("text")).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))
      .orderBy(col("keeper_id"))

  val d4Sql: String =
    """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
      |  COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
      |FROM documents GROUP BY 1 ORDER BY keeper_id""".stripMargin

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.8) via shingle
    * self-join. Correctness tier: exact but join-heavy; the LSH variant
    * below is the 100 TB path.
    */
  def d5NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = docs(spark, dir)
      .select(col("doc_id"), explode(T.shingles(T.tokens(col("text")), 3)).as("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val inter = a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        (col("inter") * lit(1.0) / (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("da"), col("db"))
  }

  val d5Sql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') w FROM documents),
      |       (SELECT unnest(generate_series(1, 100000)) i)
      |  WHERE i <= len(w) - 2),
      |sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT da, db, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
      |FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |ORDER BY da, db""".stripMargin

  /** MinHash signatures (16 md5-seeded hashes over 3-shingles). */
  private def minhashes(spark: SparkSession, dir: String): DataFrame = {
    val sh = docs(spark, dir)
      .select(col("doc_id"), explode(T.shingles(T.tokens(col("text")), 3)).as("s"))
    val seeds = explode(sequence(lit(0), lit(NumHashes - 1))).as("i")
    sh.select(col("doc_id"), col("s"), seeds)
      .groupBy(col("doc_id"), col("i"))
      .agg(min(H.seededHash(col("i"), col("s"))).as("m"))
  }

  /** MinHash + LSH near-dup detection, the scale path: constant-size
    * signature per doc, band-bucket join for candidates (no pairwise
    * work), then signature-overlap estimate >= 0.5. Bit-reproduced by the
    * oracle via DuckDB's md5_number_lower.
    */
  def d6MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val mh = minhashes(spark, dir)
    // order within band must be deterministic: sort the i:m pairs
    val bandSig = mh
      .withColumn("band", (col("i") / lit(BandSize)).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(array_sort(collect_list(
        concat(lpad(col("i").cast("string"), 2, "0"), lit(":"), col("m").cast("string")))), ",").as("sig"))
    val cand = bandSig.as("x").join(bandSig.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db")).distinct()
    val est = cand
      .join(mh.as("ma"), col("da") === col("ma.doc_id"))
      .join(mh.as("mb"), col("db") === col("mb.doc_id") && col("ma.i") === col("mb.i"))
      .groupBy(col("da"), col("db"))
      .agg((sum(when(col("ma.m") === col("mb.m"), 1).otherwise(0)) / lit(NumHashes.toDouble))
        .as("est_jaccard"))
    est.filter(col("est_jaccard") >= 0.5).orderBy(col("da"), col("db"))
  }

  val d6Sql: String =
    s"""WITH sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') w FROM documents),
      |       (SELECT unnest(generate_series(1, 100000)) i)
      |  WHERE i <= len(w) - 2),
      |mh AS (
      |  SELECT doc_id, i,
      |    MIN(${signedMd5Sql("CAST(i AS VARCHAR) || ':' || s")}) m
      |  FROM sh, (SELECT unnest(generate_series(0, ${NumHashes - 1})) i)
      |  GROUP BY doc_id, i),
      |bs AS (
      |  SELECT doc_id, CAST(i / $BandSize AS INT) band,
      |    string_agg(lpad(CAST(i AS VARCHAR), 2, '0') || ':' || CAST(m AS VARCHAR), ',' ORDER BY i) sig
      |  FROM mh GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT x.doc_id da, y.doc_id db
      |  FROM bs x JOIN bs y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
      |est AS (
      |  SELECT da, db,
      |    SUM(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) / ${NumHashes.toDouble} est_jaccard
      |  FROM cand JOIN mh ma ON da = ma.doc_id JOIN mh mb ON db = mb.doc_id AND ma.i = mb.i
      |  GROUP BY da, db)
      |SELECT da, db, est_jaccard FROM est WHERE est_jaccard >= 0.5 ORDER BY da, db""".stripMargin

  /** SimHash sketches (48-bit to stay in positive int64) + near-dup pairs
    * at hamming distance <= 3. Sketch build is one pass; the pair scan
    * here is all-pairs (oracle tier) — at scale you band the simhash
    * exactly like LSH.
    */
  def d7Simhash(spark: SparkSession, dir: String): DataFrame = {
    val words = docs(spark, dir)
      .select(col("doc_id"), explode(array_distinct(T.tokens(col("text")))).as("w"))
      .withColumn("h", H.md5NumberLower(col("w")))
    val bits = words
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(47))).as("j"))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(when(expr("(shiftright(h, j) & 1) = 1"), 1).otherwise(-1)).as("score"))
    val sketch = bits
      .groupBy(col("doc_id"))
      .agg(sum(when(col("score") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L))
        .as("simhash"))
    sketch.as("a").join(sketch.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy(col("da"), col("db"))
  }

  val d7Sql: String =
    s"""WITH words AS (
      |  SELECT DISTINCT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) w FROM documents)),
      |hw AS (SELECT doc_id, ${signedMd5Sql("w")} h FROM words),
      |bits AS (
      |  SELECT doc_id, j,
      |    SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) score
      |  FROM hw, (SELECT unnest(generate_series(0, 47)) j)
      |  GROUP BY doc_id, j),
      |sk AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN score > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) simhash
      |  FROM bits GROUP BY doc_id)
      |SELECT a.doc_id da, b.doc_id db,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |ORDER BY da, db""".stripMargin

  /** Language-ID heuristic vs the labeled lang column. */
  def d8LangId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), T.langIdHeuristic(T.tokens(col("text"))).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("lang_pred"))

  val d8Sql: String =
    """SELECT lang,
      |  CASE WHEN len(list_filter(string_split(text, ' '),
      |    x -> x IN ('the','a','of','and','to','in','is'))) > 0 THEN 'en' ELSE 'other' END AS lang_pred,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin

  val defs: Map[String, Q] = Map(
    "d1_exact_dedup" -> (d1ExactDedup _),
    "d2_token_stats" -> (d2TokenStats _),
    "d3_quality_score" -> (d3QualityScore _),
    "d4_fingerprint" -> (d4Fingerprint _),
    "d5_ngram_jaccard" -> (d5NgramJaccard _),
    "d6_minhash_lsh" -> (d6MinhashLsh _),
    "d7_simhash" -> (d7Simhash _),
    "d8_langid" -> (d8LangId _))

  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" -> d1Sql,
    "d2_token_stats" -> d2Sql,
    "d3_quality_score" -> d3Sql,
    "d4_fingerprint" -> d4Sql,
    "d5_ngram_jaccard" -> d5Sql,
    "d6_minhash_lsh" -> d6Sql,
    "d7_simhash" -> d7Sql,
    "d8_langid" -> d8Sql)
}
