package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic one-decade-larger `documents` corpus for the
  * TWO-decade scaling gate (VERDICT r11 #1 / r12 #1): the driver's
  * fixtures stop at sf0.1 (5,000 docs), so the widest-exchange slope
  * gates in [[ScalingSpec]] could only measure ONE decade
  * (sf0.01 → sf0.1) — a pair expansion quietly quadratic with a small
  * constant can hide inside a 10× window and only show at 100×. This
  * generator produces the third point: a 50,000-doc corpus with the
  * SAME statistical shape as the driver fixtures (measured from
  * `/root/testdata/sf0.1/documents.parquet`, seed-stamped, committed
  * code — NOT a driver fixture and never used by the oracle gate):
  *
  *  - 30-word uniform vocabulary (the fixture's vocab minus its
  *    planted `dup` marker), token count U[10, 100] per doc;
  *  - lang marginals en .41 / zh .15 / es .15 / fr .15 / de .14,
  *    source = src{doc_id % 20}, n_chars = length(text) — the driver
  *    generator's exact formulas where observable;
  *  - 5% of docs REPLACED by a near-duplicate: a uniformly chosen
  *    partner's base text with " dup" appended at the end (the
  *    fixture's planting mechanism: 250/5000 docs at sf0.1 carry a
  *    trailing `dup` token and 243 strip-match another doc verbatim;
  *    exact-dup collisions arise when two dups pick one partner,
  *    ~k²/2n of them — 8 observed at sf0.1 vs 6.25 expected);
  *  - doc_id dense 0..n-1 (the FixtureCanarySpec invariant d37's
  *    prefix arithmetic depends on).
  *
  * Generation is Spark-native and hash-derived (xxhash64 of
  * (doc_id, salt, seed) — codegen'd, no driver-side loops, no RNG
  * state), so the corpus is bit-reproducible on any executor count:
  * exactly how a 100 TB synthetic corpus would be minted. Built once
  * under target/ and keyed by (n, seed) in the path; reruns reuse it.
  */
object ScalingCorpus {

  val Seed = 77L

  /** Per-FAMILY generator versions: each cached corpus is keyed by
    * (n, seed, its family's version) — without the bump, an edited
    * generator silently reuses the previous run's parquet and the gate
    * measures the wrong data; with a SHARED version, bumping one
    * family would needlessly regenerate the others' (large) corpora.
    * Bump the matching constant on ANY change to its generator:
    *  - [[GenVersion]] → [[docsFrame]] (vocab, marginals, dup plant) —
    *    AND the skew corpus inherits it, since [[skewedDocsFrame]]
    *    derives from docsFrame's output;
    *  - [[SkewGenVersion]] → [[skewedDocsFrame]]'s own overrides
    *    (hot-source share, hot-cluster rate/seed);
    *  - [[EmbGenVersion]] → [[embFrame]];
    *  - [[EventsGenVersion]] → [[eventsFrame]].
    */
  val GenVersion = 1
  val SkewGenVersion = 1
  val EmbGenVersion = 1
  val EventsGenVersion = 1

  /** The driver fixture's 30-word content vocabulary (sorted; its
    * 31st token `dup` is the near-dup marker, appended not sampled). */
  private val Vocab = Seq("a", "agg", "batch", "big", "column",
    "customer", "data", "fast", "filter", "group", "hash", "join",
    "key", "line", "merge", "order", "part", "query", "row", "scan",
    "slow", "small", "sort", "spark", "stream", "table", "the",
    "value", "vector", "window")

  private def h(salt: String, cols: Column*): Column =
    xxhash64(cols :+ lit(salt) :+ lit(Seed): _*)

  /** Build (or reuse) the n-doc corpus; returns the dir Tables.load
    * can read (`<dir>/documents.parquet`). */
  def ensure(spark: SparkSession, n: Long): String = {
    val dir = new java.io.File(
        s"target/scaling_corpus/n${n}_seed${Seed}_v$GenVersion")
      .getAbsolutePath
    val out = s"$dir/documents.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
      docsFrame(spark, n)
        // a handful of even splits: enough write parallelism for 50k
        // rows, few enough files that the downstream scans get real
        // row groups (the fixture itself is one file)
        .repartition(8)
        .write.mode("overwrite").parquet(out)
    }
    dir
  }

  /** Build (or reuse) an n-vector embeddings table with the driver
    * fixture's measured shape (`/root/testdata/sf0.1/embeddings.parquet`):
    * unit-norm 64-dim float vectors with NO cluster structure (within-
    * label mean cosine ≈ cross-label ≈ 0 in the fixture — the vectors
    * are isotropic; v5/v14 plant their own near-dups query-side via
    * cloneAugmented), label = uniform 0..9, vec_id dense 0..n-1 (under
    * the 1e6 id-headroom guard the clone-augmenting queries require).
    * Components are Box–Muller gaussians from xxhash64-derived uniforms,
    * normalized — rotation-invariant like the fixture, hash-derived like
    * [[docsFrame]], bit-reproducible at any executor count. (ln/cos here
    * are engine-internal only: no oracle ever reads this corpus, so the
    * cross-libm ULP concern that bans them from query scoring paths does
    * not apply.)
    */
  def ensureEmbeddings(spark: SparkSession, n: Long): String = {
    require(n < 1000000L, s"vec_id headroom: n=$n must stay below 1e6")
    val dir = new java.io.File(
        s"target/scaling_corpus/emb_n${n}_seed${Seed}_v$EmbGenVersion")
      .getAbsolutePath
    val out = s"$dir/embeddings.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
      embFrame(spark, n).repartition(8).write.mode("overwrite").parquet(out)
    }
    dir
  }

  private[graft] def embFrame(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    def unif(salt: String, i: Column): Column =
      (pmod(h(salt, id, i), lit(1000000000L)).cast("double") + lit(0.5)) / lit(1e9)
    val z = transform(sequence(lit(1), lit(64)), i =>
      sqrt(lit(-2.0) * log(unif("g1", i))) * cos(lit(2.0 * math.Pi) * unif("g2", i)))
    spark.range(n).select(
        id.as("vec_id"),
        z.as("raw"),
        pmod(h("lab", id), lit(10)).cast("int").as("label"))
      .withColumn("nrm", sqrt(aggregate(col("raw"), lit(0.0), (a, x) => a + x * x)))
      .select(col("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast("float")).as("embedding"),
        col("label"))
  }

  /** Build (or reuse) an n-event `events` table with the driver
    * fixture's measured shape (`/root/testdata/sf0.1/events.parquet`):
    * event_id dense 0..n-1 with ts near-monotone over the fixture's
    * 30-day window (each event jittered inside its own time slot, so
    * order and density match without a global sort); user_id uniform
    * over 15n/1000 users (the fixture's exact events-per-user density,
    * ~66.7 at every SF — per-user activity stays FIXED as the corpus
    * grows, which is what makes session/funnel exchanges corpus-linear
    * rather than per-user-quadratic); event_type uniform over the
    * fixture's five; value ~ Exp(mean 50) rounded to cents (fixture:
    * avg 49.87, max 560 ≈ 50·ln n); props the fixture's `{"k": 0..99}`
    * JSON. Hash-derived like [[docsFrame]], bit-reproducible at any
    * executor count. (ln here is engine-internal only: no oracle ever
    * reads this corpus — same caveat as [[ensureEmbeddings]].)
    */
  def ensureEvents(spark: SparkSession, n: Long): String = {
    val dir = new java.io.File(
        s"target/scaling_corpus/events_n${n}_seed${Seed}_v$EventsGenVersion")
      .getAbsolutePath
    val out = s"$dir/events.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
      eventsFrame(spark, n).repartition(8).write.mode("overwrite").parquet(out)
    }
    dir
  }

  private[graft] def eventsFrame(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    val users = math.max(1L, 15L * n / 1000L)
    val types = array(Seq("signup", "purchase", "view", "click", "error")
      .map(lit): _*)
    val startUs = 1704067200000000L            // 2024-01-01T00:00:00Z
    val slotUs = 30L * 24 * 3600 * 1000000L / n // 30-day fixture window
    def unif(salt: String): Column =
      (pmod(h(salt, id), lit(1000000000L)).cast("double") + lit(0.5)) / lit(1e9)
    spark.range(n).select(
      id.as("event_id"),
      timestamp_micros(
        lit(startUs) + id * lit(slotUs) + pmod(h("jit", id), lit(slotUs)))
        .as("ts"),
      pmod(h("usr", id), lit(users)).as("user_id"),
      element_at(types, pmod(h("typ", id), lit(5)).cast("int") + 1)
        .as("event_type"),
      round(lit(-50.0) * log(unif("val")), 2).as("value"),
      concat(lit("{\"k\": "), pmod(h("prp", id), lit(100)).cast("string"),
        lit("}")).as("props"))
  }

  /** Build (or reuse) the SKEWED n-doc corpus for the per-task gate
    * (VERDICT r13 #1): every other scaling corpus is uniform, so the
    * volume gates measure the friendly case — total exchange rows can
    * stay perfectly linear while ONE task eats a hot bucket's quadratic.
    * Real 100 TB corpora are Zipf in source and near-dup cluster size;
    * this corpus plants the two hot keys that matter:
    *
    *  - ONE HOT SOURCE: ~30% of docs are reassigned source "src0"
    *    (hash-chosen, so the hot slice is spread uniformly over doc_ids
    *    — the skew is in the KEY distribution, not the file layout);
    *  - ONE HOT NEAR-DUP CLUSTER: ~1% of docs are replaced by doc 0's
    *    base text + the fixture's trailing " dup" marker — a single
    *    ~n/100-doc exact-text cluster, which lands in ONE LSH bucket,
    *    ONE simhash band group and ONE text-hash group per query. The
    *    classic hot-bucket quadratic (K² pairs through one task) hides
    *    exactly here.
    *
    * Everything else (vocab, lengths, langs, the scattered 5% dup
    * plant) is [[docsFrame]] verbatim, so uniform-corpus goldens stay
    * comparable.
    */
  def ensureSkewed(spark: SparkSession, n: Long): String = {
    val dir = new java.io.File(
        s"target/scaling_corpus/skew_n${n}_seed${Seed}_v${GenVersion}_$SkewGenVersion")
      .getAbsolutePath
    val out = s"$dir/documents.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
      skewedDocsFrame(spark, n)
        .repartition(8)
        .write.mode("overwrite").parquet(out)
    }
    dir
  }

  /** The embeddings twin of [[ensureSkewed]]: ~1% of vectors replaced
    * by vector 0's EXACT values — one identical-vector cluster, which
    * lands in ONE LSH bucket (and drags its planted clones into the
    * same bucket), the textbook hot-bucket n² for any bucket
    * self-join. Everything else [[embFrame]] verbatim.
    */
  def ensureSkewedEmbeddings(spark: SparkSession, n: Long): String = {
    require(n < 1000000L, s"vec_id headroom: n=$n must stay below 1e6")
    val dir = new java.io.File(
        s"target/scaling_corpus/skewemb_n${n}_seed${Seed}_v${EmbGenVersion}_$SkewGenVersion")
      .getAbsolutePath
    val out = s"$dir/embeddings.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
      val base = embFrame(spark, n)
      val seed0 = base.filter(col("vec_id") === 0)
        .select(col("embedding").as("__hot_vec"))
      val inCluster = pmod(h("hotvec", col("vec_id")), lit(100)) === 7 &&
        col("vec_id") =!= 0
      base.crossJoin(broadcast(seed0))
        .select(col("vec_id"),
          when(inCluster, col("__hot_vec")).otherwise(col("embedding"))
            .as("embedding"),
          col("label"))
        .repartition(8).write.mode("overwrite").parquet(out)
    }
    dir
  }

  private[graft] def skewedDocsFrame(spark: SparkSession, n: Long): DataFrame = {
    val base = docsFrame(spark, n)
    // doc 0's BASE text is the cluster seed; one broadcast row, never a
    // driver-side collect
    val seed0 = base.filter(col("doc_id") === 0)
      .select(col("text").as("__hot_text"))
    val inCluster =
      pmod(h("hotdup", col("doc_id")), lit(100)) === 7 && col("doc_id") =!= 0
    val hotSource = pmod(h("hotsrc", col("doc_id")), lit(100)) < 30
    base.crossJoin(broadcast(seed0))
      .select(
        col("doc_id"),
        when(inCluster, concat(col("__hot_text"), lit(" dup")))
          .otherwise(col("text")).as("text"),
        col("lang"),
        when(hotSource, lit("src0")).otherwise(col("source")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private[graft] def docsFrame(spark: SparkSession, n: Long): DataFrame = {
    val vocabCol = array(Vocab.map(lit): _*)
    val id = col("id")
    val base = spark.range(n).select(
      id.as("doc_id"),
      array_join(
        transform(
          sequence(lit(1), pmod(h("len", id), lit(91)).cast("int") + lit(10)),
          i => element_at(vocabCol, pmod(h("tok", id, i), lit(30)).cast("int") + 1)),
        " ").as("text"))
    // 5% near-dup replacement: partner chosen over the BASE texts (the
    // pre-replacement corpus), so every planted dup strip-matches its
    // partner; the partner lookup is an equi-join on the 5% slice
    // against the base frame — broadcast-sized here, key-partitioned at
    // any scale, never a driver loop
    val flagged = base.withColumn("partner",
      when(pmod(h("dup", col("doc_id")), lit(100)) < 5,
        pmod(h("partner", col("doc_id")), lit(n))))
    val partners = base.select(
      col("doc_id").as("pid"), col("text").as("ptext"))
    val texts = flagged.join(partners, col("partner") === col("pid"), "left")
      .select(col("doc_id"),
        when(col("partner").isNotNull, concat(col("ptext"), lit(" dup")))
          .otherwise(col("text")).as("text"))
    val langPick = pmod(h("lang", col("doc_id")), lit(100))
    texts.select(
      col("doc_id"),
      col("text"),
      when(langPick < 41, "en").when(langPick < 56, "zh")
        .when(langPick < 71, "es").when(langPick < 86, "fr")
        .otherwise("de").as("lang"),
      concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string"))
        .as("source"),
      length(col("text")).cast("long").as("n_chars"))
  }
}
