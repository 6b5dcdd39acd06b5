package graft.queries

import graft.Tables
import graft.functions.{HashFunctions => H}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *  - v1: brute-force cosine top-k — the exact baseline. O(Q x N) dot
  *    products via broadcast of the query set; correct at any N but
  *    compute-bound.
  *  - v2: LSH-bucketed ANN — random-hyperplane signatures (md5-derived,
  *    oracle-reproducible) shrink the candidate set to same-bucket
  *    vectors; the scale path (candidate generation is one shuffle on the
  *    bucket key).
  *  - v3: per-label norm statistics (fixed-point across rows).
  *
  * Float-math parity with the oracle: every dot product/norm is a
  * SEQUENTIAL LEFT FOLD over double-widened floats — Spark's `aggregate`
  * and DuckDB's `list_reduce` both fold left, so the doubles come out
  * bit-identical with no decimal detour. Cross-ROW sums (where engines
  * don't share an order) use fixed-point integers instead.
  */
object Vectors {

  type Q = (SparkSession, String) => DataFrame

  private val K = 5
  private val NumPlanes = 12

  /** Sequential-left-fold dot product, as the native codegen'd
    * [[graft.functions.VecDotFold]] expression — same fold order (and so
    * bit-identical doubles) as the lambda formulation
    * `aggregate(zip_with(a,b,*),0d,+)`, but one generated loop per row
    * instead of interpreted per-element lambdas.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VecDotFold.dot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Oracle twin of [[dot]]: products via 1-based index, left fold. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, 64),
       |    i -> $a[i] * $b[i]), (acc, x) -> acc + x)""".stripMargin

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** Brute-force cosine top-k: for each query vector (vec_id < 10), the K
    * nearest neighbors. The tiny query side is broadcast so the candidate
    * scan never shuffles; per-query top-k via window over the Q x N
    * scored set.
    */
  def v1CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cands = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val cos = (dot(col("qe"), col("ce")) /
      (norm(col("qe")) * norm(col("ce")))).as("cosine")
    val scored = broadcast(queries).join(cands, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cos)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("cid"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  val v1Sql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(${dotSql("v", "v")}) nrm FROM e),
      |scored AS (
      |  SELECT q.vec_id qid, c.vec_id cid,
      |    ${dotSql("q.v", "c.v")} / (q.nrm * c.nrm) cosine
      |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
      |ranked AS (
      |  SELECT qid, cid, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) rank
      |  FROM scored)
      |SELECT qid, rank, cid, cosine FROM ranked WHERE rank <= $K
      |ORDER BY qid, rank""".stripMargin

  /** Random-hyperplane LSH signature: bit p = sign of <w_p, x> where
    * w_p[d] = +/-1 from bit d of md5NumberLower("plane:" || p) — the plane
    * hash is folded to literal weights at plan time. The projection is the
    * same sequential double fold on both engines, so bucketing matches
    * bit-for-bit.
    */
  private def lshBucket(v: Column): Column = {
    val bits = (0 until NumPlanes).map { p =>
      val hash = H.md5NumberLowerLocal(s"plane:$p")
      val weights = array((0 until 64).map(d =>
        lit((((hash >> d) & 1L) * 2 - 1).toDouble)): _*)
      val proj = graft.functions.VecDotFold.dot(v, weights)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via LSH buckets: same-bucket candidates only, cosine top-3 within
    * the bucket. Trades recall for a candidate set ~N/2^planes per query.
    *
    * The fixture's random vectors are mutually near-orthogonal, so no two
    * ever shared a 12-plane bucket and the query returned (correctly but
    * vacuously) zero rows. As d1/v5 do, plant a near-duplicate clone of
    * every vector (first component scaled, arithmetic in DOUBLE so the
    * oracle replays it): clones land in their original's bucket, so every
    * query provably retrieves neighbors through the ANN path. At real
    * scale the corpus itself provides the bucket mates.
    */
  def v2LshAnn(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val clone = base.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("v"), (x, i) => when(i === 0, x * 1.05).otherwise(x)).as("v"))
    val e = base.unionByName(clone).withColumn("bucket", lshBucket(col("v")))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qe"), col("bucket"))
    val cands = e.select(col("vec_id").as("cid"), col("v").as("ce"), col("bucket"))
    val cos = (dot(col("qe"), col("ce")) /
      (norm(col("qe")) * norm(col("ce")))).as("cosine")
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    broadcast(queries).join(cands, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("cid"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  val v2Sql: String = {
    val planeSigSql = (0 until NumPlanes).map { p =>
      val h = H.md5NumberLowerLocal(s"plane:$p")
      s"""CASE WHEN list_reduce(list_transform(generate_series(1, 64),
         |  i -> v[i] * ((((CAST($h AS BIGINT)) >> (i - 1)) & 1) * 2 - 1)), (acc, x) -> acc + x) > 0
         |  THEN (CAST(1 AS BIGINT) << $p) ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |e AS (
      |  SELECT vec_id, v FROM base
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    list_transform(generate_series(1, 64),
      |      i -> CASE WHEN i = 1 THEN v[1] * 1.05 ELSE v[i] END)
      |  FROM base),
      |b AS (SELECT vec_id, v, $planeSigSql AS bucket FROM e),
      |n AS (SELECT vec_id, v, bucket, sqrt(${dotSql("v", "v")}) nrm FROM b),
      |scored AS (
      |  SELECT q.vec_id qid, c.vec_id cid,
      |    ${dotSql("q.v", "c.v")} / (q.nrm * c.nrm) cosine
      |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
      |ranked AS (
      |  SELECT qid, cid, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) rank
      |  FROM scored)
      |SELECT qid, rank, cid, cosine FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin
  }

  /** Per-label embedding-norm statistics. Cross-row sums have no shared
    * fold order between engines, so the sum is nano-fixed-point (exact
    * integer arithmetic both sides).
    */
  def v3LabelNorms(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("label"), norm(col("embedding")).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("nrm") * lit(1e9)).cast("long")).as("sum_norm_e9"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
      .orderBy(col("label"))

  val v3Sql: String =
    s"""WITH n AS (SELECT label, sqrt(${dotSql("v", "v")}) nrm
      |  FROM (SELECT label, CAST(embedding AS DOUBLE[]) v FROM embeddings))
      |SELECT label, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(nrm * 1e9) AS BIGINT)) AS BIGINT) AS sum_norm_e9,
      |  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
      |FROM n GROUP BY label ORDER BY label""".stripMargin

  /** Embedding-cosine near-duplicate DEDUP (completes the dedup family
    * next to exact/MinHash/SimHash/Jaccard): candidate pairs from shared
    * LSH buckets (random-hyperplane signatures — same-bucket vectors
    * agree on all 12 plane signs), then the exact cosine filter at 0.9.
    * The self-join is on the bucket key, so candidate generation is one
    * doc-count shuffle, not a cross join; recall follows the LSH
    * bucketing (near-identical vectors land together).
    */
  def v5EmbeddingNeardup(spark: SparkSession, dir: String): DataFrame = {
    // the fixture vectors are random (max pairwise cosine ~0.5), so — as
    // d1 does for exact dedup — plant near-duplicates: a clone of every
    // vector with its first component scaled. All perturbation happens
    // in DOUBLE (after the cast) so the oracle's arithmetic is
    // bit-identical.
    val base = emb(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val clone = base.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("v"), (x, i) => when(i === 0, x * 1.05).otherwise(x)).as("v"))
    val all = base.unionByName(clone)
      .select(col("vec_id"), col("v"), lshBucket(col("v")).as("bucket"))
    val cos = (dot(col("a.v"), col("b.v")) /
      (norm(col("a.v")) * norm(col("b.v")))).as("cosine")
    all.as("a").join(all.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), cos)
      .filter(col("cosine") >= 0.9)
      .orderBy(col("va"), col("vb"))
  }

  val v5Sql: String = {
    val planeSigSql = (0 until NumPlanes).map { p =>
      val h = H.md5NumberLowerLocal(s"plane:$p")
      s"""CASE WHEN list_reduce(list_transform(generate_series(1, 64),
         |  i -> v[i] * ((((CAST($h AS BIGINT)) >> (i - 1)) & 1) * 2 - 1)), (acc, x) -> acc + x) > 0
         |  THEN (CAST(1 AS BIGINT) << $p) ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |e AS (
      |  SELECT vec_id, v FROM base
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    list_transform(generate_series(1, 64),
      |      i -> CASE WHEN i = 1 THEN v[1] * 1.05 ELSE v[i] END)
      |  FROM base),
      |b AS (SELECT vec_id, v, $planeSigSql AS bucket FROM e),
      |n AS (SELECT vec_id, v, bucket, sqrt(${dotSql("v", "v")}) nrm FROM b)
      |SELECT a.vec_id va, b.vec_id vb,
      |  ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS cosine
      |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |WHERE ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.9
      |ORDER BY va, vb""".stripMargin
  }

  /** Per-label centroid vectors (class centroids — the standard
    * clustering/labeling primitive): posexplode to (label, dim), one
    * hash aggregation, exact nano-fixed-point mean so both engines do
    * pure integer arithmetic (sum of floor(x*1e9), integer-divided by
    * the count). Output long-form (label, dim, centroid_e9) — arrays
    * compare poorly across engines; the long form is also what a
    * downstream ANN index build would consume.
    */
  def v4LabelCentroids(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("label"), posexplode(col("embedding")))
      .filter(col("pos") < 8) // first 8 dims keep the result compact
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
      .agg(sum(floor(col("col").cast("double") * lit(1e9)).cast("long")).as("s"),
        count(lit(1)).as("n"))
      // integer DIV: both engines truncate toward zero (Java / DuckDB //)
      .select(col("label"), col("dim"), expr("s DIV n").as("centroid_e9"))
      .orderBy(col("label"), col("dim"))

  val v4Sql: String =
    """SELECT label, i AS dim,
      |  CAST(SUM(CAST(floor(CAST(v[i] AS DOUBLE) * 1e9) AS BIGINT)) // COUNT(*) AS BIGINT) AS centroid_e9
      |FROM (SELECT label, embedding AS v FROM embeddings),
      |     (SELECT unnest(generate_series(1, 8)) AS i)
      |GROUP BY label, i ORDER BY label, dim""".stripMargin

  /** IVF-Flat ANN: the second scale path next to v2's LSH. A coarse
    * quantizer (per-label centroids, learned from the data itself —
    * nano-fixed-point means so both engines build IDENTICAL centroids)
    * partitions vectors into cells by max-dot assignment; a query probes
    * only its own cell and ranks candidates by exact cosine. The
    * centroid table is 10 rows and broadcast, assignment is a projection
    * + per-vector argmax, candidate generation is one shuffle on the
    * cell id — at 100 TB the cell assignment is the partition key the
    * vector table would be bucketed by, and nprobe>1 is a union over
    * cell ids.
    */
  def v6IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir).select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    // centroids: exact integer mean per (label, dim), then back to double
    val centLong = labelMeans(base)
    val centroids = centLong.groupBy(col("label").as("cell"))
      .agg(sort_array(collect_list(struct(col("dim"), col("ce9")))).as("cs"))
      .select(col("cell"),
        transform(col("cs"), c => c.getField("ce9").cast("double") / 1e9).as("cvec"))
    // cell assignment: argmax dot over the broadcast centroid table
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(dot(col("v"), col("cvec")).desc, col("cell"))
    // lazy localCheckpoint: `assigned` feeds BOTH the query side and the
    // candidate side; without it the scoring+argmax subtree is planned
    // twice (Spark plans are trees, and AQE misses sibling exchange
    // reuse) — one materialization, read twice
    val assigned = base.crossJoin(broadcast(centroids))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cell"))
      .localCheckpoint(false)
    val queries = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qe"), col("cell"))
    val cands = assigned
      .select(col("vec_id").as("cid"), col("v").as("ce"), col("cell"))
    val cos = (dot(col("qe"), col("ce")) /
      (norm(col("qe")) * norm(col("ce")))).as("cosine")
    val wr = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    broadcast(queries).join(cands, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cos)
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("cid"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  val v6Sql: String =
    s"""WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |cl AS (
      |  SELECT label, i AS dim,
      |    CAST(SUM(CAST(floor(v[i] * 1e9) AS BIGINT)) // COUNT(*) AS BIGINT) AS ce9
      |  FROM base, (SELECT unnest(generate_series(1, 64)) i)
      |  GROUP BY label, i),
      |cent AS (
      |  SELECT label AS cell, list(CAST(ce9 AS DOUBLE) / 1e9 ORDER BY dim) AS cvec
      |  FROM cl GROUP BY label),
      |assigned AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT b.vec_id, b.v, c.cell,
      |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
      |        ORDER BY ${dotSql("b.v", "c.cvec")} DESC, c.cell) AS rn
      |    FROM base b, cent c)
      |  WHERE rn = 1),
      |n AS (SELECT vec_id, v, cell, sqrt(${dotSql("v", "v")}) nrm FROM assigned),
      |scored AS (
      |  SELECT q.vec_id qid, c.vec_id cid,
      |    ${dotSql("q.v", "c.v")} / (q.nrm * c.nrm) cosine
      |  FROM n q JOIN n c ON q.cell = c.cell AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
      |ranked AS (
      |  SELECT qid, cid, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) rank
      |  FROM scored)
      |SELECT qid, rank, cid, cosine FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin

  /** IVF with nprobe=2 AND measured recall — the knob a real ANN user
    * turns first when single-probe recall disappoints. Every vector LIVES
    * in its nearest cell (crank=1, same assignment as v6); each QUERY
    * probes its top-2 cells and ranks the union's candidates by exact
    * cosine. The output reports, per query, the candidate-set sizes and
    * the top-3 hit counts against the EXACT brute-force top-3 for both
    * probe depths side by side — recall is measured in the query itself,
    * not asserted offline. hits_2p >= hits_1p always: the 2-probe
    * candidate set is a superset, and any candidate that displaces an
    * exact-top-3 member from the approx top-3 must itself be exact-top-3.
    *
    * Scale shape: identical to v6 (broadcast 10-row centroid table, one
    * shuffle on the cell id for candidate generation) — nprobe only
    * multiplies the QUERY side's cell fan-out, not the data layout. The
    * exact side is the v1 baseline restricted to the same 10 queries
    * (broadcast Q × scan N, linear in N). Both probe depths rank inside
    * ONE window pass (r2 = plain row_number; r1 = running count of
    * crank-1 rows), so measuring recall costs no extra shuffle.
    */
  def v8IvfNprobe(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir).select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val centLong = labelMeans(base)
    val centroids = centLong.groupBy(col("label").as("cell"))
      .agg(sort_array(collect_list(struct(col("dim"), col("ce9")))).as("cs"))
      .select(col("cell"),
        transform(col("cs"), c => c.getField("ce9").cast("double") / 1e9).as("cvec"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(dot(col("v"), col("cvec")).desc, col("cell"))
    // one assignment pass keeps BOTH the home cell (crank=1, where the
    // vector lives) and the second-closest cell (crank=2, what a query
    // additionally probes); materialized once, read by both sides
    val ranked = base.crossJoin(broadcast(centroids))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= 2)
      .select(col("vec_id"), col("v"), col("cell"), col("crank"))
      .localCheckpoint(false)
    val cands = ranked.filter(col("crank") === 1)
      .select(col("vec_id").as("cid"), col("v").as("ce"), col("cell"))
    val queries = ranked.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qe"), col("cell"), col("crank"))
    val scored = broadcast(queries).join(cands, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("crank"),
        (dot(col("qe"), col("ce")) / (norm(col("qe")) * norm(col("ce")))).as("cosine"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    val withRanks = scored
      .withColumn("r2", row_number().over(wq))
      .withColumn("r1", when(col("crank") === 1,
        sum(when(col("crank") === 1, 1).otherwise(0))
          .over(wq.rowsBetween(Window.unboundedPreceding, 0))))
    // exact ground truth: brute force over the FULL corpus (v1's shape)
    val qfull = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qe"))
    val exact = broadcast(qfull)
      .join(base.select(col("vec_id").as("cid"), col("v").as("ce")),
        col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qe"), col("ce")) / (norm(col("qe")) * norm(col("ce")))).as("cosine"))
      .withColumn("er", row_number().over(wq))
      .filter(col("er") <= 3)
      .select(col("qid"), col("cid"), lit(1).as("hit"))
    withRanks.join(broadcast(exact), Seq("qid", "cid"), "left")
      .groupBy(col("qid"))
      .agg(
        sum(when(col("crank") === 1, 1L).otherwise(0L)).as("cand_1p"),
        count(lit(1)).as("cand_2p"),
        sum(when(col("hit") === 1 && col("crank") === 1 && col("r1") <= 3, 1L)
          .otherwise(0L)).as("hits_1p"),
        sum(when(col("hit") === 1 && col("r2") <= 3, 1L).otherwise(0L)).as("hits_2p"))
      .orderBy(col("qid"))
  }

  val v8Sql: String =
    s"""WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |cl AS (
      |  SELECT label, i AS dim,
      |    CAST(SUM(CAST(floor(v[i] * 1e9) AS BIGINT)) // COUNT(*) AS BIGINT) AS ce9
      |  FROM base, (SELECT unnest(generate_series(1, 64)) i)
      |  GROUP BY label, i),
      |cent AS (
      |  SELECT label AS cell, list(CAST(ce9 AS DOUBLE) / 1e9 ORDER BY dim) AS cvec
      |  FROM cl GROUP BY label),
      |ranked AS (
      |  SELECT vec_id, v, cell, rn AS crank FROM (
      |    SELECT b.vec_id, b.v, c.cell,
      |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
      |        ORDER BY ${dotSql("b.v", "c.cvec")} DESC, c.cell) AS rn
      |    FROM base b, cent c)
      |  WHERE rn <= 2),
      |n AS (SELECT vec_id, v, cell, crank, sqrt(${dotSql("v", "v")}) nrm FROM ranked),
      |cands AS (SELECT vec_id cid, v, nrm, cell FROM n WHERE crank = 1),
      |q AS (SELECT vec_id qid, v, nrm, cell, crank FROM n WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.qid, c.cid, q.crank,
      |    ${dotSql("q.v", "c.v")} / (q.nrm * c.nrm) AS cosine
      |  FROM q JOIN cands c ON q.cell = c.cell AND q.qid <> c.cid),
      |wr AS (
      |  SELECT qid, cid, crank,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS r2,
      |    CASE WHEN crank = 1 THEN
      |      SUM(CASE WHEN crank = 1 THEN 1 ELSE 0 END) OVER (
      |        PARTITION BY qid ORDER BY cosine DESC, cid ROWS UNBOUNDED PRECEDING)
      |    END AS r1
      |  FROM scored),
      |nb AS (SELECT vec_id, v, sqrt(${dotSql("v", "v")}) nrm FROM base),
      |exact AS (
      |  SELECT qid, cid FROM (
      |    SELECT a.vec_id qid, b.vec_id cid,
      |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
      |        ORDER BY ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) DESC, b.vec_id) er
      |    FROM nb a JOIN nb b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
      |  WHERE er <= 3)
      |SELECT w.qid,
      |  CAST(SUM(CASE WHEN w.crank = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cand_1p,
      |  COUNT(*) AS cand_2p,
      |  CAST(SUM(CASE WHEN e.cid IS NOT NULL AND w.crank = 1 AND w.r1 <= 3
      |    THEN 1 ELSE 0 END) AS BIGINT) AS hits_1p,
      |  CAST(SUM(CASE WHEN e.cid IS NOT NULL AND w.r2 <= 3
      |    THEN 1 ELSE 0 END) AS BIGINT) AS hits_2p
      |FROM wr w LEFT JOIN exact e ON w.qid = e.qid AND w.cid = e.cid
      |GROUP BY w.qid ORDER BY w.qid""".stripMargin

  /** Int8 scalar quantization — the compression stage before ANN at
    * 100 TB: per-dimension min/max over the corpus (one aggregation,
    * 64 rows out), then a pure projection mapping every float to a
    * [0,255] level, reported as the quantized checksum plus the worst
    * per-vector reconstruction error in fixed-point. 4x memory and
    * bandwidth off the vector table with a measured error bound.
    *
    * Parity: min/max are order-free (no summation), the quantize/
    * dequantize formulas are written with IDENTICAL operation order in
    * both engines, outputs are integers (floor / fixed-point e6) so no
    * cross-row float summation exists; constant dimensions (mx = mn)
    * quantize to 0 by an explicit guard in BOTH engines rather than
    * relying on engine-specific NaN ordering inside the clamp.
    */
  def v7Quantize(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val stats = base.select(posexplode(col("v")))
      .groupBy((col("pos") + 1).as("dim"))
      .agg(min(col("col")).as("mn"), max(col("col")).as("mx"))
    val packed = stats
      .agg(sort_array(collect_list(struct(col("dim"), col("mn"), col("mx")))).as("s"))
      .select(
        transform(col("s"), c => c.getField("mn")).as("mns"),
        transform(col("s"), c => c.getField("mx")).as("mxs"))
    val qExpr = transform(sequence(lit(1), lit(64)), i =>
      when(element_at(col("mxs"), i) > element_at(col("mns"), i),
        least(lit(255.0), greatest(lit(0.0),
          floor(((element_at(col("v"), i) - element_at(col("mns"), i)) * lit(255.0)) /
            (element_at(col("mxs"), i) - element_at(col("mns"), i))))))
        .otherwise(lit(0.0)))
    val errExpr = transform(sequence(lit(1), lit(64)), i =>
      abs(element_at(col("v"), i) -
        (element_at(col("qv"), i) / lit(255.0) *
          (element_at(col("mxs"), i) - element_at(col("mns"), i)) +
          element_at(col("mns"), i))))
    base.crossJoin(broadcast(packed))
      .select(col("vec_id"), col("v"), col("mns"), col("mxs"), qExpr.as("qv"))
      .select(col("vec_id"), col("qv"), errExpr.as("err"))
      .select(col("vec_id"),
        aggregate(col("qv"), lit(0.0), (acc, x) => acc + x).cast("long").as("sum_q"),
        floor(array_max(col("err")) * lit(1e6)).cast("long").as("max_err_e6"))
      .orderBy(col("vec_id"))
  }

  val v7Sql: String =
    """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |stats AS (SELECT i AS dim, MIN(v[i]) AS mn, MAX(v[i]) AS mx
      |          FROM base, (SELECT unnest(generate_series(1, 64)) i) GROUP BY i),
      |packed AS (SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs
      |           FROM stats),
      |qd AS (SELECT vec_id, v, mns, mxs,
      |    list_transform(generate_series(1, 64), i -> CASE WHEN mxs[i] > mns[i]
      |      THEN least(255.0, greatest(0.0,
      |             floor(((v[i] - mns[i]) * 255.0) / (mxs[i] - mns[i]))))
      |      ELSE 0.0 END) AS qv
      |  FROM base, packed),
      |e AS (SELECT vec_id, qv,
      |    list_transform(generate_series(1, 64), i ->
      |      abs(v[i] - (qv[i] / 255.0 * (mxs[i] - mns[i]) + mns[i]))) AS err
      |  FROM qd)
      |SELECT vec_id, CAST(list_sum(qv) AS BIGINT) AS sum_q,
      |  CAST(floor(list_max(err) * 1e6) AS BIGINT) AS max_err_e6
      |FROM e ORDER BY vec_id""".stripMargin

  /** PQ geometry: 64 dims = 4 subspaces x 16 dims. */
  private val PqM = 4
  private val PqSubDim = 16

  /** Product quantization + asymmetric-distance search (v9) — the vector
    * compression stage BETWEEN v7's scalar int8 (4x) and full vectors:
    * each 16-dim subvector is replaced by the id of its nearest
    * sub-codebook centroid, so a vector stores PqM small codes (with a
    * 256-entry codebook, 64 floats -> 4 bytes = 64x). Queries stay
    * full-precision and score against candidate RECONSTRUCTIONS —
    * asymmetric distance, quantization error on one side only.
    *
    * Codebooks here are the per-label means sliced per subspace — the
    * same deterministic fixed-point quantizer v6/v8 use, so the oracle
    * rebuilds them bit-for-bit (a production build would Lloyd-iterate
    * the same assignment pipeline; the iteration count is a config, not
    * a structural change). Scoring reconstructs recon = concat of coded
    * sub-centroids and ranks by exact cosine against recon — LOGICALLY
    * identical to classic LUT-ADC (dot(q, recon) = sum_m LUT_m[code_m]);
    * the per-query lookup table is the broadcast-side micro-optimization
    * of the same math.
    *
    * Scale shape: the whole codebook is PqM x cells sub-vectors — KBs —
    * so it broadcasts as ONE packed row and code assignment becomes a
    * pure projection (argmin fold over the broadcast cells, exactly how
    * production PQ coders run inside the scan): ZERO per-vector
    * shuffles. The scored scan is v1's broadcast-Q x N shape over the
    * coded table, and composes with v6's IVF layout (probe a cell, then
    * ADC-rank inside it — IVF-PQ) for sublinear candidate generation.
    * True cosine rides along per result row, so the quantization loss is
    * measured in-query (v7/v8 discipline), not asserted offline.
    */
  def v9PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir).select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    // per-label fixed-point means (identical to v6), sliced per subspace
    val centLong = labelMeans(base)
    // one packed row: book[m+1] = the cells of subspace m, sorted by
    // cell id — the fold below visits them in that order, so "strictly
    // less" keeps the lowest cell on exact ties (row_number parity).
    // Built from ONE aggregation of the (label, dim, ce9) rows: the
    // sorted flat list has exactly 64 entries per label, so cell ci's
    // subspace-m slice sits at offsets ci*64 + m*16 + (1..16).
    val packed = centLong
      .groupBy()
      .agg(sort_array(collect_list(
        struct(col("label"), col("dim"), col("ce9")))).as("l"))
      .select(transform(sequence(lit(0), lit(PqM - 1)), m =>
        transform(sequence(lit(0), (size(col("l")) / lit(64)).cast("int") - 1), ci =>
          struct(
            element_at(col("l"), ci * 64 + 1).getField("label").as("cell"),
            transform(sequence(lit(1), lit(PqSubDim)), j =>
              element_at(col("l"), ci * 64 + m * PqSubDim + j)
                .getField("ce9").cast("double") / 1e9).as("csub"))))
        .as("book"))
    // coding = projection: per subspace, argmin-L2 fold over the
    // broadcast cells; recon is the coded sub-centroids concatenated.
    // Same HOF hygiene as the near-dup family: repartition spreads the
    // interpreted lambdas off the single scan split, and recon is an
    // aliased projection (multi-referenced below, so CollapseProject
    // cannot inline the fold into every consumer).
    val reconExpr = flatten(transform(sequence(lit(0), lit(PqM - 1)), m => {
      val sub = slice(col("v"), m * PqSubDim + 1, lit(PqSubDim))
      aggregate(element_at(col("book"), m + 1),
        struct(lit(Double.MaxValue).as("d2"),
          lit(null).cast("array<double>").as("csub")),
        (acc, c) => {
          val diff = zip_with(sub, c.getField("csub"), (a, b) => a - b)
          val d2 = dot(diff, diff)
          when(d2 < acc.getField("d2"),
            struct(d2.as("d2"), c.getField("csub").as("csub")))
            .otherwise(acc)
        },
        acc => acc.getField("csub"))
    }))
    val coded = base
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .crossJoin(broadcast(packed))
      .select(col("vec_id"), col("v"), reconExpr.as("recon"))
    val queries = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qe"))
    val cands = coded.select(col("vec_id").as("cid"), col("recon"),
      col("v").as("cv"))
    val wr = Window.partitionBy(col("qid"))
      .orderBy(col("adc_cosine").desc, col("cid"))
    broadcast(queries).join(cands, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qe"), col("recon")) /
          (norm(col("qe")) * norm(col("recon")))).as("adc_cosine"),
        (dot(col("qe"), col("cv")) /
          (norm(col("qe")) * norm(col("cv")))).as("true_cosine"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("cid"),
        col("adc_cosine"), col("true_cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  val v9Sql: String = {
    val subDot16 = (a: String, b: String) =>
      s"""list_reduce(list_transform(generate_series(1, $PqSubDim),
         |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (acc, x) -> acc + x)""".stripMargin
    s"""WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |cl AS (
      |  SELECT label, i AS dim,
      |    CAST(SUM(CAST(floor(v[i] * 1e9) AS BIGINT)) // COUNT(*) AS BIGINT) AS ce9
      |  FROM base, (SELECT unnest(generate_series(1, 64)) i)
      |  GROUP BY label, i),
      |cent AS (
      |  SELECT label AS cell, list(CAST(ce9 AS DOUBLE) / 1e9 ORDER BY dim) AS cvec
      |  FROM cl GROUP BY label),
      |subc AS (
      |  SELECT cell, m, cvec[(m * $PqSubDim + 1):(m * $PqSubDim + $PqSubDim)] AS csub
      |  FROM cent, (SELECT unnest(generate_series(0, ${PqM - 1})) m)),
      |subs AS (
      |  SELECT vec_id, v, m, v[(m * $PqSubDim + 1):(m * $PqSubDim + $PqSubDim)] AS sub
      |  FROM base, (SELECT unnest(generate_series(0, ${PqM - 1})) m)),
      |codes AS (
      |  SELECT vec_id, v, m, csub FROM (
      |    SELECT s.vec_id, s.v, s.m, c.csub,
      |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
      |        ORDER BY ${subDot16("s.sub", "c.csub")}, c.cell) AS rn
      |    FROM subs s JOIN subc c ON s.m = c.m)
      |  WHERE rn = 1),
      |recon AS (
      |  SELECT vec_id, flatten(list(csub ORDER BY m)) AS recon, any_value(v) AS cv
      |  FROM codes GROUP BY vec_id),
      |q AS (SELECT vec_id AS qid, v AS qe FROM base WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.qid, r.vec_id AS cid,
      |    ${dotSql("q.qe", "r.recon")} /
      |      (sqrt(${dotSql("q.qe", "q.qe")}) * sqrt(${dotSql("r.recon", "r.recon")}))
      |      AS adc_cosine,
      |    ${dotSql("q.qe", "r.cv")} /
      |      (sqrt(${dotSql("q.qe", "q.qe")}) * sqrt(${dotSql("r.cv", "r.cv")}))
      |      AS true_cosine
      |  FROM q JOIN recon r ON q.qid <> r.vec_id)
      |SELECT qid, rank, cid, adc_cosine, true_cosine FROM (
      |  SELECT qid, cid, adc_cosine, true_cosine,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_cosine DESC, cid) AS rank
      |  FROM scored)
      |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  }

  /** One distributed Lloyd (k-means) iteration — the codebook/centroid
    * LEARNING step the IVF (v6/v8) and PQ (v9) quantizers consume:
    * assign every vector to its nearest centroid by L2, then recompute
    * each cell's mean and within-cell inertia. Init is the deterministic
    * label-mean quantizer, so engines (and rounds) agree bit-for-bit;
    * iterating is running the same query on its own output.
    *
    * Scale shape — the canonical "k-means on Spark" plan:
    *  - assignment is a PURE PROJECTION: the centroid set is KBs,
    *    broadcast as one packed row, argmin computed by a fold over the
    *    broadcast cells (no join, no shuffle — same trick as v9's
    *    coder);
    *  - the update step is ONE hash aggregation on (cell, dim) with
    *    map-side partial combine — the only shuffle that scales with
    *    data;
    *  - means and inertia are fixed-point longs (floor e9), so the
    *    cross-row sums that k-means needs are order-free and
    *    oracle-exact — the classic float-summation nondeterminism of
    *    distributed k-means is engineered out rather than tolerated.
    * Output: the first 8 dims of each updated centroid plus membership
    * and inertia per cell (the convergence diagnostics a caller watches
    * between iterations).
    */
  def v10KmeansIter(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir).select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    kmeansStep(spark, base, labelMeans(base))
      .filter(col("dim") <= 8)
      .select(col("cell").cast("long").as("cell"),
        col("dim").cast("long").as("dim"),
        col("ce9"), col("n_members"), col("inertia_e9"))
      .orderBy(col("cell"), col("dim"))
  }

  /** Deterministic init for [[kmeansStep]]: per-label fixed-point means
    * as (label, dim, ce9) rows — the same coarse quantizer v6/v8/v9 use.
    */
  private[graft] def labelMeans(base: DataFrame): DataFrame = base
    .select(col("label"), posexplode(col("v")))
    .groupBy(col("label"), (col("pos") + 1).as("dim"))
    .agg(sum(floor(col("col") * lit(1e9)).cast("long")).as("s"),
      count(lit(1)).as("n"))
    .select(col("label"), col("dim"), expr("s DIV n").as("ce9"))

  /** One Lloyd step: assign every `base` vector (columns vec_id, v) to
    * its nearest centroid from `centLong` (columns label, dim, ce9 —
    * 64 dims per label), then recompute per-cell fixed-point means,
    * membership, and assignment inertia. Emits ALL 64 dims per cell, so
    * the output feeds straight back in as the next step's `centLong`
    * (iterate-until-converged is a driver loop over this function;
    * empty cells drop out, as in classic Lloyd).
    */
  private[graft] def kmeansStep(
      spark: SparkSession, base: DataFrame, centLong: DataFrame): DataFrame = {
    // all centroids packed into one broadcast row, sorted by cell so the
    // argmin fold's strictly-less keeps the lowest cell on exact ties
    val packed = centLong
      .groupBy()
      .agg(sort_array(collect_list(
        struct(col("label"), col("dim"), col("ce9")))).as("l"))
      .select(transform(
        sequence(lit(0), (size(col("l")) / lit(64)).cast("int") - 1), ci =>
          struct(
            element_at(col("l"), ci * 64 + 1).getField("label").as("cell"),
            transform(sequence(lit(1), lit(64)), j =>
              element_at(col("l"), ci * 64 + j)
                .getField("ce9").cast("double") / 1e9).as("cvec")))
        .as("cents"))
    val bestExpr = aggregate(col("cents"),
      struct(lit(Double.MaxValue).as("d2"), lit(null).cast("long").as("cell")),
      (acc, c) => {
        val diff = zip_with(col("v"), c.getField("cvec"), (a, b) => a - b)
        val d2 = dot(diff, diff)
        when(d2 < acc.getField("d2"),
          struct(d2.as("d2"), c.getField("cell").as("cell")))
          .otherwise(acc)
      })
    val assigned = base
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .crossJoin(broadcast(packed))
      .select(col("vec_id"), col("v"), bestExpr.as("best"))
      .select(col("v"), col("best").getField("cell").as("cell"),
        floor(col("best").getField("d2") * lit(1e9)).cast("long").as("d2e9"))
    assigned
      .select(col("cell"), col("d2e9"), posexplode(col("v")))
      .groupBy(col("cell"), (col("pos") + 1).as("dim"))
      .agg(sum(floor(col("col") * lit(1e9)).cast("long")).as("s"),
        count(lit(1)).as("n_members"),
        sum(col("d2e9")).as("inertia_e9"))
      .select(col("cell"), col("dim"), expr("s DIV n_members").as("ce9"),
        col("n_members"), col("inertia_e9"))
  }

  val v10Sql: String = {
    val l2 = (a: String, b: String) =>
      s"""list_reduce(list_transform(generate_series(1, 64),
         |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (acc, x) -> acc + x)""".stripMargin
    s"""WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |cl AS (
      |  SELECT label, i AS dim,
      |    CAST(SUM(CAST(floor(v[i] * 1e9) AS BIGINT)) // COUNT(*) AS BIGINT) AS ce9
      |  FROM base, (SELECT unnest(generate_series(1, 64)) i)
      |  GROUP BY label, i),
      |cent AS (
      |  SELECT label AS cell, list(CAST(ce9 AS DOUBLE) / 1e9 ORDER BY dim) AS cvec
      |  FROM cl GROUP BY label),
      |a AS (
      |  SELECT vec_id, v, cell, d2 FROM (
      |    SELECT b.vec_id, b.v, c.cell, ${l2("b.v", "c.cvec")} AS d2,
      |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
      |        ORDER BY ${l2("b.v", "c.cvec")}, c.cell) AS rn
      |    FROM base b, cent c)
      |  WHERE rn = 1)
      |SELECT CAST(cell AS BIGINT) AS cell, CAST(i AS BIGINT) AS dim,
      |  CAST(SUM(CAST(floor(v[i] * 1e9) AS BIGINT)) // COUNT(*) AS BIGINT) AS ce9,
      |  COUNT(*) AS n_members,
      |  CAST(SUM(CAST(floor(d2 * 1e9) AS BIGINT)) AS BIGINT) AS inertia_e9
      |FROM a, (SELECT unnest(generate_series(1, 8)) i)
      |GROUP BY cell, i ORDER BY cell, dim""".stripMargin
  }

  val defs: Map[String, Q] = Map(
    "v10_kmeans_iter" -> (v10KmeansIter _),
    "v9_pq_adc" -> (v9PqAdc _),
    "v7_quantize" -> (v7Quantize _),
    "v1_cosine_topk" -> (v1CosineTopk _),
    "v2_lsh_ann" -> (v2LshAnn _),
    "v3_label_norms" -> (v3LabelNorms _),
    "v4_label_centroids" -> (v4LabelCentroids _),
    "v5_embedding_neardup" -> (v5EmbeddingNeardup _),
    "v6_ivf_ann" -> (v6IvfAnn _),
    "v8_ivf_nprobe" -> (v8IvfNprobe _))

  val oracles: Map[String, String] = Map(
    "v10_kmeans_iter" -> v10Sql,
    "v9_pq_adc" -> v9Sql,
    "v7_quantize" -> v7Sql,
    "v1_cosine_topk" -> v1Sql,
    "v2_lsh_ann" -> v2Sql,
    "v3_label_norms" -> v3Sql,
    "v4_label_centroids" -> v4Sql,
    "v5_embedding_neardup" -> v5Sql,
    "v6_ivf_ann" -> v6Sql,
    "v8_ivf_nprobe" -> v8Sql)
}
