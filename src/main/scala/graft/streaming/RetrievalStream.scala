package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{TextFunctions => T, VecDotFold}
import graft.queries.{Pipeline, Vectors}

/** Streaming twins of the hybrid-retrieval queries (VERDICT r11 #5 /
  * r12 #4): queries ARRIVE as a stream; the corpus side is the same
  * persisted state the batch queries read — the BM25 contribution index
  * ([[graft.queries.Pipeline.bm25Contrib]]) and the embeddings table —
  * so this is the [[graft.queries.Documents.streamNeardup]] precedent
  * applied to retrieval: stream-static joins fan each arriving query out
  * to its candidate rows, and the per-query ranking/fusion/selection
  * happens in `flatMapGroupsWithState` keyed by qid (the candidate list
  * is depth-bounded, so per-key state is O(depth), never corpus-sized).
  *
  * Bit-identity with the batch twins is BY CONSTRUCTION, not hope:
  *  - every corpus-side number (BM25 contrib, cosine rel, norms) is
  *    computed by the SAME Catalyst expressions as the batch query, in
  *    the stream-static projection, before state;
  *  - the lexical score sums DECIMAL(18,6) contributions as exact long
  *    micro-units in state (order-free integer adds), converted to
  *    double through the same BigDecimal path Spark's decimal→double
  *    cast uses;
  *  - in-state pairwise MMR sims re-run [[VecDotFold]]'s exact loop
  *    (sequential left fold in double) over the carried vectors;
  *  - sorts use IEEE total order with descending NaN-first and a -0.0
  *    normalization, matching Spark's SQL sort semantics, with the same
  *    (score DESC, cid) tie-breaks as the batch windows.
  * StreamingOpsSpec asserts row identity against p27/v28 on AvailableNow.
  *
  * Scale shape: the static sides are build-once/read-many persisted
  * tables (term-bucketed contrib index; at corpus scale the vector side
  * would be the IVF-probed subset — v6's path — exactly as the batch
  * queries document). Per micro-batch the work is |arrivals| × postings
  * and |arrivals| × N candidate rows — the batch queries' own per-query
  * cost, paid incrementally. Per-key work is the depth-20 candidate
  * pool, recomputed and re-emitted each time the key appears (update
  * mode);
  * an at-least-once re-delivery of a query row recomputes the same list
  * rather than double-counting: each arriving row regenerates its
  * COMPLETE candidate set within its own micro-batch, intra-batch
  * duplicates dedup on per-query-unique keys ((cid, term) lexical, cid
  * vector), and NO cross-batch state is stored — the GroupState is left
  * untouched, so the store never grows with all-time distinct queries.
  */
object RetrievalStream {

  /** One candidate row entering the per-query state: a lexical posting
    * match (leg 0, exact contrib in 1e-6 units, with the matched term so
    * intra-batch duplicate deliveries dedup exactly — (cid, term) is
    * unique per query by construction) or a vector candidate (leg 1,
    * cosine rel; cid unique per query).
    */
  private[graft] final case class FusionCand(
      qid: Long, leg: Int, cid: Long, term: String, micros: Long, rel: Double)

  final case class FusedRow(
      qid: Long, rank: Long, cid: Long,
      lex_rank: Option[Long], vec_rank: Option[Long], rrf: Double)

  private[graft] final case class MmrCand(
      qid: Long, cid: Long, rel: Double, cv: Array[Double], cn: Double)

  final case class MmrRow(qid: Long, step: Long, cid: Long, rel: Double, mmr: Double)

  private def dot(a: Column, b: Column): Column = VecDotFold.dot(a, b)
  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Spark's descending SQL sort over (score, id): NaN first, -0.0
    * equal to 0.0 (normalized via +0.0 at the call sites), id ascending
    * on ties.
    */
  private val scoreDesc: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

  /** Exact decimal(scale 6) → double, the same BigDecimal path as
    * Spark's Decimal.toDouble on the batch side's summed DECIMAL(18,6).
    */
  private def microsToDouble(m: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(m), 6).doubleValue()

  /** The candidate fan-out both twins share: arriving (qid, qv) against
    * the static (cid, cv) embedding side, broadcast on the (small)
    * arrival side like the batch pool's broadcast-Q × scan-N discipline.
    */
  private def vectorCandidates(queries: DataFrame, embeddings: DataFrame): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val cands = e.select(col("vec_id").as("cid"), col("v").as("cv"),
      norm(col("v")).as("cn"))
    broadcast(queries
        .select(col("qid"), transform(col("embedding"), x => x.cast("double")).as("qv"))
        .withColumn("qn", norm(col("qv"))))
      .join(cands, col("qid") =!= col("cid"))
      .withColumn("rel", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
  }

  /** Streaming twin of [[graft.queries.Pipeline.p27RankFusion]]:
    * arriving (qid, text, embedding) rows → per-query fused top-10.
    * Lexical leg: explode the query's distinct terms, stream-static
    * join the persisted contrib index; vector leg: the broadcast cosine
    * fan-out. Per-qid state ranks both depth-20 legs and fuses with
    * rrf = Σ 1/(k + rank).
    */
  def streamRankFusion(
      queries: DataFrame, contrib: DataFrame, embeddings: DataFrame): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val lex = queries
      .select(col("qid"), explode(array_distinct(T.tokens(col("text")))).as("term"))
      .join(contrib, Seq("term"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), lit(0).as("leg"), col("cid"), col("term"),
        (col("contrib") * lit(1000000L)).cast("long").as("micros"),
        lit(0.0).as("rel"))
    val vec = vectorCandidates(queries.select(col("qid"), col("embedding")), embeddings)
      .select(col("qid"), lit(1).as("leg"), col("cid"), lit("").as("term"),
        lit(0L).as("micros"), col("rel"))
    lex.unionByName(vec).as[FusionCand]
      .groupByKey(_.qid)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fuseGroup)
      .toDF()
  }

  private def fuseGroup(
      qid: Long, it: Iterator[FusionCand],
      state: GroupState[Long]): Iterator[FusedRow] = {
    // no cross-batch state is kept: each arriving query row regenerates
    // its COMPLETE candidate set within its own micro-batch, so the
    // fused list is recomputed whole each time the key appears and
    // nothing accumulates in the store (an update here would leak one
    // entry per all-time distinct qid). Intra-batch duplicate deliveries
    // dedup exactly on the per-query-unique keys.
    val rows = it.toVector
    val lexRank: Map[Long, Long] = rows.iterator.filter(_.leg == 0).toVector
      .distinctBy(r => (r.cid, r.term))
      .groupBy(_.cid).view.mapValues(_.map(_.micros).sum).toVector
      .map { case (cid, m) => (microsToDouble(m) + 0.0, cid) }
      .sorted(scoreDesc)
      .take(Pipeline.RrfDepth).zipWithIndex
      .map { case ((_, cid), i) => cid -> (i + 1L) }.toMap
    val vecRank: Map[Long, Long] = rows.iterator.filter(_.leg == 1).toVector
      .distinctBy(_.cid)
      .map(r => (r.rel + 0.0, r.cid))
      .sorted(scoreDesc)
      .take(Pipeline.RrfDepth).zipWithIndex
      .map { case ((_, cid), i) => cid -> (i + 1L) }.toMap
    def contrib(r: Option[Long]): Double =
      r.map(x => 1.0 / (Pipeline.RrfK.toDouble + x.toDouble)).getOrElse(0.0)
    (lexRank.keySet ++ vecRank.keySet).toVector
      .map { cid =>
        val lr = lexRank.get(cid); val vr = vecRank.get(cid)
        (cid, lr, vr, contrib(lr) + contrib(vr))
      }
      .map { case (cid, lr, vr, s) => ((s + 0.0, cid), lr, vr) }
      .sortBy(_._1)(scoreDesc)
      .take(Pipeline.RrfTopN).zipWithIndex
      .map { case (((s, cid), lr, vr), i) => FusedRow(qid, i + 1L, cid, lr, vr, s) }
      .iterator
  }

  /** Streaming twin of [[graft.queries.Vectors.v28MmrDiversify]]:
    * arriving (qid, embedding) rows → the query's greedy MMR top-5 over
    * its depth-20 cosine pool. The k-step greedy loop the batch query
    * unrolls into k dataframe stages runs in-state here over the
    * depth-bounded pool (20 carried vectors — the pairwise sims are
    * 20×20 doubles, trivially in-memory).
    */
  def streamMmrDiversify(queries: DataFrame, embeddings: DataFrame): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    vectorCandidates(queries, embeddings)
      .select(col("qid"), col("cid"), col("rel"), col("cv"), col("cn"))
      .as[MmrCand]
      .groupByKey(_.qid)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(mmrGroup)
      .toDF()
  }

  /** [[VecDotFold]]'s exact arithmetic (sequential left fold, double):
    * the in-state mirror for pairwise sims over carried vectors.
    */
  private def dotScala(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def mmrGroup(
      qid: Long, it: Iterator[MmrCand],
      state: GroupState[Long]): Iterator[MmrRow] = {
    // stateless per batch, like fuseGroup (see the note there)
    val pool = it.toVector
      .distinctBy(_.cid)
      .map(c => ((c.rel + 0.0, c.cid), c))
      .sortBy(_._1)(scoreDesc)
      .take(Vectors.MmrDepth).map(_._2)
    if (pool.isEmpty) return Iterator.empty
    def pick(scored: Vector[(MmrCand, Double)], step: Long): (MmrCand, MmrRow) = {
      val ((_, _), (c, m)) = scored.map { case (c, m) => ((m + 0.0, c.cid), (c, m)) }
        .sortBy(_._1)(scoreDesc).head
      (c, MmrRow(qid, step, c.cid, c.rel, m))
    }
    val lam = Vectors.MmrLambda
    val first = pick(pool.map(c => (c, lam * c.rel)), 1L)
    val picks = (2 to Vectors.MmrK).foldLeft(Vector(first)) { (sel, step) =>
      val selectedIds = sel.map(_._1.cid).toSet
      val remaining = pool.filterNot(c => selectedIds(c.cid))
      if (remaining.isEmpty) sel
      else {
        val scored = remaining.map { c =>
          val maxsim = sel.map { case (s, _) =>
            dotScala(c.cv, s.cv) / (c.cn * s.cn)
          }.max
          (c, lam * c.rel - (1 - lam) * maxsim)
        }
        sel :+ pick(scored, step.toLong)
      }
    }
    picks.map(_._2).iterator
  }
}
