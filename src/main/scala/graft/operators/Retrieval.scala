package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-stack composition operators: hybrid rank fusion and
  * retrieval-quality evaluation. These sit ON TOP of the ranked lists the
  * lexical ([[TextAnalysis.bm25]]) and dense ([[Similarity]]) retrievers
  * produce — the glue a RAG / search pipeline runs after its per-modality
  * retrievers and before serving or training-data selection.
  *
  * Both operators work on rank lists, never on corpora: their input sizes
  * are (queries × k), so every join here is metadata-scale no matter how
  * large the corpus behind the lists is. That is the property that makes
  * them free at 100 TB — the expensive work stays inside the retrievers,
  * which own their corpus-scale plans (bucketed candidates, partition-
  * pruned stored indexes).
  */
object Retrieval {

  /** Reciprocal Rank Fusion (Cormack et al., SIGIR'09) over named rank
    * lists: score(d) = Σ_lists 1/(kRrf + rank_list(d)), documents absent
    * from a list contribute nothing. RRF is the standard score-free hybrid
    * fusion — it needs no cross-retriever score calibration, exactly why it
    * beats weighted score sums when fusing BM25 integers with cosine
    * doubles.
    *
    * Scores are integer-quantized: each contribution is
    * `scale div (kRrf + rank)` in BIGINT arithmetic, so the fused total is
    * an order-independent integer sum, engine-portable with no FP ranking
    * hazard (ranks are small integers; with scale = 10⁶ two ranks tie in
    * quantized RRF only when they tie in exact RRF through rank ~900 —
    * far past any practical k).
    *
    * Input frames: (doc_id, rank) with rank ∈ 1..k under each list's own
    * total order. Output: (doc_id, rank_<name>... , rrf_scaled) top `topK`
    * under (rrf_scaled DESC, doc_id); absent ranks surface as 0, not null,
    * so downstream grouping/joins need no null legs. */
  def rrfFuse(lists: Seq[(String, DataFrame)], topK: Int = 25,
      kRrf: Int = 60, scale: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one rank list")
    // Fold the (tiny) rank lists with full-outer joins on doc_id; each
    // list's contribution is computed BEFORE the join so the fold only
    // carries (doc_id, rank_<name>, c_<name>) columns.
    val prepared = lists.map { case (name, df) =>
      df.select(
        col("doc_id"),
        col("rank").as(s"rank_$name"),
        expr(s"${scale}L div (${kRrf}L + rank)").as(s"__c_$name"))
    }
    val joined = prepared.reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
    val rrf = lists.map { case (name, _) =>
      coalesce(col(s"__c_$name"), lit(0L))
    }.reduce(_ + _)
    val rankCols = lists.map { case (name, _) =>
      coalesce(col(s"rank_$name"), lit(0L)).as(s"rank_$name")
    }
    joined
      .select((col("doc_id") +: rankCols :+ rrf.as("rrf_scaled")): _*)
      .orderBy(col("rrf_scaled").desc, col("doc_id"))
      .limit(topK)
  }

  /** Global 1..n rank attached to an already-ordered top-k frame — the
    * adapter from a retriever's (score, id) output to [[rrfFuse]]'s rank
    * contract. The window is intentionally partition-less: it runs AFTER
    * the retriever's own limit, on a k-row frame, so the single-partition
    * sort is bounded by k, never by the corpus. */
  def asRankList(topkFrame: DataFrame, idCol: String, orderBy: Seq[org.apache.spark.sql.Column]): DataFrame =
    topkFrame
      .withColumn("rank", row_number().over(Window.orderBy(orderBy: _*)).cast("long"))
      .select(col(idCol).as("doc_id"), col("rank"))

  /** Retrieval-quality evaluation of an approximate top-k list against the
    * exact one: per query, the hit count (|approx ∩ exact|, the recall@k
    * numerator) and the reciprocal rank of the FIRST hit in the approx
    * order (the MRR contribution) — the two numbers an ANN rollout watches
    * per index build. All integers: `mrr_scaled = scale div first_hit_rank`
    * (0 when the approx list misses entirely), so a fleet-wide mean is an
    * exact integer sum away.
    *
    * Inputs are (query_id, neighbor_id, rank) lists; the query universe is
    * taken from the EXACT side, so queries the approximate retriever
    * returned nothing for still emit a (0, 0, 0) row instead of vanishing —
    * silent query dropout is precisely what an eval must surface. */
  def retrievalMetrics(exact: DataFrame, approx: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    val relevant = exact
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    val marked = approx
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .join(relevant, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"),
        min(when(col("__hit").isNotNull, col("rank"))).as("__first"))
    exact.select(col("query_id")).distinct()
      .join(marked, Seq("query_id"), "left_outer")
      .select(
        col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("__first"), lit(0L)).as("first_hit_rank"),
        coalesce(expr(s"${scale}L div __first"), lit(0L)).as("mrr_scaled"))
  }

  /** Integer-quantized DCG position weights: w(r) = ⌊scale / log2(1+r)⌋,
    * computed ONCE on the driver and embedded as literals in BOTH the
    * Spark plan and the SQL oracle — the engines never evaluate a log,
    * so nDCG joins the sketch-free exact-integer metric family
    * ([[retrievalMetrics]]' convention). Single source for
    * [[ndcgAtK]] and its oracle twin. */
  def ndcgWeights(k: Int, scale: Long = 1000000L): Seq[(Int, Long)] =
    (1 to k).map(r => r -> (scale / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** nDCG@k of an approximate ranked list against the exact one, with
    * binary relevance = membership in the exact top-k (the ANN-rollout
    * convention, like [[retrievalMetrics]]). Per query:
    * `dcg_scaled` = Σ w(rank) over approx positions holding a relevant
    * item, `idcg_scaled` = Σ w(1..n_relevant) (the perfect ordering), and
    * `ndcg_bp` = dcg·10⁴ div idcg in basis points — all BIGINT, exact on
    * both engines because the position weights are shared driver-computed
    * literals ([[ndcgWeights]]).
    *
    * The query universe comes from the EXACT side, so a query the approx
    * retriever drops entirely still emits (0, idcg, 0) — silent dropout
    * surfaces as nDCG 0, not a missing row. Scale shape: rank lists are
    * (queries × k)-sized, so every join is metadata-scale (the object
    * contract). */
  def ndcgAtK(exact: DataFrame, approx: DataFrame, k: Int = 10,
      scale: Long = 1000000L): DataFrame = {
    require(k >= 1 && k <= 25, s"k must be in 1..25, got $k")
    val w = ndcgWeights(k, scale)
    val cum = w.scanLeft(0 -> 0L) { case ((_, acc), (r, wt)) => r -> (acc + wt) }.tail
    val wExpr = w.foldLeft(lit(0L)) { case (acc, (r, wt)) =>
      when(col("rank") === r, lit(wt)).otherwise(acc)
    }
    def cumExpr(n: org.apache.spark.sql.Column) =
      cum.foldLeft(lit(0L)) { case (acc, (r, c)) =>
        when(n >= r, lit(c)).otherwise(acc)
      }
    val rel = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val nrel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("__nrel"))
    val dcg = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .join(rel.withColumn("__hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(sum(when(col("__hit").isNotNull, wExpr).otherwise(lit(0L)))
        .as("__dcg"))
    nrel
      .join(dcg, Seq("query_id"), "left_outer")
      .select(
        col("query_id"),
        coalesce(col("__dcg"), lit(0L)).as("dcg_scaled"),
        cumExpr(col("__nrel")).as("idcg_scaled"))
      .withColumn("ndcg_bp", expr("dcg_scaled * 10000L div idcg_scaled"))
  }

  /** ColBERT-style late-interaction retrieval (the MaxSim shape of
    * Khattab & Zaharia, SIGIR'20): per (query, doc) pair,
    * score = Σ over query token positions of the MAX dot product against
    * any document token — token-level matching a single pooled vector
    * cannot express, which is why late interaction re-ranks what
    * single-vector ANN retrieves.
    *
    * The token ENCODER is the model seam: here tokens embed through a
    * deterministic hash projection — dim d of token t is
    * ((polyHash(t) + (d+1)·K) mod P)² mod 97, the squared-then-mod
    * nonlinear mix (raw linear residues lattice over sequential tokens) —
    * exactly replayable by the SQL oracle; a production deployment swaps
    * in a real text tower at the same (token → fixed-width integer
    * vector) signature. All scoring is BIGINT-exact: dims < 97, so
    * dot ≤ dims·96² and MaxSim ≤ maxQueryTokens·dims·96² — no FP ranking
    * hazard anywhere.
    *
    * Candidate generation is the lexical prefilter every late-interaction
    * deployment runs before the exact re-rank: only documents sharing ≥ 1
    * exact token with the query are scored (the inverted-index recall
    * set — [[TextAnalysis]]'s t19 shape). That is the 100 TB posture: the
    * query-token frame is queries×tokens-sized and broadcast, candidates
    * arrive via a token-keyed join against per-doc DISTINCT tokens
    * (max over duplicates is the duplicate's max — distinct loses
    * nothing), and the only corpus-scale shuffles are keyed by doc_id.
    * Duplicate QUERY tokens each contribute (per-position grouping), per
    * ColBERT's sum-over-query-positions semantics.
    *
    * Output: (query_id, doc_id, maxsim, rank), rank 1..k under the
    * (maxsim DESC, doc_id) total order. */
  def maxSimTopK(queries: DataFrame, docs: DataFrame, dims: Int = 4,
      maxQueryTokens: Int = 6, k: Int = 5): DataFrame = {
    require(dims >= 1 && dims <= 8, s"dims must be in 1..8, got $dims")
    import graft.functions.TextHash
    val P = TextHash.Prime
    def embCols(h: org.apache.spark.sql.Column, pre: String) =
      (0 until dims).map { d =>
        val m = (h + lit((d + 1).toLong * 2654435761L)) % lit(P)
        ((m * m) % lit(97L)).as(s"$pre$d")
      }
    val qTok = queries.select(col("query_id"),
      posexplode(slice(TextAnalysis.tokens(col("text")), 1, maxQueryTokens))
        .as(Seq("qpos", "tok")))
    val qEmb = qTok
      .withColumn("__h", TextHash.polyHash(col("tok")))
      .select(Seq(col("query_id"), col("qpos"), col("tok")) ++
        embCols(col("__h"), "qe"): _*)
    val dEmb = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct()
      .withColumn("__h", TextHash.polyHash(col("tok")))
      .select(Seq(col("doc_id"), col("tok")) ++ embCols(col("__h"), "de"): _*)
    val cand = broadcast(qEmb.select(col("query_id"), col("tok")).distinct())
      .join(dEmb.select(col("doc_id"), col("tok")), Seq("tok"))
      .select(col("query_id"), col("doc_id")).distinct()
    val dot = (0 until dims).map(d => col(s"qe$d") * col(s"de$d")).reduce(_ + _)
    val scored = dEmb.drop("tok")
      .join(cand, Seq("doc_id"))
      .join(broadcast(qEmb.drop("tok")), Seq("query_id"))
      .groupBy(col("query_id"), col("doc_id"), col("qpos"))
      .agg(max(dot).as("__m"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__m")).as("maxsim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("maxsim").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
