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
}
