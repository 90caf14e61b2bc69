package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the classic distributed-join
  * optimization (Bloom, CACM'70 §app; Polychroniou & Ross, SIGMOD'14 on
  * vectorized bloom joins; Spark's own `InjectRuntimeFilter` applies the
  * same idea when statistics let it): before shuffling a huge fact table
  * into a join, test each fact key against a compact Bloom sketch of the
  * (filtered) dimension keys and drop the rows that cannot match. At 100 TB
  * the exchange is the join's dominant cost, and a selective dim predicate
  * means most fact rows shuffle only to be discarded — the sketch moves
  * that discard BELOW the exchange for ~1 MB of broadcast state.
  *
  * Cited reference behavior: `/root/reference` pushes all join execution to
  * Athena/Presto (`sql/saved-queries.sql:10-45`), whose engine applies
  * dynamic filtering to the same effect; this operator makes the technique
  * explicit and statistics-independent on Spark.
  */
object BloomJoin {

  /** Inner equi-join `fact ⋈ dim ON factKey = dimKey` with a Bloom
    * pre-filter on the fact side.
    *
    * The sketch is a SCALAR SUBQUERY (`BloomFilterAggregate` over
    * `xxhash64(dimKey)`), so it is computed by the ENGINE when the query
    * runs — constructing this plan triggers zero jobs (the t19/bm25
    * discipline: no query constructs itself by scanning data). False
    * positives pass the filter and die in the exact join that follows, so
    * the result is bit-identical to the plain join; false negatives are
    * impossible (Bloom property), and an EMPTY dim yields a null sketch
    * whose `might_contain` is null — every fact row drops, matching the
    * empty plain join.
    *
    * Scale shape: the filter is a per-row hash + bit probe evaluated
    * inside the fact scan stage (below the exchange — plan-asserted in
    * BloomJoinSpec), shrinking the shuffle to rows that can actually
    * match. Works under any join strategy the planner then picks; the
    * win is largest for big-big sort-merge/shuffle-hash joins where the
    * dim is too large to broadcast but its KEY SET fits `numBits`. Size
    * `estKeys` to the expected distinct filtered dim keys (FP rate model:
    * [[Curation.expectedBloomFpRate]]).
    */
  def bloomReducedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      estKeys: Long = 1L << 16,
      numBits: Long = 1L << 20): DataFrame = {
    fact
      .filter(mightMatch(dim, col(factKey), col(dimKey), estKeys, numBits))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** The reusable predicate: `xxhash64(factKey) ∈ BloomSketch(xxhash64 of
    * dim's dimKey)` as a Column — composable into joins this object does
    * not own (left-semi reductions, multi-key conjunctions). */
  def mightMatch(dim: DataFrame, factKey: Column, dimKey: Column,
      estKeys: Long = 1L << 16, numBits: Long = 1L << 20): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val sketchDf = dim.select(ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(dimKey)),
        ColumnBridge.expression(lit(estKeys)),
        ColumnBridge.expression(lit(numBits))).toAggregateExpression()).as("bf"))
    ColumnBridge.column(
      new BloomFilterMightContain(
        ScalarSubquery(sketchDf.queryExecution.analyzed),
        ColumnBridge.expression(xxhash64(factKey))))
  }
}
