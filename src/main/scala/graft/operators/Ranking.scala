package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global total-order ranking WITHOUT the single-partition window trap.
  *
  * `row_number().over(Window.orderBy(...))` with no partition key pulls the
  * entire dataset through ONE task (Spark itself warns "No Partition
  * Defined ... may cause serious performance degradation") — the canonical
  * way a correct-at-test-scale query falls over at 100 TB. This operator
  * computes the same global rank distributively:
  *
  *  1. `repartitionByRange` + `sortWithinPartitions` on the sort key — a
  *     range shuffle, each partition sorted, partitions globally ordered;
  *  2. per-partition row counts (one tiny aggregate on
  *     `spark_partition_id()`) → prefix-sum offsets on the driver
  *     (partition-count-sized, broadcast back as a literal map);
  *  3. rank = partition offset + intra-partition `row_number` over a
  *     window PARTITIONED by partition id — every window task sorts only
  *     its own partition.
  *
  * The rank values depend only on the TOTAL sort order (the caller must
  * pass a tie-free key list), not on where the range boundaries land — so
  * the output is deterministic even though `repartitionByRange` samples
  * boundaries.
  *
  * Cost: one range shuffle + one pid-keyed window shuffle + a
  * partition-count-sized driver exchange — vs the single-task global sort
  * of the naive window. */
object Ranking {

  def globalRank(df: DataFrame, sortCols: Seq[Column], rankCol: String = "rnk",
      numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    // CACHED as a barrier: the count pass and the rank projection are two
    // separate actions, and repartitionByRange SAMPLES its boundaries per
    // physical execution — uncached, the second action could land rows in
    // different partitions than the offsets were computed from. The cache
    // pins one materialization (and a lost-block recompute re-reads the
    // retained shuffle map outputs, which already carry the partitioning).
    // Not unpersisted: the returned plan reads it lazily — callers ranking
    // corpus-scale data should write the result out and unpersist (the
    // same contract as bm25's tf cache).
    val parted = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    // partition-count-sized: collect is bounded by n, not by data
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offExpr = map((0 until n).flatMap(p =>
      Seq(lit(p), lit(offsets(p)))): _*)
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    parted
      .withColumn(rankCol,
        element_at(offExpr, col("__pid")) + row_number().over(w).cast("long"))
      .drop("__pid")
  }

  /** Distributed 2D skyline (Pareto frontier) — minimize `xCol`, maximize
    * `yCol`: the points no other point beats on both axes (cheapest-for-
    * the-quantity offers, fastest-for-the-cost configs). Both columns must
    * be BIGINT — the dominance test is exact integer comparison, the same
    * no-FP-threshold doctrine as the cosine/χ² rows.
    *
    * Same distributed skeleton as [[globalRank]] (and the same barrier
    * caveat): collapse to one candidate per x (only max-y at a given x
    * can be on the frontier), range-shuffle by x, per-partition y-maxima
    * → EXCLUSIVE prefix maxima on the driver (partition-count-sized),
    * then each candidate survives iff its y beats both the prior
    * partitions' maximum and the running maximum over strictly-smaller x
    * within its partition (a RANGE frame to −1 — one row per x, so
    * "strictly smaller" is exact). Equal y at smaller x dominates, so the
    * comparison is strict. No single-task global sort anywhere; the
    * frontier itself is O(distinct y) ≤ both axes' cardinalities. */
  def skylineMinMax(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    // y cast long up front: the per-partition maxima round-trip through
    // the driver as Long, and an IntegerType input would throw there
    val parted = df.groupBy(col(xCol)).agg(max(col(yCol).cast("long")).as(yCol))
      .repartitionByRange(n, col(xCol))
      .sortWithinPartitions(col(xCol))
      .withColumn("__pid", spark_partition_id())
      .cache() // barrier: boundaries resample per action (see globalRank)
    // partition-count-sized driver exchange, exactly like globalRank's
    val maxima = parted.groupBy(col("__pid")).agg(max(col(yCol)).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefix = (0 until n).scanLeft(Long.MinValue) { (acc, p) =>
      math.max(acc, maxima.getOrElse(p, Long.MinValue))
    }
    val prefExpr = map((0 until n).flatMap(p =>
      Seq(lit(p), lit(prefix(p)))): _*)
    val w = Window.partitionBy(col("__pid")).orderBy(col(xCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn("__prior", greatest(
        element_at(prefExpr, col("__pid")),
        coalesce(max(col(yCol)).over(w), lit(Long.MinValue))))
      .filter(col(yCol) > col("__prior"))
      .select(col(xCol), col(yCol))
  }
}
