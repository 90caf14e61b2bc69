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
}
