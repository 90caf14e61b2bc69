package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned, pre-sorted) table layout — Spark's native
  * co-location primitive for the joins a pipeline repeats every run
  * (fact ⋈ fact on the same key, incremental MERGE against a snapshot).
  * Writing both sides bucketed by the join key with the SAME bucket count
  * makes every later equi-join/aggregate on that key shuffle-FREE: the
  * scan reports `HashPartitioning(key, n)` via `outputPartitioning`, so
  * Catalyst's EnsureRequirements inserts no Exchange, and `sortBy` lets
  * SortMergeJoin skip its per-task sorts too. At 100 TB this converts the
  * dominant repeated cost (a full shuffle of the big table per run) into
  * a one-time layout cost at write.
  *
  * The trade: bucket files are fixed at write time (n buckets = n files
  * per write task group), AQE cannot coalesce them, and both join sides
  * must agree on count — standard practice is one corpus-wide bucket
  * count sized so a single bucket of the BIGGEST table fits an executor.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    require(buckets > 0)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (scan exposes the bucket partitioning). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
