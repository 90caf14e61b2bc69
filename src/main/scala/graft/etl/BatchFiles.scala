package graft.etl

import org.apache.spark.sql.DataFrame

/** Store-batch output sizing. Every incremental store publishes its batch
  * via `df.write.parquet(staging)`, which emits one part file per
  * partition of the frame — for a micro-batch that is shuffle-partition
  * COUNT files (measured: 33 files for a 600-row fuzzy-neighborhood
  * batch). The store's file count is the per-ingest fixed cost every
  * later run pays (one listing entry + parquet footer each, ×3 when an
  * ingest scans the store for anti-join, pair side, and strings), so it
  * must track DATA volume, not partition config: ~[[RowsPerFile]] rows
  * per part file, clamped to 1..64 files per batch. Compaction
  * ([[graft.operators.Dedup.compactStore]]) remains the batch-COUNT
  * remedy; this keeps each batch from multiplying it.
  */
object BatchFiles {

  val RowsPerFile = 4000000L

  /** Coalesce a MATERIALIZED (checkpointed) batch frame to a
    * data-proportional file count. The count reads the cached RDD — the
    * writers all checkpoint before publishing (the store doctrine), so
    * this adds no recomputation. */
  def sized(df: DataFrame): DataFrame = sizedByCount(df, df.count())

  /** [[sized]] when the caller already knows the row count. */
  def sizedByCount(df: DataFrame, rows: Long): DataFrame =
    df.coalesce(
      math.max(1L, math.min(64L, (rows + RowsPerFile - 1) / RowsPerFile)).toInt)
}
