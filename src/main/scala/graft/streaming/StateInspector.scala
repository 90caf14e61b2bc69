package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline inspection of a streaming query's state store — Spark 4's
  * `statestore` batch source over a checkpoint directory.
  *
  * Operationally this is the debugging/monitoring surface a production
  * streaming pipeline needs and historically lacked: answering "what keys
  * is this query currently holding, and how big is that state REALLY" by
  * reading the checkpoint as a plain DataFrame — no code changes to the
  * running query, no stopping it (state files are immutable once
  * committed; the reader binds to a committed batch). Composes with every
  * stateful operator in this repo (dedup horizon keys, session windows,
  * join buffers, transformWithState value state): the same few lines
  * answer state-skew questions ("is one user 90% of the state?") with an
  * ordinary groupBy over the returned frame.
  *
  * Scale posture: the read is partitioned exactly like the state itself
  * (one task per state-store shuffle partition), so inspecting 1000
  * partitions of RocksDB state is a normal parallel scan, not a driver
  * download.
  */
object StateInspector {

  /** The state rows of `operatorId` at the last committed batch (or
    * `batchId` if given): columns `key` (struct of the operator's state
    * key), `value` (struct of its state buffer), `partition_id`. */
  def readState(spark: SparkSession, checkpointDir: String,
      operatorId: Int = 0, batchId: Option[Long] = None,
      storeName: Option[String] = None): DataFrame = {
    var r = spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
    batchId.foreach(b => r = r.option("batchId", b.toString))
    storeName.foreach(n => r = r.option("storeName", n))
    r.load(checkpointDir)
  }
}
