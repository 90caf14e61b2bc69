package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.DeletionVectors

/** Streaming takedown queue — the operational shape of right-to-be-
  * forgotten: deletion requests arrive as a STREAM of keys, and each
  * micro-batch lands as positional tombstones in the
  * [[graft.etl.DeletionVectors]] store (delete-sized writes, zero data
  * rewritten, immediately effective for every delete-aware reader). The
  * periodic [[DeletionVectors.applyDeletes]] maintenance pass — a batch
  * job on its own cadence, not part of the stream — makes them physical.
  *
  * Replay safety needs no idempotence machinery here, unlike the
  * signature-store ingests: a replayed micro-batch re-appends the same
  * (file, pos) tombstones, and duplicate tombstones are structurally
  * harmless under the read path's anti-join — the one store in this
  * repo where append-twice IS the idempotent semantics. The one ordering
  * hazard is a concurrent applyDeletes: it resets the store, so a batch
  * that appended between the apply's fold and its reset would be lost —
  * run apply while the takedown stream is stopped (its own maintenance
  * window), the same single-writer discipline as backfillPartitions. */
object StreamingTakedown {

  /** Start draining `keys` (a streaming frame holding `keyCol`) into the
    * DV store at `dvDir`, tombstoning matching rows of the table at
    * `dataDir`. */
  def run(keys: DataFrame, dataDir: String, dvDir: String, keyCol: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    keys.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Erasure.softEraseKeys(
          batch.sparkSession, dataDir, dvDir, keyCol,
          batch.select(col(keyCol)))
        () // Unit — the (DataFrame, Long) => Unit foreachBatch overload
      }
      .start()
}
