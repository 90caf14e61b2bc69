package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Clustering

/** Streaming vector ingest into a stored IVF-PQ index — the ANN twin of
  * [[StreamingStoreIngest]]: each micro-batch of (vec_id, embedding) rows
  * is frozen-codebook encoded and appended into the published index
  * through [[Clustering.ivfPqAppendStored]], inside the same
  * [[graft.etl.WriterLease]] lease batch maintenance uses — so searches
  * between micro-batches always see a consistent index (codes + rebuilt
  * zone-map manifest publish under the lease), a concurrent batch
  * appender fails the stream loudly, and a replayed micro-batch is a
  * no-op (vec_id anti-join).
  *
  * The index params must match the original build (the
  * [[Clustering.ivfPqAppendStored]] contract). Centroids/codebook stay
  * frozen across appends; retraining is an offline publish of a NEW
  * run-stamped index dir, not a streaming concern. */
object StreamingIndexIngest {

  def run(vecs: DataFrame, indexDir: String, checkpoint: String,
      m: Int = 4, subDim: Int = 16, cellBits: Int = 6,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Clustering.ivfPqAppendStored(batch, indexDir, m, subDim, cellBits)
        ()
      }
      .start()
}
