package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Observable late-data routing — the dead-letter queue every production
  * stream needs and Spark's watermark semantics make INVISIBLE: a
  * watermarked stateful operator silently DROPS rows older than the
  * watermark (SPARK docs, "late data"), so the pipeline can neither audit
  * how much it lost nor replay the losses after a fix. This operator
  * applies the engine's exact advancement rule itself — the watermark
  * for batch N is max(event time seen through batch N−1) − delay — and
  * routes each micro-batch into `ontime/` and `late/` sinks instead of
  * dropping.
  *
  * Replay determinism (the store-ingest family's contract): the watermark
  * consulted by batch N is READ from the tiny `_wm/wm-(N−1)` file
  * recorded after the previous batch — a crash-replayed batch re-reads
  * the same value and re-routes identically, and both sinks write
  * `ingest_batch=<id>` dirs with overwrite, so replay is idempotent. A
  * missing predecessor marker for N > 0 fails loudly (torn state), it is
  * never treated as "no watermark". Marker files publish via temp +
  * atomic move and are named with a zero-padded id (lexicographic =
  * numeric — the label-snapshot rollover lesson).
  *
  * Scale shape: per batch, two predicate-routed writes and one max
  * aggregate — no state store, no shuffle beyond the writes; the
  * watermark is one long of driver state persisted per batch. */
object StreamingLateData {

  private def wmFile(outRoot: String, id: Long) =
    Paths.get(outRoot, "_wm", f"wm-$id%012d")

  /** Start the router. `delayMs` mirrors `withWatermark`'s delay. */
  def run(events: DataFrame, tsCol: String, outRoot: String,
      checkpoint: String, delayMs: Long): StreamingQuery = {
    require(delayMs >= 0, s"negative watermark delay: $delayMs")
    events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val wm: Long =
          if (id == 0L) Long.MinValue
          else {
            val prev = wmFile(outRoot, id - 1)
            require(Files.exists(prev),
              s"late-data router state torn: missing ${prev.toAbsolutePath} " +
                s"for batch $id — the watermark trail must be contiguous")
            new String(Files.readAllBytes(prev), "UTF-8").trim.toLong
          }
        val evMs = unix_millis(col(tsCol))
        batch.filter(evMs < lit(wm))
          .write.mode("overwrite").parquet(s"$outRoot/late/ingest_batch=$id")
        batch.filter(evMs >= lit(wm))
          .write.mode("overwrite").parquet(s"$outRoot/ontime/ingest_batch=$id")
        val bMax = batch.agg(max(unix_millis(col(tsCol)))).head()
        val newWm =
          if (bMax.isNullAt(0)) wm // empty batch: watermark holds
          else math.max(wm, bMax.getLong(0) - delayMs)
        Files.createDirectories(Paths.get(outRoot, "_wm"))
        val tmp = Files.createTempFile(Paths.get(outRoot, "_wm"), ".tmp-wm", "")
        Files.write(tmp, newWm.toString.getBytes("UTF-8"))
        Files.move(tmp, wmFile(outRoot, id),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
