package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming extension of the reference's batch hourly rollup (SURVEY.md
  * §2.9: the reference is strictly batch; this is the natural Structured
  * Streaming generalization flagged in SURVEY §7). The batch A1–A5
  * semantics map onto a watermarked 1-hour window aggregation; late data
  * beyond the watermark is dropped instead of silently corrupting closed
  * buckets.
  */
object StreamingRollup {

  /** 15-min readings stream → hourly per-key mean/min with a watermark.
    * Works identically on a batch DataFrame (Spark unifies the APIs),
    * which is how the spec cross-checks it against [[graft.operators.HourlyRollup]]. */
  def apply(
      df: DataFrame,
      tsCol: String = "ts",
      idCol: String = "user_id",
      valueCol: String = "value",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    withWm
      .groupBy(window(col(tsCol), "1 hour").as("w"), col(idCol))
      .agg(
        round(avg(col(valueCol)), 7).as(s"${valueCol}_mean"),
        count(lit(1)).as("n_readings"))
      .select(col("w.start").as(tsCol), col(idCol), col(s"${valueCol}_mean"), col("n_readings"))
  }

  /** Hopping-window variant (1h windows every 15min — each event lands in
    * exactly 4 windows): the streaming twin of the batch
    * `q27_sliding_window` query. The value sum is quantized to integer
    * cents so stream and batch agree bit-for-bit regardless of per-window
    * accumulation order. */
  def hopping(
      df: DataFrame,
      tsCol: String = "ts",
      valueCol: String = "value",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    withWm
      .groupBy(window(col(tsCol), "1 hour", "15 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum((col(valueCol) * 100.0).cast("long")).as("sv_cents"))
      .select(col("w.start").as("ws"), col("n_events"), col("sv_cents"))
  }

  /** Per-key session state: custom stateful processing the reference lacks
    * entirely — demonstrates `mapGroupsWithState` for operators windowed
    * aggregation can't express (gap-based sessions). */
  final case class Reading(user_id: Long, tsMillis: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, startMillis: Long, endMillis: Long, n: Long, mean: Double)

  def sessionize(
      readings: Dataset[Reading],
      gapMillis: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[Reading], state: GroupState[SessionState]) => {
          val sorted = rows.toSeq.sortBy(_.tsMillis)
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = state.getOption
          sorted.foreach { r =>
            cur match {
              case Some(s) if r.tsMillis - s.last <= gapMillis =>
                cur = Some(s.copy(last = r.tsMillis, n = s.n + 1, sum = s.sum + r.value))
              case Some(s) =>
                out += SessionOut(user, s.start, s.last, s.n, s.sum / s.n)
                cur = Some(SessionState(r.tsMillis, r.tsMillis, 1, r.value))
              case None =>
                cur = Some(SessionState(r.tsMillis, r.tsMillis, 1, r.value))
            }
          }
          cur match {
            case Some(s) => state.update(s)
            case None => ()
          }
          out.iterator
        })
  }
}
