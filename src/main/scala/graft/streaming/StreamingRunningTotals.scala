package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running totals through Spark 4's `transformWithState` — the
  * arbitrary-state API that replaces `mapGroupsWithState` (typed state
  * handles with independent lifetimes, per-state TTL, timers, and the
  * RocksDB state store as the backing requirement). This operator is the
  * minimal end-to-end exercise of that surface: one `ValueState` per user
  * carrying (event count, integer-cents total), updated per input row,
  * emitting the post-batch snapshot in Update mode.
  *
  * Why it matters at scale: `transformWithState` state lives in RocksDB
  * (spill-to-disk, changelog checkpointing) rather than the in-heap HDFS
  * store, so per-key running state survives key cardinalities that would
  * OOM `mapGroupsWithState`; the emitted totals are integer-exact, so the
  * final snapshot is bit-comparable to the batch groupBy twin.
  *
  * Batching-invariance rests on `n_events` STRICTLY INCREASING with every
  * emission for a key — so the max-(n_events) row per user is the final
  * state however the fixture splits into micro-batches (see the q47 gate
  * row). Note it does NOT rest on `total_cents` growing: cents =
  * floor(value·100) is negative for negative event values, so the cents
  * total is not monotone in general — consumers must order on `n_events`,
  * never on `total_cents`.
  */
object StreamingRunningTotals {

  case class SpendEvent(user_id: Long, cents: Long)
  case class SpendTotal(user_id: Long, n_events: Long, total_cents: Long)

  /** StatefulProcessor: one ValueState[SpendTotal] per user key. */
  class RunningTotalsProcessor extends StatefulProcessor[Long, SpendEvent, SpendTotal] {
    @transient private var totals: ValueState[SpendTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[SpendTotal](
        "totals", Encoders.product[SpendTotal], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[SpendEvent],
        timerValues: TimerValues): Iterator[SpendTotal] = {
      val prev = if (totals.exists()) totals.get() else SpendTotal(key, 0L, 0L)
      var n = prev.n_events
      var cents = prev.total_cents
      rows.foreach { e => n += 1L; cents += e.cents }
      val next = SpendTotal(key, n, cents)
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** events(user_id, value, …) → running (user_id, n_events, total_cents)
    * snapshots, one emission per (key, micro-batch). Purchase-value cents
    * are floor-quantized BIGINTs, so totals are order-independent and
    * engine-portable. */
  def apply(events: DataFrame): Dataset[SpendTotal] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      .as[SpendEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
