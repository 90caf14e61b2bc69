package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-user distinct-event-type counting through `transformWithState`
  * with MAP state — the composite-state surface [[StreamingRunningTotals]]
  * (one ValueState) doesn't touch: one `MapState[String, Long]` per user
  * holding (event_type → count), updated per row, emitting the post-batch
  * (n_types, n_events) snapshot in Update mode.
  *
  * Why MapState and not a ValueState[Map[..]]: RocksDB stores each map
  * ENTRY as its own key-value pair, so updating one event type rewrites
  * one entry, not the whole map — the difference between O(1) and
  * O(types-per-user) write amplification per row, which is what makes
  * per-key composite state (feature maps, per-source counters, session
  * catalogs) viable at high key cardinality.
  *
  * Batching-invariance: `n_events` strictly increases with every emission
  * for a key (each batch emission counts ≥ 1 new row), so max-(n_events)
  * per user is the final state regardless of how the fixture splits into
  * micro-batches — the q47 consumer contract, inherited verbatim.
  */
object StreamingTypeCounts {

  case class TypedEvent(user_id: Long, event_type: String)
  case class TypeSnapshot(user_id: Long, n_types: Long, n_events: Long)

  class TypeCountsProcessor extends StatefulProcessor[Long, TypedEvent, TypeSnapshot] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "typeCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "nEvents", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[TypeSnapshot] = {
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { e =>
        val prev = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, prev + 1L)
        n += 1L
      }
      seen.update(n)
      var types = 0L
      val it = counts.keys()
      while (it.hasNext) { it.next(); types += 1L }
      Iterator.single(TypeSnapshot(key, types, n))
    }
  }

  /** events(user_id, event_type, …) → per-batch (user_id, n_types,
    * n_events) snapshots; the max-n_events row per user equals the batch
    * (count distinct type, count) aggregate. */
  def apply(events: DataFrame): Dataset[TypeSnapshot] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("event_type"))
      .as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new TypeCountsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
