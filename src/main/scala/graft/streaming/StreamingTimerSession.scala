package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Gap-based sessionization through Spark 4's `transformWithState` EVENT-TIME
  * TIMERS — the engine-native answer to append-mode's withheld-tail problem:
  * [[StreamingSession]] (the `session_window` form) only emits a session once
  * the watermark passes its window end, so a finite stream's LAST session per
  * user sits in state forever and the q32 gate row plants sentinel events to
  * flush it — a fixture workaround. Here each open session arms a timer at
  * `session_end` (last event + gap); when the watermark crosses it the engine
  * calls `handleExpiredTimer` and the session emits with NO sentinel. This is
  * the mechanism a production pipeline actually wants: emission latency is
  * the gap (the session is closed the moment the watermark proves no event
  * can extend it), not "whenever the next event for some other reason pushes
  * a window past the watermark".
  *
  * Semantics are q21/q32's, spec- and oracle-pinned:
  *  - INCLUSIVE gap boundary: an event at exactly `end + gap` still merges.
  *  - `session_end` = last event time + gap (the session_window convention).
  *  - A session CLOSED BY A LATER EVENT of the same key (the gap between
  *    them exceeded) emits immediately in that micro-batch — no timer wait.
  *  - The open tail session emits when its timer expires: Spark fires
  *    event-time timers with `expiry <= watermark` (INCLUSIVE — probe- and
  *    spec-pinned; the watermark is the µs max event time floored to ms,
  *    minus the delay, and a timer at exactly the watermark fires).
  *
  * State is ONE fixed-width row per open session per user (start, end,
  * count, armed timer) in the RocksDB store, merged incrementally — at
  * 100 TB scale, state size tracks the number of concurrently-open
  * sessions, never the event count. Timers are re-armed by delete+register
  * as the session extends (at most one live timer per key).
  *
  * Batch-twin contract: on arrival orders that respect event time across
  * micro-batches (always true for a single batch; enforced for multi-batch
  * feeds by the watermark discipline), the emitted set equals the batch
  * gaps-and-islands sessions of the same events, minus open tails whose
  * timers the final watermark never crossed.
  */
object StreamingTimerSession {

  case class SessEvent(user_id: Long, ts_us: Long)
  /** Open-session accumulator; `timer_ms` = the armed timer (-1 none). */
  case class SessAcc(start_us: Long, end_us: Long, n: Long, timer_ms: Long)
  /** Emitted session; µs epoch bounds (end = last event + gap), converted
    * to timestamps by the caller (`timestamp_micros`). */
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  class TimerSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessEvent, SessionOut] {
    @transient private var sess: ValueState[SessAcc] = _
    private val gapUs = gapMs * 1000L

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessAcc](
        "sess", Encoders.product[SessAcc], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[SessEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      // sort the batch's events: gaps-and-islands is order-sensitive and
      // rows within a micro-batch arrive shuffle-ordered
      val ts = rows.map(_.ts_us).toArray
      java.util.Arrays.sort(ts)
      var out = List.empty[SessionOut]
      var acc: SessAcc = if (sess.exists()) sess.get() else null
      ts.foreach { t =>
        if (acc == null) acc = SessAcc(t, t, 1L, -1L)
        else if (t <= acc.end_us + gapUs)
          // inclusive boundary; a within-gap straggler older than the
          // session start extends it downward (batch-twin exactness)
          acc = SessAcc(math.min(acc.start_us, t), math.max(acc.end_us, t),
            acc.n + 1L, acc.timer_ms)
        else {
          out ::= SessionOut(key, acc.start_us, acc.end_us + gapUs, acc.n)
          acc = SessAcc(t, t, 1L, acc.timer_ms)
        }
      }
      if (acc != null) {
        // re-arm the gap timer at the (possibly new) session end; ms grain
        // (the engine's timer clock) — floorDiv so pre-epoch times round
        // the same way the watermark's µs→ms floor does
        val newTimer = Math.floorDiv(acc.end_us, 1000L) + gapMs
        if (acc.timer_ms != newTimer) {
          if (acc.timer_ms >= 0L) getHandle.deleteTimer(acc.timer_ms)
          getHandle.registerTimer(newTimer)
        }
        sess.update(SessAcc(acc.start_us, acc.end_us, acc.n, newTimer))
      }
      out.reverseIterator
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!sess.exists()) return Iterator.empty
      val acc = sess.get()
      // only the session's OWN armed timer closes it — a stale timer from
      // a superseded session end (delete raced an extension) is ignored
      if (expiredTimerInfo.getExpiryTimeInMs() == acc.timer_ms) {
        sess.clear()
        Iterator.single(SessionOut(key, acc.start_us, acc.end_us + gapUs, acc.n))
      } else Iterator.empty
    }
  }

  /** events(user_id, ts, …) → closed sessions, timer-flushed (see class
    * doc). `gapMs` defaults to the q21/q32 30-minute gap. */
  def sessions(events: DataFrame, gapMs: Long = 1800000L,
      watermark: String = "0 seconds"): Dataset[SessionOut] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
