package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Gap-based sessionization through Spark 4's `transformWithState` EVENT-TIME
  * TIMERS — the engine-native answer to append-mode's withheld-tail problem:
  * [[StreamingSession]] (the `session_window` form) only emits a session once
  * the watermark passes its window end, so a finite stream's LAST session per
  * user sits in state forever and the q32 gate row plants sentinel events to
  * flush it — a fixture workaround. Here each open session arms a timer at
  * `session_end` (last event + gap); when the watermark crosses it the engine
  * calls `handleExpiredTimer` and the session emits with NO sentinel. This is
  * the mechanism a production pipeline actually wants: emission latency is
  * the gap plus the watermark lag (a session closes the moment the watermark
  * proves no admissible event can extend it), not "whenever the next event
  * for some other reason pushes a window past the watermark".
  *
  * Semantics are q21/q32's, spec- and oracle-pinned:
  *  - INCLUSIVE gap boundary: an event at exactly `end + gap` still merges.
  *  - `session_end` = last event time + gap (the session_window convention).
  *  - EVERY emission is watermark-driven: a session emits exactly when the
  *    watermark reaches its `end + gap` deadline (a session "closed" by a
  *    later same-user event has its deadline strictly below that event's
  *    time, so the watermark crosses it as soon as the event's time enters
  *    the watermark — no separate eager-emission path). Spark fires
  *    event-time timers with `expiry <= watermark` (INCLUSIVE — probe- and
  *    spec-pinned; the watermark is the µs max event time floored to ms,
  *    minus the delay, and a timer at exactly the watermark fires).
  *  - OUT-OF-ORDER arrivals the watermark admits are exact: state holds the
  *    LIST of gap-separated islands still above the watermark, so a
  *    straggler more than a gap OLDER than the open session's start forms
  *    (or extends) its own earlier island instead of silently fusing into
  *    the newer one, and a bridging straggler merges adjacent islands —
  *    batch gaps-and-islands semantics verbatim (review finding r12; the
  *    earlier single-value-state design took `min(start, t)`
  *    unconditionally, which is only correct for event-time-ordered feeds).
  *
  * State is a fixed-width row PER PENDING ISLAND per user in the RocksDB
  * store (one for in-order feeds; more only while admitted disorder is in
  * flight, and every island's deadline sits above the watermark, so the
  * list length is bounded by the watermark delay over the gap) — at 100 TB
  * scale, state size tracks the number of concurrently-open sessions, never
  * the event count. Timers are REGISTER-ONLY: re-arming registers the new
  * deadline and leaves the stale one to fire as a harmless empty sweep
  * (deleting could drop an expiry another island of the same key shares);
  * each sweep emits every island whose deadline the watermark has crossed,
  * so a stale firing can only emit sessions that are due anyway.
  *
  * Batch-twin contract: the emitted set equals the batch gaps-and-islands
  * sessions over the ADMITTED events (the engine drops rows below the
  * watermark before the operator), minus islands whose deadline the final
  * watermark never crossed. Sole boundary caveat: an event arriving at
  * exactly `end + gap` of a session in the same millisecond its deadline
  * fires lands in a fresh island rather than the just-emitted one.
  */
object StreamingTimerSession {

  case class SessEvent(user_id: Long, ts_us: Long)
  /** Pending (not yet emitted) island; `timer_ms` = the deadline this
    * island last REGISTERED a timer at (-1 none) — registration bookkeeping
    * only, stale timers are never deleted (see class doc). */
  case class SessAcc(start_us: Long, end_us: Long, n: Long, timer_ms: Long)
  /** Emitted session; µs epoch bounds (end = last event + gap), converted
    * to timestamps by the caller (`timestamp_micros`). */
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  class TimerSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessEvent, SessionOut] {
    @transient private var islands: ListState[SessAcc] = _
    private val gapUs = gapMs * 1000L

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      islands = getHandle.getListState[SessAcc](
        "islands", Encoders.product[SessAcc], TTLConfig.NONE)

    private def deadlineMs(isl: SessAcc): Long =
      // ms grain (the engine's timer clock) — floorDiv so pre-epoch times
      // round the same way the watermark's µs→ms floor does
      Math.floorDiv(isl.end_us, 1000L) + gapMs

    override def handleInputRows(
        key: Long,
        rows: Iterator[SessEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      // sort the batch's events: gaps-and-islands is order-sensitive and
      // rows within a micro-batch arrive shuffle-ordered
      val ts = rows.map(_.ts_us).toArray
      java.util.Arrays.sort(ts)
      if (ts.isEmpty) return Iterator.empty
      // pending islands, ascending by start, pairwise more than a gap apart
      // (the stored invariant); fold each event into the first island that
      // can reach it, else insert a fresh one — a merge can bridge into the
      // NEXT island (the straggler that closes a gap between two)
      val buf = scala.collection.mutable.ArrayBuffer.empty[SessAcc]
      islands.get().foreach(buf += _)
      ts.foreach { t =>
        var i = 0
        while (i < buf.length && buf(i).end_us + gapUs < t) i += 1
        if (i == buf.length || t < buf(i).start_us - gapUs)
          buf.insert(i, SessAcc(t, t, 1L, -1L))
        else {
          buf(i) = SessAcc(math.min(buf(i).start_us, t),
            math.max(buf(i).end_us, t), buf(i).n + 1L, buf(i).timer_ms)
          while (i + 1 < buf.length &&
              buf(i + 1).start_us <= buf(i).end_us + gapUs) {
            val a = buf(i); val b = buf(i + 1)
            buf(i) = SessAcc(a.start_us, math.max(a.end_us, b.end_us),
              a.n + b.n, math.max(a.timer_ms, b.timer_ms))
            buf.remove(i + 1)
          }
        }
      }
      // (re-)arm: one registered timer per island at its current deadline
      val armed = buf.map { isl =>
        val d = deadlineMs(isl)
        if (isl.timer_ms != d) {
          getHandle.registerTimer(d)
          SessAcc(isl.start_us, isl.end_us, isl.n, d)
        } else isl
      }
      islands.clear()
      islands.put(armed.toArray)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      // sweep by DEADLINE, not by matching the fired expiry: any firing
      // (including a stale one from a superseded deadline) emits exactly
      // the islands the watermark has proven closed. The max() guards
      // against an engine reporting the pre-advance watermark during
      // timer processing — a fired timer's expiry is itself a watermark
      // lower bound (expiry <= wm is the firing condition).
      val wm = math.max(timerValues.getCurrentWatermarkInMs(),
        expiredTimerInfo.getExpiryTimeInMs())
      val buf = scala.collection.mutable.ArrayBuffer.empty[SessAcc]
      islands.get().foreach(buf += _)
      val (closed, open) = buf.partition(deadlineMs(_) <= wm)
      if (closed.isEmpty) Iterator.empty
      else {
        islands.clear()
        if (open.nonEmpty) islands.put(open.toArray)
        closed.sortBy(_.start_us).iterator.map(isl =>
          SessionOut(key, isl.start_us, isl.end_us + gapUs, isl.n))
      }
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
