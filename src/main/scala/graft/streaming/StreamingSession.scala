package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — gap-based user sessions through the native
  * `session_window` aggregation (Spark's built-in session support; no
  * custom state function needed — the declarative form lets the engine
  * merge/expire session state and is the idiomatic 100 TB shape: state is
  * one (user, open-session) entry, merged map-side per micro-batch).
  *
  * Semantics (spec- and oracle-pinned): an event at `ts` EXTENDS the
  * current session iff `ts <= last_ts + gap` — the boundary is INCLUSIVE
  * (an event exactly `gap` after the previous one still merges), matching
  * the batch `q21_sessionization` contract but at µs grain instead of
  * q21's ms-truncated comparison. `session_end` = last event ts + gap.
  *
  * Append-mode emission: a session row is emitted only once the watermark
  * passes its window end, so a finite fixture's LAST session per user
  * would be withheld forever. The gate query plants one sentinel event per
  * user far (≥ 2× gap) beyond the global max event time: every real
  * session's end then falls below the final watermark and flushes, while
  * the sentinel sessions themselves stay in state — the emitted table is
  * exactly the batch sessionization of the real events.
  */
object StreamingSession {

  /** (user_id, session_start, session_end, n_events) per closed session;
    * `session_end` = last event time + gap (the session_window end). */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
