package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time sessionization with `session_window` + watermark
  * (extension beyond reference parity, SURVEY §2.10 — the streaming twin
  * of the batch `w2_sessionize` gap-split).
  *
  * A session window grows while events keep arriving within `gap` of the
  * session's current end and closes when the gap expires — the native
  * Spark primitive (Structured Streaming session windows, Spark 3.2+)
  * for "visit" analytics, replacing the batch lag()-cumsum idiom with
  * state the engine merges incrementally.
  *
  * Scale notes:
  *   - state is one in-flight session per (user, open window), merged by
  *     the session-window aggregation as adjacent events arrive — NOT
  *     the full event history; the watermark closes and EVICTS sessions
  *     whose end precedes max(event time) − lateness, so state is
  *     O(active users), independent of stream length;
  *   - the aggregation shuffles once on the grouping key (user_id) —
  *     the same key a downstream per-user join would want;
  *   - append mode emits each session exactly once, on close — the only
  *     mode session_window supports with watermarks, and the right one:
  *     a session is immutable once the gap has provably expired.
  *
  * Pure `DataFrame => DataFrame` over the `events` shape, so the same
  * plan runs batch (oracle comparison in SessionizeSuite) and streaming
  * (`readStream` + checkpoint).
  */
object Sessionize {

  /** Per-user gap-sessions: (user_id, session_start, session_end,
    * n_events, sum_value), one row per closed session.
    *
    * Batch runs emit every session (nothing stays open); streaming runs
    * emit sessions the watermark has closed. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"), col("sum_value"))
}
