package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking (extension beyond
  * reference parity — SURVEY §2.10 records the reference has no
  * event-time logic; a 100 TB event pipeline needs it).
  *
  * Pure `DataFrame => DataFrame` over the `events` shape
  * (`ts: timestamp, event_type: string, value: double`), so the same
  * plan runs batch (tests, backfill) and streaming (`readStream`) —
  * Structured Streaming's core contract.
  *
  * Scale notes:
  *   - the watermark bounds state: windows older than max(event time) −
  *     delay are finalized and evicted, so state size is
  *     O(active windows × groups), independent of stream length;
  *   - tumbling windows partition events — each event lands in exactly
  *     one window, so the aggregation is a plain hash-agg with map-side
  *     partials; sliding windows replicate rows (slide < width) and cost
  *     width/slide × the state;
  *   - in append mode results emit once, on window close — the mode that
  *     composes with downstream file sinks at scale.
  */
object WindowedStats {

  /** Tumbling per-`event_type` counts/sums over `width` windows,
    * tolerating `lateness` of out-of-order data. */
  def tumblingTypeCounts(events: DataFrame, width: String = "1 hour",
                         lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
}
