package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join (⊕ extension): correlate two live
  * event streams — e.g. clicks with the purchases that follow within an
  * attribution window.
  *
  * Both sides carry watermarks and the join predicate bounds the event
  * time distance, so the engine can size and EVICT join state: a click
  * older than (watermark − window) can never match a future purchase and
  * is dropped from state. Without the time-range predicate the state
  * would grow without bound — the #1 stream-join failure mode at scale.
  */
object StreamJoin {

  /** Inner join: each purchase with every click by the same user in the
    * `window` before it (inclusive on the purchase instant). */
  def clicksBeforePurchase(clicks: DataFrame, purchases: DataFrame,
                           window: String = "10 minutes",
                           lateness: String = "1 minute"): DataFrame = {
    val c = clicks
      .withWatermark("ts", lateness)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases
      .withWatermark("ts", lateness)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("purchase_ts"), col("click_ts"))
  }

  /** Left-outer variant: EVERY purchase emits — joined to its in-window
    * clicks when they exist, null-padded otherwise. The null-padded row
    * is only released once the click-side watermark passes the end of
    * the purchase's match window (before that a matching click could
    * still arrive), so unmatched results trail live ones by up to
    * `window` + `lateness` of event time — the correctness/latency trade
    * outer stream joins inherently make. State sizing and eviction are
    * identical to the inner form: the time-range predicate bounds both
    * sides' retained state.
    */
  def clicksBeforePurchaseOuter(clicks: DataFrame, purchases: DataFrame,
                                window: String = "10 minutes",
                                lateness: String = "1 minute"): DataFrame = {
    val c = clicks
      .withWatermark("ts", lateness)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases
      .withWatermark("ts", lateness)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window"),
      "left_outer")
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("purchase_ts"), col("click_ts"))
  }
}
