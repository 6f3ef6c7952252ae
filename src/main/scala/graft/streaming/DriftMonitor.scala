package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor (⊕ extension): the continuous
  * twin of the batch drift audit (`q10_drift_bins`) — per event-time
  * window and event type, compare the live `value` distribution
  * against a reference histogram and flag windows whose shift exceeds
  * a threshold. This is the guard a 100 TB ingest runs BETWEEN the
  * pipeline and the training corpus: upstream schema slips, unit
  * changes, and bot floods all show up as binned-distribution drift
  * long before they show up in model metrics.
  *
  * Scale/streaming design:
  *   - ONE stateful aggregation. The histogram is a fixed `nBins` grid
  *     folded as `nBins` conditional sums inside a single
  *     `groupBy(window, type)` — never a `(window, type, bin)` rollup
  *     that would need a second streaming aggregation (chained
  *     stateful aggs are where append-mode correctness goes to die)
  *     and never a per-window collect. State per key is O(nBins)
  *     longs; total state is windows-in-flight × |types|.
  *   - the reference is a TINY (|types| rows) table broadcast-joined
  *     AFTER the aggregate — on |windows|·|types| rows, not the
  *     stream.
  *   - drift statistic: total-variation distance
  *     TVD = ½ Σᵢ |pᵢ − qᵢ| over the bin grid — bounded [0, 1],
  *     zero iff the histograms agree, robust to empty bins (no
  *     log-of-zero smoothing constants to tune, unlike PSI/KL), and
  *     computed with array HOFs from the one aggregate's output.
  *
  * Same plan runs batch (tests, backfill) and streaming (`readStream`)
  * — the `WindowedStats` contract. In streaming mode attach a
  * watermark via `withWatermark` before calling, and windows emit once
  * closed (append mode).
  */
object DriftMonitor {

  /** Bin index of `value` on the fixed grid: `nBins` equal cells over
    * [lo, hi), clamped at the edges (everything below lo → bin 0,
    * ≥ hi → bin nBins−1) so the histogram is total. */
  def binOf(value: Column, nBins: Int, lo: Double, hi: Double): Column = {
    require(hi > lo, s"histogram grid needs hi > lo, got [$lo, $hi) — " +
      "a zero-width grid divides by zero and silently nulls every bin")
    val w = (hi - lo) / nBins
    least(greatest(floor((value - lit(lo)) / lit(w)), lit(0)),
      lit(nBins - 1)).cast("int")
  }

  /** Per (event-time window, event_type): n_events plus the binned
    * histogram as one `array<bigint>` column — a single aggregation,
    * safe in streaming append mode with a watermark upstream. */
  def windowedHistogram(events: DataFrame, nBins: Int, lo: Double,
                        hi: Double, windowDur: String): DataFrame = {
    require(nBins >= 1, s"need at least one bin, got $nBins")
    val bin = binOf(col("value"), nBins, lo, hi)
    val cells = (0 until nBins).map(i =>
      sum(when(bin === i, 1L).otherwise(0L)).as(s"b$i"))
    events
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), cells: _*)
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("event_type"), col("n_events"),
        array((0 until nBins).map(i => col(s"b$i")): _*).as("hist"))
  }

  /** Flag windows whose live histogram drifts from `reference`
    * (`event_type`, `p_ref: array<double>` — shares on the same grid,
    * one row per type; broadcast). Emits one row per closed window per
    * type with the TVD and the `drifted` verdict. */
  def drift(events: DataFrame, reference: DataFrame, nBins: Int,
            lo: Double, hi: Double, windowDur: String,
            threshold: Double): DataFrame = {
    val hist = windowedHistogram(events, nBins, lo, hi, windowDur)
    hist
      .join(broadcast(reference), Seq("event_type"))
      // grid-shape guard: `p_ref` is DATA, so a reference row whose
      // array is not on this nBins grid can't be caught by require() —
      // and zip_with would silently TRUNCATE to the shorter array,
      // yielding a wrong TVD. The guard lives INSIDE the tvd
      // expression (an unused assert column would be pruned away), so
      // a malformed reference row fails the query instead of lying.
      .withColumn("tvd",
        aggregate(
          zip_with(col("hist"),
            when(size(col("p_ref")) === lit(nBins), col("p_ref"))
              .otherwise(raise_error(concat(
                lit(s"p_ref must have $nBins entries, got "),
                size(col("p_ref")).cast("string")))),
            (n, p) => abs(n.cast("double") / col("n_events").cast("double") - p)),
          lit(0.0), (acc, x) => acc + x) / lit(2.0))
      .select(col("window_start"), col("window_end"), col("event_type"),
        col("n_events"), col("tvd"),
        (col("tvd") > lit(threshold)).as("drifted"))
  }
}
