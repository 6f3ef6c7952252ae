package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming approximate quantiles — the continuous twin of the batch
  * GK path (`a21_approx_percentiles`): one `mapGroupsWithState` folds a
  * fixed-width HISTOGRAM per key across micro-batches and emits the
  * quantile read off the cumulative histogram after every batch.
  *
  * Why a histogram and not GK/t-digest here: the state must be (a)
  * mergeable across micro-batches, (b) bounded, and (c) DETERMINISTIC
  * under any batch slicing — a fixed bin grid gives all three, and its
  * error contract is transparent: the reported quantile is the inclusive
  * upper edge of the bin where the cumulative count crosses ⌈q·n⌉, so
  * the error is ≤ `binWidth` in value space, regardless of arrival
  * order (StreamingExtSuite pins batch-slicing invariance).
  *
  * Scale: state per key = one count per OCCUPIED bin (≤ value-range /
  * binWidth entries, micro-point keys, no raw values retained); keys
  * hash-partition; the per-batch fold touches only arriving rows. For
  * unbounded-range values, compose with an upstream clamp or a
  * log-spaced outer grid (the lateness-profile bucketing pattern).
  */
object StreamingQuantiles {

  final case class Obs(key: String, vMicro: Long)

  /** One quantile readout per (key, batch): `n` observations so far,
    * quantile = upper edge of the crossing bin, in micro-points. */
  final case class QuantileState(key: String, n: Long, qMicro: Long)

  /** `binWidthMicro`: bin grid in micro-points; `q`: target quantile. */
  def quantileStream(obs: Dataset[Obs], q: Double,
                     binWidthMicro: Long): Dataset[QuantileState] = {
    require(q > 0 && q < 1, s"quantile must be in (0,1), got $q")
    require(binWidthMicro > 0, s"binWidthMicro must be positive")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .mapGroupsWithState[Map[Long, Long], QuantileState](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Obs], state: GroupState[Map[Long, Long]]) =>
          val hist = rows.foldLeft(state.getOption.getOrElse(Map.empty)) {
            (h, o) =>
              // floorDiv: negative values land in their own bins, never bin 0
              val bin = Math.floorDiv(o.vMicro, binWidthMicro)
              h.updated(bin, h.getOrElse(bin, 0L) + 1L)
          }
          state.update(hist)
          val n = hist.valuesIterator.sum
          val target = math.ceil(q * n).toLong max 1L
          // walk bins in order until the cumulative count crosses target;
          // bins are few (bounded grid) so the sort is cheap driver-free
          // executor work per touched key
          var cum = 0L
          var crossing = Long.MinValue
          val it = hist.toSeq.sortBy(_._1).iterator
          while (cum < target && it.hasNext) {
            val (bin, c) = it.next(); cum += c; crossing = bin
          }
          QuantileState(key, n, (crossing + 1L) * binWidthMicro)
      }
  }

  def run(obs: Dataset[Obs], q: Double, binWidthMicro: Long,
          queryName: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    quantileStream(obs, q, binWidthMicro).writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .start()
}
