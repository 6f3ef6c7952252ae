package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions

/** Streaming deduplication (extension beyond reference parity): the
  * streaming side of [[graft.operators.Dedup.exact]] for a continuous
  * document feed — first sighting of a fingerprint passes, repeats drop.
  *
  * Two implementations, both keyed on the normalized-text fingerprint so
  * state never holds document bytes:
  *
  *   - [[exactWithinWatermark]]: built-in `dropDuplicatesWithinWatermark`
  *     — state for a key is evicted once the watermark passes its event
  *     time + delay, which bounds state for unbounded streams and is the
  *     form to reach for first;
  *   - [[exactStateful]]: `flatMapGroupsWithState` with processing-time
  *     timeout — the custom-state escape hatch (KeyValueGroupedDataset),
  *     here also counting suppressed repeats per key, which the built-in
  *     cannot express.
  *
  * Scale: state is per-key (16-byte fingerprint + long), hash-partitioned
  * across executors by the groupBy; the RocksDB state store holds it off
  * the JVM heap at 100 TB stream lengths.
  */
object StreamingDedup {

  /** Row emitted by [[exactStateful]] on a key's FIRST sighting. */
  final case class FirstSeen(fp: String, doc_id: Long)

  /** Per-key dedup state: first doc id + how many repeats were dropped. */
  final case class DedupState(firstDocId: Long, suppressed: Long)

  /** Fingerprint projection shared by both variants: the stream analogue
    * of the batch exact-dedup key. Input needs `doc_id`, `text`, `ts`. */
  def fingerprinted(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("ts"),
      TextFunctions.fingerprint(col("text")).as("fp"))

  /** First-sighting-wins dedup with watermark-bounded state. Emits each
    * fingerprint's first-arriving row; duplicates within `delay` of the
    * watermark are suppressed; state for older keys is evicted. */
  def exactWithinWatermark(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    fingerprinted(docs)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Custom-state dedup via flatMapGroupsWithState: emits (fp, doc_id) on
    * first sighting only, keeps a suppressed-repeat count per key, and —
    * when `stateTtlMs > 0` — drops idle state after that much processing
    * time. TTL 0 keeps state forever (NoTimeout); note that with a
    * processing-time timeout the engine schedules extra batches to
    * evaluate expirations, so `processAllAvailable` never settles — use
    * TTL only with a real trigger. */
  def exactStateful(docs: DataFrame, stateTtlMs: Long = 0L): Dataset[FirstSeen] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    fingerprinted(docs)
      .select(col("fp"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DedupState, FirstSeen](OutputMode.Append, timeout) {
        (fp: String, rows: Iterator[(String, Long)], state: GroupState[DedupState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = rows.map(_._2).toSeq
            val out = if (state.exists) {
              state.update(DedupState(state.get.firstDocId,
                state.get.suppressed + ids.size))
              Iterator.empty
            } else {
              // First batch for this key: min doc_id wins — the iterator
              // order across source partitions is not deterministic, so
              // taking the head would make retries/task reruns diverge;
              // min matches the batch twin (Dedup.exact's survivor rule).
              val first = ids.min
              state.update(DedupState(first, ids.size - 1L))
              Iterator.single(FirstSeen(fp, first))
            }
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out
          }
      }
  }
}
