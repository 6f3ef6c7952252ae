package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC current-state maintenance — the streaming twin of
  * [[CdcApply.currentState]]: one `mapGroupsWithState` keeps the latest
  * row image per key across micro-batches, applies tombstones, and
  * ignores late-arriving changes older than the image it already holds
  * (the same latest-change-wins contract the batch operator states).
  *
  * Each batch emits the touched keys' CURRENT image (Update mode) with
  * its `deleted` flag, so a `foreachBatch` sink can upsert/delete
  * downstream — the continuous form of replaying the routed
  * upsert/tombstone tables through a MERGE.
  *
  * Scale: state is one row image per key, hash-partitioned by the
  * groupByKey; out-of-order input costs nothing extra (a timestamp
  * compare); the RocksDB state store holds key images off-heap for
  * 100 TB-stream key cardinalities. Bound retention with a real
  * watermark/TTL policy where keys churn forever.
  */
object StreamingCdcState {

  /** One change-log record: `deleted` = tombstone. */
  final case class Change(id: Long, payload: String, tsMs: Long, deleted: Boolean)

  /** A key's current image (emitted on every batch that touches it). */
  final case class Image(id: Long, payload: String, tsMs: Long, deleted: Boolean)

  /** Latest change in a batch's slice of one key: max (tsMs, deleted) —
    * a tombstone wins a timestamp tie, matching the batch operator's
    * delete-after-upsert ordering on equal keys. */
  private def latest(rows: Iterator[Change]): Change =
    rows.maxBy(c => (c.tsMs, c.deleted))

  def currentState(changes: Dataset[Change]): Dataset[Image] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.id)
      .mapGroupsWithState[Image, Image](GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[Change], state: GroupState[Image]) =>
          val incoming = latest(rows)
          def newer(prev: Image): Boolean =
            incoming.tsMs > prev.tsMs ||
              (incoming.tsMs == prev.tsMs && incoming.deleted && !prev.deleted)
          val next = state.getOption match {
            // late data: the stored image is already newer — keep it
            case Some(prev) if !newer(prev) => prev
            case _ =>
              Image(id, incoming.payload, incoming.tsMs, incoming.deleted)
          }
          state.update(next)
          next
      }
  }

  /** Streaming query wiring: maintain the state against `changes` and
    * publish each batch's touched images to an in-memory table (tests)
    * or swap the format for a real sink. Update mode — exactly what
    * mapGroupsWithState's per-key emission contract requires. */
  def run(changes: Dataset[Change], queryName: String,
          checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    currentState(changes).writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Durable-sink wiring: same state plan, images appended to parquet via
    * `foreachBatch`. Unlike the memory sink this supports RESTART from the
    * checkpoint — the kill-and-resume path a production CDC maintainer
    * needs (state store + offsets recover; the new query instance resumes
    * the latest-image contract exactly where the killed one stopped). */
  def runToParquet(changes: Dataset[Change], outDir: String,
                   checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    currentState(changes).writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[Image], _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
