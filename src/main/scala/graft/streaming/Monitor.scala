package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Stream progress monitor (K7; reference `spark/SaveDelta.scala:176-255`).
  *
  * The reference runs a driver `while` loop that sleeps 30 s, re-reads
  * the sink table from S3, and diffs counts — a full table scan per poll.
  * The idiomatic Spark shape is a [[StreamingQueryListener]]: the engine
  * pushes `numInputRows`/`processedRowsPerSecond` per micro-batch, so
  * reconciliation costs nothing and can't race the sink.
  */
final class Monitor extends StreamingQueryListener {
  import Monitor.BatchStats

  private val batches = ArrayBuffer.empty[BatchStats]

  @volatile var totalInputRows: Long = 0L

  def history: Seq[BatchStats] = batches.synchronized(batches.toSeq)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    batches.synchronized {
      batches += BatchStats(p.batchId, p.numInputRows,
        p.inputRowsPerSecond, p.processedRowsPerSecond)
    }
    totalInputRows += p.numInputRows
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}

object Monitor {
  /** One micro-batch's progress snapshot (top-level so pattern matches
    * need no outer-instance check). */
  final case class BatchStats(batchId: Long, numInputRows: Long,
                              inputRowsPerSecond: Double,
                              processedRowsPerSecond: Double)

  /** Attach a fresh monitor to the session; caller detaches via
    * `spark.streams.removeListener`. */
  def attach(spark: SparkSession): Monitor = {
    val m = new Monitor
    spark.streams.addListener(m)
    m
  }
}
