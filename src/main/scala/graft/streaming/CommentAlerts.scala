package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Schemas

/** Comment-alert stream (reference `slack_notifier/slack_notification.py`):
  * consume CDC events, keep those carrying a comment, project the alert
  * message, deliver via a pluggable sink.
  *
  * The reference is a synchronous Python poll loop doing one HTTP POST
  * per event; here it is the same filtered stream as the ingest (S1/S7
  * share the topic) with delivery in `foreachBatch` — batched, retried by
  * the streaming engine, and testable by swapping the sink (SURVEY K6).
  */
object CommentAlerts {

  /** One alert per qualifying event. Predicates follow the notifier:
    * payload.after + id present, comment non-null (P7/P8, :51-60, :119-124);
    * missing name/sport fields default to empty strings like the
    * notifier's `.get(k, default)` (F9, :64-68) — events are delivered,
    * not dropped, when only the optional fields are absent. */
  final case class Alert(id: Int, author: String, pretext: String, text: String)

  /** Envelope → alert projection (valid-envelope predicate + comment
    * filter + message assembly, slack_notification.py:51-72). */
  def alerts(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("value"), Schemas.debeziumEnvelope).as("e"))
      .select(col("e.payload.after").as("a"))
      .filter(col("a").isNotNull && col("a.id").isNotNull)
      .filter(col("a.comment").isNotNull)
      .select(
        col("a.id").as("id"),
        format_string("Auteur: %s %s",
          coalesce(col("a.first_name"), lit("")),
          coalesce(col("a.last_name"), lit(""))).as("author"),
        col("a.comment").as("pretext"),
        format_string("Type d'activité: %s",
          coalesce(col("a.sport_type"), lit(""))).as("text"))

  /** Delivery target, opened once per partition-task: the sink is
    * serialized into the task closure and `deliver` runs ON THE
    * EXECUTORS — alert volume never funnels through the driver, and a
    * webhook sink holds one HTTP connection per partition instead of one
    * global one. Implementations needing per-task setup/teardown (an
    * HTTP client, a producer) do it inside `deliver` around the batch. */
  trait AlertSink extends Serializable {
    def deliver(batch: Seq[Alert]): Unit
  }

  /** Streaming job: JSON-lines dir (or any value:string stream) →
    * filtered alerts → sink, delivered per partition on the executors
    * (the driver only coordinates the micro-batch). */
  def run(spark: SparkSession, raw: DataFrame, sink: AlertSink,
          checkpoint: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    alerts(raw).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.foreachPartition { (it: Iterator[Row]) =>
          val rows = it.map { r =>
            Alert(r.getInt(0), r.getString(1), r.getString(2), r.getString(3))
          }.toSeq
          if (rows.nonEmpty) sink.deliver(rows)
        }
      }
      .start()
}
