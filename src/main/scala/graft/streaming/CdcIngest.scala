package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.core.Schemas

/** Streaming CDC ingest (SURVEY E1; reference `spark/SaveDelta.scala`):
  * Debezium-envelope JSON → typed activity rows → append sink.
  *
  * Spark-first restructuring of the reference job:
  *   - ONE `from_json` against the envelope schema instead of seven
  *     `get_json_object` calls (SaveDelta.scala:140-147) — one parse per
  *     event instead of seven, same columns, same nulls on malformed
  *     input;
  *   - the µs-epoch conversion keeps the reference's exact string
  *     semantics (`from_unixtime(cast(x as long)/1000000)`,
  *     SaveDelta.scala:143): a STRING `yyyy-MM-dd HH:mm:ss` in the
  *     session TZ (pinned UTC), including its int→double `distance`
  *     drift (:146);
  *   - null-id filter drops malformed/tombstone events (:149);
  *   - sink stays `append` + checkpoint + processing-time trigger
  *     (:157-163) — exactly-once via offset tracking + idempotent file
  *     commit. Kafka in prod is the same `readStream` with
  *     `format("kafka")`; tests use the file source so the pipeline is
  *     hermetic (no broker in this environment).
  *
  * Scale: stateless map-only pipeline — no watermark, no shuffle; it
  * scales with source partitions (Kafka partitions / files per batch).
  */
object CdcIngest {

  /** Typed projection of one row image (payload.after or payload.before)
    * plus the change kind (and any extra envelope columns, e.g. the
    * change timestamp the apply step orders by). */
  private def projectImage(parsed: DataFrame,
                           extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
    parsed
      .select(Seq(
        col("op"),
        col("img.id").cast(IntegerType).as("id"),
        col("img.id_employee").cast(IntegerType).as("id_employee"),
        from_unixtime(
          (col("img.start_datetime").cast(LongType) / lit(1000000L)).cast(LongType))
          .as("start_datetime"),
        col("img.sport_type").as("sport_type"),
        col("img.activity_duration").cast(IntegerType).as("activity_duration"),
        col("img.distance").cast(DoubleType).as("distance"),
        col("img.comment").as("comment")) ++ extra: _*)
      .filter(col("id").isNotNull)

  /** Full change-log parse: every event with a usable row image, tagged
    * with its Debezium `op` (`c`/`r`/`u` carry payload.after; `d`
    * carries payload.before — SaveDelta.scala:140-147 reads after only
    * and silently drops deletes; a CDC engine at scale must surface
    * them). Events with neither image or a NULL id are dropped as
    * malformed, matching the reference's null-id filter (:149).
    *
    * Carries the envelope's `ts_ms` change timestamp: downstream
    * [[CdcApply]] needs the CHANGE order, not the row image's business
    * timestamp — a delete's before-image keeps the original
    * start_datetime, so replaying on it would mis-order
    * upsert→delete→re-insert sequences. */
  def parseChangeLog(raw: DataFrame): DataFrame =
    projectImage(raw
      .select(from_json(col("value"), Schemas.debeziumEnvelope).as("e"))
      .select(
        col("e.payload.op").as("op"),
        when(col("e.payload.op") === "d", col("e.payload.before"))
          .otherwise(col("e.payload.after")).as("img"),
        col("e.payload.ts_ms").as("ts_ms")),
      extra = Seq(col("ts_ms")))

  /** Envelope parse + projection of the INSERT stream — the exact
    * reference semantics (payload.after only, deletes/tombstones
    * dropped): the logical plan both batch tests and the stream share.
    * Input: a DataFrame with a string `value` column (Kafka value /
    * file line). */
  def parseEnvelope(raw: DataFrame): DataFrame =
    projectImage(raw
      .select(from_json(col("value"), Schemas.debeziumEnvelope).as("e"))
      .select(col("e.payload.op").as("op"), col("e.payload.after").as("img")))
      .drop("op")

  /** Envelope schema-drift audit: which incoming change records carry
    * image fields the declared schema does NOT know about, and how
    * many. `from_json` against a declared schema silently DROPS
    * unknown fields — correct for parsing, fatal for operations: an
    * upstream `ALTER TABLE ADD COLUMN` turns into silent data loss the
    * moment Debezium starts shipping the new field. This audit is the
    * detection half of schema evolution: run it next to the ingest
    * (same raw stream, `foreachBatch` or a parallel batch sweep), page
    * on first sight, then widen the declared schema — old rows read
    * null for the new column (parquet mergeSchema semantics,
    * SourcesSinksSuite).
    *
    * Expression-only and aggregate-small: keys come from
    * `json_object_keys` on the op-selected image (deletes carry
    * `before`), the set difference against the declared field list is
    * computed map-side, and only records WITH unknown fields reach the
    * ≤|distinct key-sets| aggregate. */
  def schemaDriftAudit(raw: DataFrame): DataFrame = {
    val declared = Schemas.debeziumAfter.fieldNames.toSeq
    val img = when(
      get_json_object(col("value"), "$.payload.op") === "d",
      get_json_object(col("value"), "$.payload.before"))
      .otherwise(get_json_object(col("value"), "$.payload.after"))
    raw
      .select(json_object_keys(img).as("keys"))
      .filter(col("keys").isNotNull)
      .select(array_sort(array_except(col("keys"),
        array(declared.map(lit): _*))).as("unknown"))
      .filter(size(col("unknown")) > 0)
      .groupBy(array_join(col("unknown"), ",").as("unknown_keys"))
      .agg(count(lit(1)).as("n_records"))
  }

  /** Streaming source of Debezium JSON lines from a directory (stands in
    * for the Kafka topic; same `value: string` contract — S1/S7). */
  def readJsonLines(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .format("text")
      .load(dir)

  /** Kafka source for production (S1 — SaveDelta.scala:104-112). Kept as
    * a separate constructor: same downstream plan. Requires the
    * spark-sql-kafka connector on the classpath. */
  def readKafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** K1 append sink: parquet/delta path + checkpoint + trigger.
    * `AvailableNow` in tests (drain-and-stop, no wall clock — SURVEY
    * §7.4-R4); `ProcessingTime(30s)` in production matches the
    * reference's cadence. */
  def appendSink(parsed: DataFrame, path: String, checkpoint: String,
                 format: String = "parquet",
                 trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    parsed.writeStream
      .format(format)
      .outputMode("append")
      .option("path", path) // bound here — callers just .start()
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)

  /** Full ingest: JSON-lines dir → parsed append to `outPath`. Returns
    * the started query; callers `awaitTermination`. */
  def run(spark: SparkSession, inDir: String, outPath: String,
          checkpoint: String): StreamingQuery =
    appendSink(parseEnvelope(readJsonLines(spark, inDir)), outPath, checkpoint)
      .start()

  /** Op-routed ingest: upserts (`c`/`r`/`u`) append to `outPath`,
    * deletes (`d`, row image from payload.before) append to
    * `tombstonePath` — ONE source read and one parse per batch, split
    * inside `foreachBatch` (two independent streams would read and parse
    * the topic twice). The tombstone table is what a downstream MERGE
    * replays to apply deletions; the reference drops them on the floor.
    *
    * Exactly-once note: `foreachBatch` file appends are at-least-once
    * under batch retry (no per-sink transaction log like the single-sink
    * path); downstream consumers dedup on (id, op, start_datetime) or
    * MERGE idempotently — the standard multi-sink CDC trade. */
  def runRouted(spark: SparkSession, inDir: String, outPath: String,
                tombstonePath: String, checkpoint: String,
                format: String = "parquet",
                trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    parseChangeLog(readJsonLines(spark, inDir)).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // cache: the batch feeds two sinks; without it the file-source
        // batch re-reads and re-parses per sink
        batch.persist()
        try {
          batch.filter(col("op") =!= "d" || col("op").isNull).drop("op")
            .write.format(format).mode("append").save(outPath)
          val dels = batch.filter(col("op") === "d").drop("op")
          if (!dels.isEmpty)
            dels.write.format(format).mode("append").save(tombstonePath)
        } finally batch.unpersist()
      }
      .start()
}
