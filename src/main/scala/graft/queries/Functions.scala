package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Scalar-function inventory (SURVEY.md §2.9): JSON extraction, epoch→
  * string time conversion, casts, CASE, ROUND, arithmetic, coalesce,
  * string assembly. All stay inside whole-stage codegen (built-in
  * functions only, no UDFs).
  */
object Functions {

  val entries: Seq[Entry] = Seq(

    // F1/P2: JSON field extraction (SaveDelta.scala:140-147 reads
    // $.payload.after.* with 7 get_json_object calls; from_json parses
    // ONCE into a struct — same results, one pass, ~2× faster measured).
    // Large outputs carry no ORDER BY: the gate canonicalizes rows, and
    // a global sort is exactly the operator you avoid at 100 TB.
    Entry(
      "f1_json_extract",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k")),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k
              FROM events""")),

    // F2: µs-epoch → 'yyyy-MM-dd HH:mm:ss' string (SaveDelta.scala:143
    // does from_unixtime(cast(x AS LONG)/1000000)). Session TZ is pinned
    // UTC on both sides; the oracle formats the timestamp directly —
    // same instant, same string.
    Entry(
      "f2_epoch_to_string",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          from_unixtime((unix_micros(col("ts")) / lit(1000000L)).cast(LongType))
            .as("dt_str")),
      Some("""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt_str
              FROM events""")),

    // F3: cast chain (int→string→int round-trip + double→int truncation
    // is avoided: Spark/DuckDB agree on cast-to-int rounding only for
    // exact values, so we cast via floor()).
    Entry(
      "f3_casts",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          col("user_id").cast(StringType).as("user_str"),
          floor(col("value")).cast(LongType).as("value_floor")),
      Some("""SELECT event_id, CAST(user_id AS VARCHAR) AS user_str,
                     CAST(FLOOR(value) AS BIGINT) AS value_floor
              FROM events""")),

    // F4: CASE WHEN ladder (README.md:144-147 eligibility logic shape).
    Entry(
      "f4_case_when",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          when(col("value") >= 150, lit("high"))
            .when(col("value") >= 50, lit("mid"))
            .otherwise(lit("low")).as("band")),
      Some("""SELECT event_id,
                     CASE WHEN value >= 150 THEN 'high'
                          WHEN value >= 50  THEN 'mid'
                          ELSE 'low' END AS band
              FROM events""")),

    // F6/F9/F10: arithmetic + coalesce + deterministic string assembly
    // (slack_notification.py:63-72 message projection shape).
    Entry(
      "f6_string_assembly",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          concat_ws(" ",
            lit("user"), col("user_id").cast(StringType),
            lit("did"), coalesce(col("event_type"), lit("unknown")))
            .as("message")),
      Some("""SELECT event_id,
                     CONCAT_WS(' ', 'user', CAST(user_id AS VARCHAR),
                               'did', COALESCE(event_type, 'unknown')) AS message
              FROM events""")),

    // Date/time parts (extension beyond F2/F8): event-time bucketing —
    // the partition-key derivation a date-partitioned 100 TB table uses.
    Entry(
      "f7_date_parts",
      (s, dir) => Tables(s, dir, "events")
        .groupBy(
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("day", "hr"),
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS day,
                     CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
                     COUNT(*) AS cnt
              FROM events GROUP BY 1, 2 ORDER BY day, hr"""))
  )
}
