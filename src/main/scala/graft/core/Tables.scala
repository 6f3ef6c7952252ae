package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated TPC-H-ish parquet tables
  * (`/root/testdata/sf*`; see TESTDATA.md). One parquet file per table.
  *
  * All inventory queries read through here so that the scan layer stays in
  * one place: at 100 TB these would be partitioned/bucketed Delta tables
  * and this object is the only code that would change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Plain parquet scan. Catalyst pushes filters/projections into this scan
    * (verify via `.explain`: `PushedFilters`, `ReadSchema`).
    *
    * `events.ts` normalizes to session-TZ TimestampType (UTC-pinned in
    * Sessions) whatever the driver stored this round — the physical type
    * has CHANGED across rounds, so the shim dispatches on the schema
    * actually read:
    *   - TIMESTAMP(NANOS) → nanosecond LONG (legacy.parquet.nanosAsLong,
    *     set in Sessions); rebuilt via `DIV 1000` — exact 64-bit integer
    *     math, never double (~1.7e18 ns exceeds the 2^53 mantissa);
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ; a
    *     plain cast reinterprets the wall-clock in the UTC session zone
    *     (identical µs values to the nanos path);
    *   - already TimestampType → passthrough. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000L)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    else df
  }
}
