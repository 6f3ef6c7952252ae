package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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
    * `events.ts` is stored as parquet TIMESTAMP(NANOS): Spark reads it as
    * a nanosecond LONG (legacy.parquet.nanosAsLong, set in Sessions) and
    * we rebuild a TimestampType here. `DIV` keeps the division in exact
    * 64-bit integer math — going through double would corrupt epochs
    * (~1.7e18 ns exceeds the 2^53 mantissa). */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts DIV 1000L)"))
    else df
  }
}
