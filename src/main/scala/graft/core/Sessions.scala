package graft.core

import org.apache.spark.sql.SparkSession

/** Single place every entry point (Verify, Bench, tests) builds its
  * SparkSession, so scale-relevant settings stay consistent:
  *
  *   - shuffle.partitions = cores (not 200): at local fixture scale the
  *     default dominates runtime (SURVEY §7.4-R5); on a real cluster this
  *     is sized to data volume and AQE coalesces from there;
  *   - AQE on: runtime re-plan (skew-join split, broadcast demotion,
  *     partition coalescing) — the mechanism that keeps these plans valid
  *     at 100× the tested data;
  *   - session TZ pinned UTC (SURVEY §7.4-R2: from_unixtime parity);
  *   - legacy nanosAsLong: the driver's events.parquet stores
  *     TIMESTAMP(NANOS) which Spark 4 otherwise refuses to read
  *     ([PARQUET_TYPE_ILLEGAL]); Tables re-derives a proper TimestampType.
  */
object Sessions {

  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // typed Aggregators (MinHashSketch/SimHashSketch) run in
      // ObjectHashAggregate, which falls back to SORT-based aggregation
      // after 128 distinct keys per partition by default — far too eager
      // for per-document sketch buffers (~512 B each): 100k keys ≈ 50 MB
      // per partition, well within executor memory, and hash beats
      // sort-spill by a wide margin here.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      .config("spark.ui.enabled", "false")

  def local(appName: String,
            cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cpus]").appName(appName), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
