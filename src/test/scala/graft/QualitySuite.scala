package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.quality.Checks

/** Data-quality checks (mirrors reference
  * airflow/dags/data_validation_dag.py:306-361 — GE expectations Q1-Q4). */
class QualitySuite extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("start_datetime", TimestampType),
    StructField("sport_type", StringType),
    StructField("activity_duration", IntegerType),
    StructField("distance", IntegerType)))

  private def df(rows: Row*) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 1), schema)

  private val ts = java.sql.Timestamp.valueOf("2024-04-18 10:00:00")

  private def checks = Seq(
    Checks.notNull("start_datetime"),
    Checks.notNull("sport_type"),
    Checks.nonNegative("activity_duration"),
    Checks.nonNegativeIgnoringNulls("distance"))

  test("clean data passes all expectations") {
    val clean = df(Row(ts, "Yoga", 3600, 5000), Row(ts, "Box", 1800, null))
    val res = Checks.validate(clean, checks)
    assert(res.passed && res.nRows === 2)
  }

  test("dirty fixture fails exactly the expected expectations (FIXTURES §8)") {
    val dirty = df(
      Row(null, "Yoga", 3600, 1000),   // Q1 null start_datetime
      Row(ts, null, 3600, 1000),       // Q1 null sport_type
      Row(ts, "Box", -5, 1000),        // Q2 negative duration
      Row(ts, "Vélo", 3600, -1),       // Q3 negative non-null distance
      Row(ts, "Marche", 3600, null))   // NULL distance is allowed
    val report = Checks.run(dirty, checks).head()
    assert(report.getAs[Long]("not_null_start_datetime") === 1L)
    assert(report.getAs[Long]("not_null_sport_type") === 1L)
    assert(report.getAs[Long]("non_negative_activity_duration") === 1L)
    assert(report.getAs[Long]("non_negative_distance") === 1L)
  }

  test("Q4 gate throws on violation (data_validation_dag.py:360-361)") {
    val dirty = df(Row(null, "Yoga", 3600, 1000))
    val e = intercept[IllegalStateException](Checks.validate(dirty, checks))
    assert(e.getMessage.contains("not_null_start_datetime"))
  }

  test("observed checks ride the caller's own action — no extra scan") {
    val dirty = df(
      Row(null, "Yoga", 3600, 1000),
      Row(ts, "Vélo", 3600, -1),
      Row(ts, "Marche", 3600, null))
    val obs = org.apache.spark.sql.Observation("quality")
    val watched = Checks.observed(dirty, obs, checks)
    // the caller's OWN action (a write) drives the metrics
    watched.write.format("noop").mode("overwrite").save()
    val res = Checks.observedResult(obs, checks)
    assert(res.nRows === 3L)
    assert(res.violations("not_null_start_datetime") === 1L)
    assert(res.violations("non_negative_distance") === 1L)
    assert(!res.passed)
  }

  test("uniqueKey counts extra rows per duplicated key in one aggregation pass") {
    import spark.implicits._
    val t = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"), (3, "f"))
      .toDF("k", "v")
    assert(Checks.uniqueKey(t, Seq("k")) === 3L)        // (3-1) + (2-1)
    assert(Checks.uniqueKey(t, Seq("k", "v")) === 0L)   // composite key unique
    assert(Checks.uniqueKey(t.filter($"k" === 2), Seq("k")) === 0L) // no dups
    assert(Checks.uniqueKey(t.filter($"k" < 0), Seq("k")) === 0L)   // empty input
  }
}
