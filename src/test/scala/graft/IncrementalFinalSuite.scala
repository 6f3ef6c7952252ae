package graft

import org.apache.spark.sql.functions._

import graft.pipeline.IncrementalFinal

/** Partition-granular incremental rebuild of `final`: only partitions in
  * the incoming batch are replaced; history survives untouched. */
class IncrementalFinalSuite extends SparkSuite {

  import spark.implicits._

  private val employees = Seq(
    (1, 52000, "BU1", "CDI"), (2, 61000, "BU2", "CDD"))
    .toDF("id_employee", "gross_salary", "business_unity", "constract_type")

  private def acts(rows: (Int, String, Int)*) =
    rows.toSeq.toDF("id_employee", "start_datetime", "activity_duration")

  test("second batch overwrites only its own date partitions") {
    val out = tmpDir("incr-final")
    // day 1 and day 2
    IncrementalFinal.upsertBatch(spark, employees, acts(
      (1, "2024-04-01 10:00:00", 30),
      (1, "2024-04-02 10:00:00", 40),
      (2, "2024-04-01 11:00:00", 50)), out)
    val v1 = spark.read.parquet(out)
    assert(v1.count() === 3)

    // re-process day 2 with corrected data + a new day 3
    IncrementalFinal.upsertBatch(spark, employees, acts(
      (1, "2024-04-02 10:00:00", 99),
      (2, "2024-04-03 09:00:00", 20)), out)
    val v2 = spark.read.parquet(out).cache()

    // day 1 untouched, day 2 replaced (new duration), day 3 added
    assert(v2.filter(col("activity_date") === "2024-04-01").count() === 2)
    val day2 = v2.filter(col("activity_date") === "2024-04-02")
      .select("mean_duration").as[Double].collect()
    assert(day2.toSeq === Seq(99.0))
    assert(v2.filter(col("activity_date") === "2024-04-03").count() === 1)
    v2.unpersist()
  }

  test("re-running the same batch is idempotent") {
    val out = tmpDir("incr-idem")
    val batch = acts((1, "2024-04-05 08:00:00", 10), (2, "2024-04-05 09:00:00", 20))
    IncrementalFinal.upsertBatch(spark, employees, batch, out)
    val first = spark.read.parquet(out).collect().toSet
    IncrementalFinal.upsertBatch(spark, employees, batch, out)
    assert(spark.read.parquet(out).collect().toSet === first)
  }
}
