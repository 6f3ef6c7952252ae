package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{JoinPipeline, CommuteRules, Masking}

/** E2 batch join pipeline (mirrors reference airflow/config/read_delta.py). */
class JoinPipelineSuite extends SparkSuite {

  private lazy val employees  = Fixtures.employees(spark)
  private lazy val activities = Fixtures.activities(spark)
  private lazy val validations =
    CommuteRules.validate(employees, CommuteRules.StubProvider, lit(null))

  test("A1 aggregate: one row per active employee, correct count/avg") {
    val agg = JoinPipeline.aggregateActivities(activities)
    // employee 1 has zero activities → absent from the aggregate
    assert(agg.filter(col("id_employee") === 1).count() === 0)
    // employee 20 has 19 activities
    val e20 = agg.filter(col("id_employee") === 20).head()
    assert(e20.getAs[Long]("count_activity") === 19L)
    val expectedMean = activities.filter(col("id_employee") === 20)
      .agg(avg("activity_duration")).head().getDouble(0)
    assert(e20.getAs[Double]("mean_duration") === expectedMean)
  }

  test("J1+J2: row count = employees⋈validations; inactive employees keep NULL aggregate") {
    val fin = JoinPipeline.buildFinal(employees, validations, activities)
    assert(fin.count() === 20) // every employee has exactly one validation
    val e1 = fin.filter(col("id_employee") === 1).head()
    assert(e1.getAs[Any]("count_activity") === null)
    assert(e1.getAs[Any]("mean_duration") === null)
    assert(fin.schema.fieldNames.toSet ===
      graft.core.Schemas.finalTable.fieldNames.toSet)
  }

  test("P6 masking nulls PII for the BI user only") {
    val masked = Masking.employeesMasked(employees, Masking.BiUser)
    assert(masked.filter(col("first_name").isNotNull).count() === 0)
    assert(masked.filter(col("address").isNotNull).count() === 0)
    val clear = Masking.employeesMasked(employees, "analyst")
    assert(clear.filter(col("first_name").isNull).count() === 0)
  }
}
