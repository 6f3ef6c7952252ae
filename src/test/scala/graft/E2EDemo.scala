package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{CommuteRules, JoinPipeline, Masking, PrimeQueries}
import graft.quality.Checks
import graft.streaming.CdcIngest

/** End-to-end drive of the reference pipeline through the public API:
  * E1 streaming CDC ingest → E2 batch join → E3 canonical analytics,
  * plus masking, quality gate, and chart aggregates.
  *
  * Run: sbt "Test/runMain graft.E2EDemo"
  */
object E2EDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("graft-e2e-demo")

    // --- E1: stream Debezium-envelope JSON into the activities table ----
    val in = java.nio.file.Files.createTempDirectory("e2e-cdc").toString
    val activitiesPath = java.nio.file.Files.createTempDirectory("e2e-act").toString
    val cp = java.nio.file.Files.createTempDirectory("e2e-cp").toString
    Fixtures.writeCdcFixture(in)
    CdcIngest.run(spark, in, activitiesPath, cp).awaitTermination()
    val ingested = spark.read.parquet(activitiesPath)
    println(s"[E1] ingested ${ingested.count()} activities (schema-drifted, string start_datetime):")
    ingested.show(3, truncate = false)

    // --- E2: masked employees ⋈ commute validations ⟕ activity agg -----
    val employees = Fixtures.employees(spark)
    val masked = Masking.employeesMasked(employees, Masking.BiUser)
    val validations = CommuteRules.validate(employees, CommuteRules.StubProvider)
    val activities = Fixtures.activities(spark)
    Checks.validate(activities, Seq(
      Checks.notNull("sport_type"), Checks.nonNegative("activity_duration"),
      Checks.nonNegativeIgnoringNulls("distance")))
    println("[Q] quality gate passed")
    val finalDf = JoinPipeline.buildFinal(masked, validations, activities)
    println(s"[E2] final table: ${finalDf.count()} rows")
    finalDf.show(3)

    // --- E3: canonical commute-prime SQL + dashboard aggregates --------
    val analytics = PrimeQueries.canonical(spark, finalDf).cache()
    println("[E3] canonical analytics:")
    analytics.orderBy("id_employee").show(5)
    println("[E3] fused == canonical: " +
      (PrimeQueries.fused(finalDf).orderBy("id_employee").collect().toSeq ==
        analytics.orderBy("id_employee").collect().toSeq))
    PrimeQueries.sumTotalSalary(analytics).show()
    PrimeQueries.countByCommuteValid(analytics).show()
    PrimeQueries.topSportTypes(activities).show()

    spark.stop()
  }
}
