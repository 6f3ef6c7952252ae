package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.pipeline.CommuteRules
import graft.core.Schemas

/** Commute-validation rules (mirrors reference
  * commute_validation/commute_validation.py:84-120) with a provider stub
  * returning controlled distances. */
class CommuteRulesSuite extends SparkSuite {

  /** 4 employees: walker in range, walker out of range, non-sporty,
    * provider failure. */
  private def emp(mode: String, id: Int): Row = Row(
    id, s"F$id", s"L$id", java.sql.Date.valueOf("1990-01-01"), "R&D",
    java.sql.Date.valueOf("2020-01-01"), 40000, "CDI", s"addr$id", mode, 25)

  private lazy val employees = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      emp("Marche/running", 1),
      emp("Marche/running", 2),
      emp("Transports en commun", 3),
      emp("Vélo/Trottinette/Autres", 4)), 1),
    Schemas.employees)

  private object FixedProvider extends CommuteRules.DistanceProvider {
    override def distances(employees: DataFrame): DataFrame = {
      val s = employees.sparkSession
      import s.implicits._
      Seq(
        (1, Some(12000), Some(3000)),  // within 15 km walk limit
        (2, Some(17350), Some(4500)),  // beyond
        (3, Some(9999), Some(100)),    // non-sporty: provider ignored
        (4, None, None))               // API failure
        .toDF("id_employee", "distance_m", "duration_s")
    }
  }

  private lazy val result =
    CommuteRules.validate(employees, FixedProvider, lit(null)).cache()

  private def rowFor(id: Int): Row = result.filter(col("id_employee") === id).head()

  test("sporty mode within limit → valid, distances kept, no error") {
    val r = rowFor(1)
    assert(r.getAs[Boolean]("is_valid"))
    assert(r.getAs[java.math.BigDecimal]("calculed_distance").intValue() === 12000)
    assert(r.getAs[Any]("error_message") === null)
  }

  test("sporty mode beyond limit → invalid with Python-format reason string") {
    val r = rowFor(2)
    assert(!r.getAs[Boolean]("is_valid"))
    // Python f"{17350/1000:.1f}" → "17.4", f"{15000/1000}" → "15.0" —
    // Java %.1f agrees (both round the shortest decimal representation).
    assert(r.getAs[String]("error_message") === "Distance (17.4 km) > limite (15.0 km)")
  }

  test("non-sporty mode → invalid 'non sportif', no distance recorded") {
    val r = rowFor(3)
    assert(!r.getAs[Boolean]("is_valid"))
    assert(r.getAs[String]("error_message") ===
      "Mode de transport 'Transports en commun' non sportif")
    assert(r.getAs[Any]("calculed_distance") === null)
    assert(r.getAs[Any]("calculed_duration") === null)
  }

  test("provider failure → invalid 'Impossible de calculer la distance'") {
    val r = rowFor(4)
    assert(!r.getAs[Boolean]("is_valid"))
    assert(r.getAs[String]("error_message") === "Impossible de calculer la distance")
    assert(r.getAs[Any]("calculed_distance") === null)
  }

  test("id_validate is a dense 1..n sequence ordered by employee id") {
    assert(result.orderBy("id_employee").select("id_validate")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
  }

  test("reference data path end-to-end: HR xlsx → explicit schema → validation") {
    // commute_validation.py:187 pandas-reads the HR workbook; here the
    // same sheet flows through Sources.xlsx with the declared schema
    val dir = tmpDir("hr-xlsx")
    val path = java.nio.file.Paths.get(dir, "hr.xlsx").toString
    val header = Seq("id_employee", "first_name", "last_name", "birthday",
      "business_unity", "hire_date", "gross_salary", "constract_type",
      "address", "transport_mode", "paid_leaved_days")
    Fixtures.writeXlsx(path, Seq(header,
      Seq("1", "F1", "L1", "1990-01-01", "R&D", "2020-01-01", "40000",
        "CDI", "addr1", "Marche/running", "25"),
      Seq("3", "F3", "L3", "1990-01-01", "R&D", "2020-01-01", "40000",
        "CDI", "addr3", "Transports en commun", "25")))
    val emp = graft.core.Sources.xlsx(spark, path, Schemas.employees)
    assert(emp.schema("gross_salary").dataType.typeName === "integer")

    val out = CommuteRules.validate(emp, FixedProvider, lit(null))
    val byId = out.collect().map(r => r.getAs[Int]("id_employee") -> r).toMap
    assert(byId.keySet === Set(1, 3))
    assert(byId(1).getAs[Boolean]("is_valid"))
    assert(!byId(3).getAs[Boolean]("is_valid"))
    assert(byId(3).getAs[String]("error_message").contains("non sportif"))
  }
}
