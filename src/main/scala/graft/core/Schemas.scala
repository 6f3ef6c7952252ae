package graft.core

import org.apache.spark.sql.types._

/** Every schema of the reference's data model (SURVEY §1, FIXTURES.md),
  * declared once. The reference declares each schema 2–4× inconsistently
  * (DDL vs generator vs dead `activitySchema` at SaveDelta.scala:87-95);
  * we keep the *effective runtime* shapes, including the misspelled
  * column names that are part of the public surface
  * (`constract_type`, `calculed_*`, `paid_leaved_days`, `business_unity`
  * — init-scripts/init-db.sql:16-30).
  */
object Schemas {

  /** `sport_advantages.employees` — init-db.sql:11-23. */
  val employees: StructType = StructType(Seq(
    StructField("id_employee", IntegerType, nullable = false),
    StructField("first_name", StringType, nullable = false),
    StructField("last_name", StringType, nullable = false),
    StructField("birthday", DateType),
    StructField("business_unity", StringType),
    StructField("hire_date", DateType),
    StructField("gross_salary", IntegerType),
    StructField("constract_type", StringType),
    StructField("address", StringType),
    StructField("transport_mode", StringType),
    StructField("paid_leaved_days", IntegerType)))

  /** `sport_advantages.commute_validations` — init-db.sql:26-35. */
  val commuteValidations: StructType = StructType(Seq(
    StructField("id_validate", IntegerType, nullable = false),
    StructField("id_employee", IntegerType, nullable = false),
    StructField("calculed_distance", DecimalType(10, 2)),
    StructField("calculed_duration", DecimalType(10, 2)),
    StructField("is_valid", BooleanType),
    StructField("error_message", StringType),
    StructField("created_at", TimestampType)))

  /** `sport_advantages.sport_activities` Postgres shape — init-db.sql:38-49. */
  val sportActivitiesPg: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("id_employee", IntegerType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("start_datetime", TimestampType),
    StructField("sport_type", StringType),
    StructField("distance", IntegerType),
    StructField("activity_duration", IntegerType),
    StructField("comment", StringType)))

  /** Post-ingest Delta shape (SaveDelta.scala:139-148; FIXTURES §5):
    * start_datetime becomes a STRING (`from_unixtime` semantics),
    * distance becomes DOUBLE, first/last_name are dropped. */
  val sportActivitiesIngested: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("id_employee", IntegerType),
    StructField("start_datetime", StringType),
    StructField("sport_type", StringType),
    StructField("activity_duration", IntegerType),
    StructField("distance", DoubleType),
    StructField("comment", StringType)))

  /** Debezium envelope, the subset every consumer reads
    * ($.payload.after.* + op — SaveDelta.scala:140-147,
    * slack_notification.py:55-68). `start_datetime` arrives as epoch
    * MICROseconds (long). */
  val debeziumAfter: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("id_employee", IntegerType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("start_datetime", LongType),
    StructField("sport_type", StringType),
    StructField("distance", DoubleType),
    StructField("activity_duration", IntegerType),
    StructField("comment", StringType)))

  val debeziumEnvelope: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", debeziumAfter),
      StructField("after", debeziumAfter),
      StructField("op", StringType),
      StructField("ts_ms", LongType))))))

  /** `final` table (output of the batch join, FIXTURES §6). */
  val finalTable: StructType = StructType(Seq(
    StructField("id_employee", IntegerType),
    StructField("gross_salary", IntegerType),
    StructField("business_unity", StringType),
    StructField("constract_type", StringType),
    StructField("id_validate", IntegerType),
    StructField("calculed_distance", DecimalType(10, 2)),
    StructField("calculed_duration", DecimalType(10, 2)),
    StructField("is_valid", BooleanType),
    StructField("error_message", StringType),
    StructField("created_at", TimestampType),
    StructField("count_activity", LongType),
    StructField("mean_duration", DoubleType)))

  /** Categorical domains (sport_generation.py:18-23, commute_validation.py:15-18). */
  object Domains {
    val sportTypes: Seq[String] = Seq(
      "Course à pied", "Marche", "Vélo", "Natation", "Randonnée",
      "Trottinette", "Escalade", "Tennis", "Yoga", "Musculation",
      "Corde à sauter", "Badminton", "Tennis de table", "Triathlon",
      "Équitation", "Voile", "Football", "Basketball", "Judo", "Box",
      "Rugby")

    /** Sporty transport modes → commute distance limit in meters. */
    val commuteLimits: Map[String, Int] = Map(
      "Marche/running" -> 15000,
      "Vélo/Trottinette/Autres" -> 25000)

    val transportModes: Seq[String] = Seq(
      "Marche/running", "Vélo/Trottinette/Autres",
      "Transports en commun", "véhicule thermique/électrique")

    val businessUnits: Seq[String] =
      Seq("Marketing", "R&D", "Ventes", "Support", "Finance")

    val contractTypes: Seq[String] = Seq("CDI", "CDD")
  }
}
