package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source constructors (SURVEY §2.1) beyond the parquet tables of
  * [[Tables]]. Each is a thin, explicit wrapper so the scan layer stays
  * in one place and tests can target file-based stand-ins.
  *
  *   - S4 JDBC: the reference reads `employees_masked` and
  *     `commute_validations` whole-table over psycopg2/JDBC
  *     (`read_delta.py:87-103`). `jdbc` is the same `spark.read.jdbc`
  *     call; `jdbcPushdown` shows the scale-correct form — pass a query
  *     so projection/predicates execute inside the database instead of
  *     shipping the table. (No database runs in this environment; these
  *     are exercised structurally via the file-backed registry in tests.)
  *   - S5 Excel: the reference pandas-reads an HR xlsx
  *     (`commute_validation.py:187`). Spark has no xlsx reader;
  *     the durable route is CSV with an explicit schema — never
  *     inferSchema on a 100 TB lake, one pass to infer is one pass too
  *     many, and silent type drift breaks joins downstream.
  *   - S2 rate fallback: `SaveDelta.scala:123-127` falls back to the
  *     rate source when Kafka is unreachable, cast to the same
  *     key/value strings.
  */
object Sources {

  /** S4: whole-table JDBC scan (read_delta.py:87-103). */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S4 at scale: push the projection/predicate into the database — the
    * `dbtable` is a derived-table subquery, so only needed columns/rows
    * cross the wire. */
  def jdbcPushdown(spark: SparkSession, url: String, query: String,
                   props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, s"($query) AS pushed", props)

  /** S5: CSV with an explicit schema (header row, no inference). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S2: rate-source fallback stream, cast to the Kafka key/value string
    * contract so the downstream plan is identical (SaveDelta.scala:123-127). */
  def rateFallback(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .selectExpr("CAST(timestamp AS STRING) AS key", "CAST(value AS STRING) AS value")
}
