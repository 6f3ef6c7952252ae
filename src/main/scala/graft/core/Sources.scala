package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  *     (`commute_validation.py:187`). [[xlsx]] reads the real format
  *     with JDK built-ins (see [[Xlsx]]); [[csv]] remains the
  *     explicit-schema route for pre-converted data — and both insist
  *     on a declared schema: never inferSchema on a 100 TB lake, one
  *     pass to infer is one pass too many, and silent type drift breaks
  *     joins downstream.
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

  /** S5 real xlsx ingestion (commute_validation.py:187 reads the HR
    * sheet with pandas): first worksheet, first row = header, columns
    * matched to `schema` BY NAME and cast to its types — same
    * explicit-schema contract as [[csv]], no inference.
    *
    * Parsed ON THE DRIVER deliberately: an xlsx is a zip (not
    * splittable) holding a small dimension/config sheet — the right
    * scale shape is parse-once + parallelize, not a distributed read of
    * a file that fits in one task anyway. See [[Xlsx]] for the format
    * surface. */
  def xlsx(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val all = Xlsx.rows(path)
    require(all.nonEmpty, s"$path: empty worksheet")
    val header = all.head.map(h => if (h == null) "" else h.trim)
    val byName = header.zipWithIndex.toMap
    val data = all.tail.map { cells =>
      Row.fromSeq(schema.fields.toSeq.map { f =>
        byName.get(f.name).filter(_ < cells.length).map(cells(_)).orNull
      })
    }
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1),
      StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true))))
    raw.select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** S2: rate-source fallback stream, cast to the Kafka key/value string
    * contract so the downstream plan is identical (SaveDelta.scala:123-127). */
  def rateFallback(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .selectExpr("CAST(timestamp AS STRING) AS key", "CAST(value AS STRING) AS value")
}
