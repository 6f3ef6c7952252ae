package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks (SURVEY §2.11; reference: Great Expectations DAG
  * `airflow/dags/data_validation_dag.py:306-320`, gate `:360-361`).
  *
  * Composable checks that compile to ONE conditional-aggregation pass per
  * table — the reference runs one Postgres scan per expectation; at 100 TB
  * a single scan computing all counts is the only sane shape.
  */
object Checks {

  /** A named check: `violations` counts rows breaking the expectation. */
  final case class Check(name: String, violations: Column)

  /** Q1 expect_column_values_to_not_be_null. */
  def notNull(c: String): Check =
    Check(s"not_null_$c", count_if(col(c).isNull))

  /** Q2 expect_column_values_to_be_between(min=0, mostly=1.0). */
  def nonNegative(c: String): Check =
    Check(s"non_negative_$c", count_if(col(c) < 0))

  /** Q3 same with missing_value_handling="ignore": NULLs pass. */
  def nonNegativeIgnoringNulls(c: String): Check =
    Check(s"non_negative_$c", count_if(col(c).isNotNull && col(c) < 0))

  /** One row, one column per check + total rows; zero extra scans. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      checks.map(c => c.violations.as(c.name)): _*)

  final case class ValidationResult(
      nRows: Long, violations: Map[String, Long]) {
    def passed: Boolean = violations.valuesIterator.forall(_ == 0L)
  }

  /** Zero-extra-scan variant: attach the checks as an OBSERVATION on the
    * frame — Spark accumulates the conditional counts WHILE the caller's
    * own action runs (a write, an aggregation), so at 100 TB the
    * quality report costs nothing beyond the pass the pipeline was
    * already making. Run any action on the returned frame, then read
    * the metrics with [[observedResult]]; `run`/`validate` stay the
    * standalone one-pass forms. */
  def observed(df: DataFrame, obs: org.apache.spark.sql.Observation,
               checks: Seq[Check]): DataFrame =
    df.observe(obs,
      count(lit(1)).as("n_rows"),
      checks.map(c => c.violations.as(c.name)): _*)

  /** Metrics of an [[observed]] frame after an action has run (blocks
    * until the observation's first action completes). */
  def observedResult(obs: org.apache.spark.sql.Observation,
                     checks: Seq[Check]): ValidationResult = {
    val m = obs.get
    ValidationResult(
      m("n_rows").asInstanceOf[Long],
      checks.map(c => c.name -> m(c.name).asInstanceOf[Long]).toMap)
  }

  /** Q4 fail-the-run gate (data_validation_dag.py:360-361): evaluate and
    * throw on any violation. */
  def validate(df: DataFrame, checks: Seq[Check]): ValidationResult = {
    val row = run(df, checks).collect().head
    val res = ValidationResult(
      row.getLong(0),
      checks.zipWithIndex.map { case (c, i) => c.name -> row.getLong(i + 1) }.toMap)
    if (!res.passed)
      throw new IllegalStateException(s"data-quality gate failed: ${res.violations.filter(_._2 > 0)}")
    res
  }

  /** ⊕ uniqueness: rows whose key occurs more than once (the reference's
    * PRIMARY KEY as a data check — at scale, the constraint DDL becomes a
    * validation pass). Counted per EXTRA row: Σ_groups (n_g − 1), which
    * equals n − distinct — computed in ONE scan + one shuffle on the key
    * (the count/distinct.count formulation reads the table twice). */
  def uniqueKey(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("dup_rows"))
      .collect().head.getLong(0)

  /** ⊕ referential integrity (init-db.sql:34,48 FK constraints, as a
    * check): child keys with no parent — an anti join, the scale-correct
    * orphan scan (no row explosion, one shuffle on the key). */
  def fkOrphans(child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")

  // ---- S8: catalog/schema introspection (data_validation_dag.py:68-106,
  // 219-253 runs information_schema queries; the Spark catalog answers
  // the same questions without a scan).

  /** S8 table-existence precondition (data_validation_dag.py:219-253). */
  def tableExists(spark: org.apache.spark.sql.SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** S8 column-existence check: expected columns absent from the frame.
    * Empty result = check passes (data_validation_dag.py:68-106 checks
    * information_schema.columns the same way). */
  def missingColumns(df: DataFrame, expected: Seq[String]): Seq[String] = {
    val have = df.schema.fieldNames.toSet
    expected.filterNot(have)
  }

  /** The declared-inventory report over the driver's `events` table:
    * not-null ts / event_type (Q1), value ≥ 0 ignoring nulls (Q3). */
  def report(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("n_rows"),
      count_if(col("ts").isNull).as("null_ts"),
      count_if(col("event_type").isNull).as("null_event_type"),
      count_if(col("value").isNotNull && col("value") < 0).as("negative_value"))
}
