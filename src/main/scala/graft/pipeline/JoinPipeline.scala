package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch join pipeline (SURVEY E2; reference `airflow/config/read_delta.py`):
  * activities → per-employee aggregate (A1) → employees ⋈ validations (J1)
  * ⟕ aggregate (J2) → the `final` table.
  *
  * Differences from the reference, all Spark-first:
  *   - pure `DataFrame => DataFrame` functions, no interleaved
  *     `count()`/`show()` actions recomputing lineage (read_delta.py:52,
  *     102,255,272,282,287);
  *   - no 32-line cast-alignment helper (read_delta.py:130-161):
  *     inputs come schema-correct; Catalyst coerces the join keys;
  *   - join order/strategy left to Catalyst+AQE: both dimension inputs
  *     broadcast under the threshold; at 100 TB the activities aggregate
  *     shuffles on id_employee once and the J2 join reuses that
  *     partitioning.
  */
object JoinPipeline {

  /** A1 (read_delta.py:114-127): count + mean duration per employee. */
  def aggregateActivities(activities: DataFrame): DataFrame =
    activities
      .groupBy("id_employee")
      .agg(
        count("id_employee").as("count_activity"),
        avg("activity_duration").as("mean_duration"))

  /** P4 projection of the masked-employees read (read_delta.py:261). */
  def employeeProjection(employees: DataFrame): DataFrame =
    employees.select("id_employee", "gross_salary", "business_unity", "constract_type")

  /** J1 + J2 (read_delta.py:280-285): inner join on the key, then left
    * join the activity aggregate — employees with no activities keep
    * NULL count_activity/mean_duration. */
  def joinAll(employees: DataFrame, validations: DataFrame,
              activityAgg: DataFrame): DataFrame =
    employeeProjection(employees)
      .join(validations, Seq("id_employee"))
      .join(activityAgg, Seq("id_employee"), "left")

  /** Whole E2 transform: the `final` table. */
  def buildFinal(employees: DataFrame, validations: DataFrame,
                 activities: DataFrame): DataFrame =
    joinAll(employees, validations, aggregateActivities(activities))
}
