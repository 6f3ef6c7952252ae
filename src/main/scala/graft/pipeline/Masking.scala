package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** PII masking view (P6; reference `init-scripts/init-db.sql:74-89`):
  * the `employees_masked` view nulls first_name/last_name/address when
  * the querying user is the BI user (`current_user = 'sportadvantagebiuser'`).
  *
  * Postgres resolves `current_user` per connection; Spark has no
  * per-user session state inside a plan, so the role is a bound
  * parameter: build the view for the role that will read it (SURVEY
  * §2.3-P6). Same CASE semantics, evaluated at plan build.
  */
object Masking {

  val PiiColumns: Seq[String] = Seq("first_name", "last_name", "address")

  val BiUser = "sportadvantagebiuser"

  /** `employees_masked` for the given role. */
  def employeesMasked(employees: DataFrame, currentUser: String): DataFrame =
    PiiColumns.foldLeft(employees) { (df, c) =>
      df.withColumn(c,
        when(lit(currentUser) === BiUser, lit(null).cast(StringType))
          .otherwise(col(c)))
    }
}
