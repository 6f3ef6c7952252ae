package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.quality.Checks

/** Data-quality inventory (SURVEY.md §2.11, Q1–Q4 from
  * data_validation_dag.py:306-320), expressed through the reusable
  * `graft.quality.Checks` module and declared as one aggregated query so
  * the DuckDB oracle can verify the violation counts.
  *
  * At scale: one pass over the table computes every check (conditional
  * aggregation), instead of one scan per expectation like the reference.
  */
object Quality {

  val entries: Seq[Entry] = Seq(
    Entry(
      "q1_quality_checks",
      (s, dir) => Checks.report(Tables(s, dir, "events")),
      Some("""SELECT
                COUNT(*) AS n_rows,
                COUNT(*) FILTER (WHERE ts IS NULL) AS null_ts,
                COUNT(*) FILTER (WHERE event_type IS NULL) AS null_event_type,
                COUNT(*) FILTER (WHERE value IS NOT NULL AND value < 0) AS negative_value
              FROM events"""))
  )
}
