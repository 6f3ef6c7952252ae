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
              FROM events""")),

    // ⊕ FK referential integrity as a query: orders whose o_custkey has
    // no parent customer, counted per status (anti join → aggregate).
    Entry(
      "q2_fk_orphans",
      (s, dir) => {
        val orphans = Checks.fkOrphans(
          Tables(s, dir, "orders"), "o_custkey",
          Tables(s, dir, "customer"), "c_custkey")
        orphans.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orphans"))
          .orderBy("o_orderstatus")
      },
      // NOT EXISTS, not NOT IN: left_anti keeps a NULL child key as an
      // orphan and NOT EXISTS agrees; NOT IN would return zero rows the
      // moment either side contains a NULL.
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orphans
              FROM orders o WHERE NOT EXISTS (
                SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ⊕ key-uniqueness violation count (PRIMARY KEY as a validation pass):
    // one aggregate comparing total vs distinct keys.
    Entry(
      "q3_unique_key",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        // distinct over a STRUCT of the key parts: a struct is never
        // NULL itself, so rows with a NULL component still count —
        // matching DuckDB's row-value COUNT(DISTINCT (a, b)); bare
        // multi-column count_distinct would silently drop them.
        li.agg(
          (count(lit(1)) -
            count_distinct(struct(col("l_orderkey"), col("l_linenumber"))))
            .as("dup_rows"))
      },
      Some("""SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS dup_rows
              FROM lineitem"""))
  )
}
