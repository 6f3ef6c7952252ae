package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.CdcApply

/** CDC-apply inventory: the gate-expressible face of
  * [[graft.streaming.CdcApply]]. The `events` table stands in for an
  * accumulated changelog: a deterministic op rule (`event_id % 7 = 0` →
  * delete) splits it into upserts and tombstones, keyed by `user_id` and
  * ordered by (`ts`, `event_id`) — the same latest-image-minus-deletes
  * semantics the streaming suite replays over runRouted's real routed
  * output.
  */
object CdcOps {

  val entries: Seq[Entry] = Seq(

    // current-state materialization: latest change per user wins; users
    // whose latest change is a delete are absent. Spark side = ONE hash
    // aggregate (partial max_by) — the oracle states the same argmax
    // relationally via row_number.
    Entry(
      "cdc_apply",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"), col("value"))
        CdcApply.currentState(
          upserts    = ev.filter(col("event_id") % 7 =!= 0),
          tombstones = ev.filter(col("event_id") % 7 === 0),
          keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (
                SELECT user_id, event_id, ts, event_type, value,
                       (event_id % 7 = 0) AS is_delete
                FROM events),
              r AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
                FROM c)
              SELECT user_id, event_id, ts, event_type, value
              FROM r WHERE rk = 1 AND NOT is_delete
              ORDER BY user_id""")),

    // SCD2 history: every upsert opens a version valid until the key's
    // next change; a trailing delete closes the range and leaves the key
    // with no current version. ONE window over (key, order) — history
    // inherently needs per-key order; the oracle states the identical
    // LEAD-before-filter semantics.
    Entry(
      "cdc_scd2",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        CdcApply.scd2History(
          upserts    = ev.filter(col("event_id") % 7 =!= 0),
          tombstones = ev.filter(col("event_id") % 7 === 0),
          keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
          tsCol = "ts")
          .orderBy("user_id", "valid_from", "event_id")
      },
      Some("""WITH c AS (
                SELECT user_id, event_id, ts, value,
                       (event_id % 7 = 0) AS is_delete
                FROM events),
              w AS (
                SELECT *, LEAD(ts) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
                FROM c)
              SELECT user_id, event_id, ts, value,
                     ts AS valid_from, valid_to,
                     (valid_to IS NULL) AS is_current
              FROM w WHERE NOT is_delete
              ORDER BY user_id, valid_from, event_id""")),

    // ⊕ time travel: table state AS OF 2024-01-15 — the row image whose
    // SCD2 validity interval covers the instant; keys deleted before it
    // are absent because their tombstone closed the interval. The
    // lookup Delta's VERSION AS OF serves, over plain parquet.
    Entry(
      "cdc_state_asof",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        CdcApply.stateAt(
          upserts    = ev.filter(col("event_id") % 7 =!= 0),
          tombstones = ev.filter(col("event_id") % 7 === 0),
          keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
          tsCol = "ts",
          at = to_timestamp(lit("2024-01-15 00:00:00")))
          .orderBy("user_id")
      },
      Some("""WITH c AS (
                SELECT user_id, event_id, ts, value,
                       (event_id % 7 = 0) AS is_delete
                FROM events),
              w AS (
                SELECT *, LEAD(ts) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
                FROM c)
              SELECT user_id, event_id, ts, value
              FROM w
              WHERE NOT is_delete
                AND ts <= TIMESTAMP '2024-01-15 00:00:00'
                AND (valid_to IS NULL
                     OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
              ORDER BY user_id"""))
  )
}
