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
              ORDER BY user_id"""))
  )
}
