package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, TimestampType}

/** Ordered-funnel analysis over an event stream: how far each user
  * progresses through a required step sequence (e.g. view → click →
  * purchase), with strictly increasing timestamps between steps.
  *
  * Semantics = the greedy earliest chain: t₁ = min ts of step 1, tᵢ =
  * min ts of step i with ts > tᵢ₋₁ — if ANY ordered subsequence exists,
  * the greedy one does, so reached-stage is exact. The oracle states the
  * same thing relationally (chained MIN self-joins); here it's ONE
  * shuffle on user_id and a per-user fold over the ts-sorted event
  * structs — no self-join of a 100 TB events table per step.
  *
  * ANSI traps handled: step-i conditions index `acc` only under a
  * `size(acc) === i` guard (Spark's And short-circuits), and the final
  * per-stage timestamps use `get` (null out of bounds), never
  * `element_at`.
  */
object Funnel {

  /** Per-user funnel: (user_id, stage, t1..tN) — stage = steps reached,
    * tᵢ null once past the user's last reached step. Users with none of
    * the step events are absent (they have no funnel state).
    *
    * `maxPerStep` bounds the per-user collected state: when set, only
    * each user's first `maxPerStep` events PER STEP (by ts) enter the
    * fold — a `row_number <= k` filter Spark pushes below the exchange
    * as WindowGroupLimit, so the cap is applied map-side before any
    * buffer grows. Without it, one pathological user (a bot with 10⁸
    * events) makes a single `collect_list` row arbitrarily large. The
    * cap is exact for any user whose qualifying step-i event is among
    * that step's first `maxPerStep` occurrences (every non-adversarial
    * funnel); a user whose chain only continues past the cap
    * undercounts — the standard bounded-state trade, spec-pinned. */
  def stages(events: DataFrame, steps: Seq[String],
             maxPerStep: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val stepEvents = events.filter(col("event_type").isin(steps: _*))
    val capped = maxPerStep match {
      case None => stepEvents
      case Some(n) =>
        require(n >= 1, s"maxPerStep must be >= 1, got $n")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "event_type").orderBy("ts")
        stepEvents.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= n).drop("__rk")
    }
    val perUser = capped
      .groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_type").as("et")))).as("seq"))
    val zero = array().cast(ArrayType(TimestampType))
    val folded = aggregate(col("seq"), zero, (acc: Column, e: Column) => {
      val step0 = when(
        size(acc) === 0 && e.getField("et") === steps.head,
        array(e.getField("ts")))
      steps.zipWithIndex.drop(1).foldLeft(step0) { case (w, (step, i)) =>
        // get() (0-based, null out of bounds) rather than element_at: the
        // size(acc) === i guard makes the index safe today, but only via
        // And's short-circuit — get keeps this correct under ANY conjunct
        // evaluation order (ts > null is null, the when just won't fire)
        w.when(
          size(acc) === i && e.getField("et") === step &&
            e.getField("ts") > get(acc, lit(i - 1)),
          concat(acc, array(e.getField("ts"))))
      }.otherwise(acc)
    })
    val timeCols = steps.indices.map(i =>
      get(col("times"), lit(i)).as(s"t${i + 1}"))
    perUser
      .select(col("user_id"), folded.as("times"))
      .select(col("user_id") +: size(col("times")).cast(LongType).as("stage")
        +: timeCols: _*)
  }
}
