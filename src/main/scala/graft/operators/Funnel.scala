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
    * the step events are absent (they have no funnel state). */
  def stages(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val perUser = events
      .filter(col("event_type").isin(steps: _*))
      .groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_type").as("et")))).as("seq"))
    val zero = array().cast(ArrayType(TimestampType))
    val folded = aggregate(col("seq"), zero, (acc: Column, e: Column) => {
      val step0 = when(
        size(acc) === 0 && e.getField("et") === steps.head,
        array(e.getField("ts")))
      steps.zipWithIndex.drop(1).foldLeft(step0) { case (w, (step, i)) =>
        w.when(
          size(acc) === i && e.getField("et") === step &&
            e.getField("ts") > element_at(acc, i),
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
