package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism floor for expensive per-row stages
  * (optimization guide §2.5 "input skew: one huge unsplittable file …
  * repartition immediately after the read", §1.2 step 1).
  *
  * The problem this solves: a stage whose per-row work is heavy (codec
  * decode, image render, 125-way sketch fan-out, window fingerprinting)
  * inherits its parallelism from the SCAN split count. A small corpus —
  * or one packed into few files — plans a 1-task stage, serializing
  * minutes of decode work on one core while the rest of the cluster
  * idles; the stage also stops scaling with added cores entirely.
  *
  * The fix is conditional, not constant: repartition up to the session's
  * `defaultParallelism` ONLY when the input plans FEWER partitions than
  * that. At 100 TB the scan already plans thousands of splits, the
  * condition is false, and no shuffle is added — the helper is a no-op
  * on exactly the inputs where an unconditional `repartition(n)` would
  * be a catastrophic payload shuffle (and a parallelism CUT). Locally,
  * and for the genuine production case of a heavy stage fed by a few
  * unsplittable files, it costs one small shuffle of the stage's input
  * and unlocks every core.
  *
  * Keys are required: hash-partitioning on a deterministic column
  * avoids round-robin's sort-before-repartition cost and its
  * re-computation hazard under task retry (guide §2.5, SPARK-38388 —
  * deterministic keys keep retried maps assigning rows identically).
  */
object Partitioning {

  /** `df` repartitioned by `keys` when its planned partition count is
    * below the session's shuffle parallelism; `df` unchanged otherwise.
    * Partition-count inspection is plan-time only (builds the RDD DAG,
    * executes nothing). The KEYED sibling of [[Tables.spread]] (same
    * target, same no-op-at-scale condition): prefer this form when a
    * downstream window/aggregate keys on the same columns — the hash
    * partitioning it establishes satisfies that operator's required
    * distribution, so the spread shuffle REPLACES the downstream
    * exchange instead of adding one (guide §2.4). */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty,
      "spread needs a partition key (use Tables.spread for round-robin)")
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, keys: _*)
  }
}
