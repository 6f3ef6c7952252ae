package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval/proximity) join — pairs of rows on the same key whose
  * timestamps lie within `maxGapUs` of each other (the builder-prompt's
  * second example of an operator Spark lacks natively).
  *
  * Spark-first shape: time-bucket banding. Each row lands in bucket
  * `floor(ts / maxGap)`; any qualifying pair's buckets differ by at most
  * 1 (the band guarantee), so joining one side exploded to
  * {bucket−1, bucket, bucket+1} against the other side's own bucket finds
  * every pair regardless of which row carries the smaller id, while the
  * equi-join stays hash-partitioned on (key, bucket) — no theta join, no
  * per-key cross product. The exact |Δts| ≤ gap filter then removes band
  * false positives.
  *
  * At 100 TB: candidate volume scales with rows-per-(key, 2·gap window),
  * the quantity the operator's semantics already bound; a plain theta
  * join would be |key group|² regardless of gap.
  */
object RangeJoin {

  /** Unordered pairs (id_a < id_b) of same-`key` rows within `maxGapUs`
    * microseconds, with the gap. `id` must be a unique row id. */
  def withinGapPairs(df: DataFrame, key: String, ts: String, id: String,
                     maxGapUs: Long): DataFrame = {
    val withBucket = df.select(
      col(key), col(id), unix_micros(col(ts)).as("__us"))
      .withColumn("__b", floor(col("__us") / lit(maxGapUs)))
    val exploded = withBucket.withColumn("__probe",
      explode(array(col("__b") - 1, col("__b"), col("__b") + 1)))
    val pairs = exploded.as("x")
      .join(withBucket.as("y"),
        col(s"x.$key") === col(s"y.$key") &&
          col("x.__probe") === col("y.__b") &&
          col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$key").as(key),
        col(s"x.$id").as("id_a"), col(s"y.$id").as("id_b"),
        abs(col("x.__us") - col("y.__us")).as("gap_us"))
      .filter(col("gap_us") <= maxGapUs)
    // no dedup needed: only x explodes, the three probes are distinct
    // values, and id ordering fixes the orientation — each qualifying
    // pair matches on exactly one probe
    pairs
  }

  /** Overlap join of two INTERVAL relations: every (left, right) pair of
    * half-open µs intervals `[start, end)` that intersect, with the
    * overlap length. The interval×interval generalization of
    * [[withinGapPairs]] (sessions × campaign windows, validity ranges ×
    * audit windows).
    *
    * Banding without a dedup shuffle: each side explodes to the width-
    * `bucketUs` buckets it covers, the join is an equi-join on bucket,
    * and a pair is KEPT only in its canonical bucket — the one holding
    * `greatest(start_l, start_r)`, which every overlapping pair shares
    * exactly once. Each qualifying pair therefore matches exactly one
    * bucket row: no distinct over the candidate stream, the classic
    * interval-join trick. Candidate volume scales with intervals per
    * bucket (pick `bucketUs` near the typical interval length); a theta
    * join would be |left|×|right| regardless.
    *
    * Columns: left needs (`id_l`, `start_l`, `end_l`), right (`id_r`,
    * `start_r`, `end_r`), all µs longs; empty intervals never match.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    def exploded(df: DataFrame, s: String, e: String) = df
      .filter(col(s) < col(e))
      .withColumn("__bucket", explode(sequence(
        floor(col(s) / lit(bucketUs)),
        floor((col(e) - 1) / lit(bucketUs)))))
    exploded(left, "start_l", "end_l").as("l")
      .join(exploded(right, "start_r", "end_r").as("r"), Seq("__bucket"))
      .filter(col("start_l") < col("end_r") && col("start_r") < col("end_l"))
      .filter(col("__bucket") ===
        floor(greatest(col("start_l"), col("start_r")) / lit(bucketUs)))
      .select(col("id_l"), col("id_r"),
        greatest(col("start_l"), col("start_r")).as("overlap_start"),
        (least(col("end_l"), col("end_r")) -
          greatest(col("start_l"), col("start_r"))).as("overlap_us"))
  }
}
