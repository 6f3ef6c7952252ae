package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** AMS (Alon–Matias–Szegedy 1996) second-moment sketch: estimate
  * F₂ = Σ_k n_k² — the self-join size — from O(replicates) counters
  * instead of a per-key aggregate. Completes the mergeable-sketch family
  * (MisraGries = heavy hitters, HLL = distinct, GK = quantiles,
  * CountMin = point frequency; AMS = join size / repeat rate): where
  * `j11_join_size_estimate` pays one |keys|-sized aggregate for the
  * exact answer, the AMS state is `nReps` signed BIGINT sums whatever
  * the key cardinality, merges by plain addition, and needs ONE pass.
  *
  * Estimator: S_j = Σ_rows sign_j(key) with 4-wise-ish independent ±1
  * signs; E[S_j²] = F₂. Since S_j is asymptotically Gaussian, the raw
  * median of S² would center on 0.455·F₂ (χ²₁'s median), so the
  * standard median-of-group-means correction applies: group the
  * replicates, average S² within each group (unbiased, variance
  * 2F₂²/perGroup), take the median across groups.
  *
  * Engine-portable sign family (the reason this sketch can be
  * ORACLE-CHECKED, unlike xxhash-based state): sign_j(key) = bit j of
  * md5(key) — ONE md5 per row yields 128 independent bits, the nibble
  * is decoded with a position scan over a hex alphabet and the bit with
  * integer div/mod, all of which DuckDB mirrors verbatim. Every
  * intermediate is an exact integer; the only doubles are the emit
  * divisions.
  */
object AmsSketch {

  /** Maximum replicates ONE md5 supplies (32 hex nibbles × 4 bits). */
  val MaxReps = 128

  /** Per-replicate signed sums `(j INT, s BIGINT)`, j ∈ [0, nReps).
    * Merge two sketches of the same family by summing `s` per j.
    * The replicate fan-out is map-side; partial aggregation collapses
    * it to ≤ nReps rows per task. */
  def signedSums(items: DataFrame, itemCol: String, nReps: Int): DataFrame = {
    require(nReps >= 1 && nReps <= MaxReps, s"nReps must be in [1,$MaxReps]")
    val nNibs = (nReps + 3) / 4
    // the 125-way replicate fan-out below is the heavy per-row stage:
    // spread it across cores when the scan plans fewer partitions than
    // the session has (guide §2.5 — one small file must not serialize
    // a 125× explode on one task; a no-op at corpus scale where the
    // scan already plans thousands of splits)
    graft.core.Partitioning.spread(
        items
          .filter(col(itemCol).isNotNull)
          .select(md5(col(itemCol).cast(StringType)).as("h")),
        col("h"))
      // decode the digest's nibbles ONCE per row (≤ 32 substring+instr);
      // each replicate is then an array index + constant div/mod. (Both
      // alternatives benched SLOWER at sf0.1: per-replicate hex decode
      // 2.6 s, and a 125-slot wide aggregate + stack() 2.6 s — the wide
      // form's expression count defeats codegen; this explode + partial
      // hash-agg form is 2.3 s and keeps the ≤ nReps rows/task bound.)
      .select(expr(
        s"""transform(sequence(1, $nNibs),
              p -> instr('0123456789abcdef', substring(h, p, 1)) - 1)""")
        .as("nibs"))
      .select(col("nibs"), explode(sequence(lit(0), lit(nReps - 1))).as("j"))
      // bit j%4 of nibble j/4, mapped to ±1
      .withColumn("sgn", expr(
        """2L * (element_at(nibs, CAST(1 + j DIV 4 AS INT))
                 DIV CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                                WHEN 2 THEN 4 ELSE 8 END % 2) - 1L"""))
      .groupBy(col("j"))
      .agg(sum(col("sgn")).cast(LongType).as("s"))
  }

  /** One-row F₂ estimate from [[signedSums]] output: median over
    * `groups` of the within-group mean of S². `groups` must be odd (the
    * median is a picked element, exact on both engines) and
    * `groups * perGroup` must equal the sketch's nReps. Output:
    * (med_group_sum BIGINT, est_f2 DOUBLE = med/perGroup). */
  def estimateF2(sums: DataFrame, groups: Int, perGroup: Int): DataFrame = {
    require(groups % 2 == 1, "groups must be odd for an exact picked median")
    sums
      .groupBy(expr(s"j DIV $perGroup").as("g"))
      .agg(sum(expr("s * s")).cast(LongType).as("gs"))
      .agg(element_at(sort_array(collect_list(col("gs"))), (groups + 1) / 2)
        .as("med_group_sum"))
      .select(col("med_group_sum"),
        (col("med_group_sum").cast("double") / lit(perGroup.toDouble))
          .as("est_f2"))
  }
}
