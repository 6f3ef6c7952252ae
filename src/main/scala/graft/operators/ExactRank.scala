package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** EXACT global order statistics without a global sort or a
  * one-partition window — the primitive behind exact medians,
  * equi-depth boundaries, and ntile at corpus scale.
  *
  * The engine's two standard answers both fail somewhere: `percentile()`
  * buffers every group value in one aggregation state (exact, but
  * memory ∝ group size), and `approx_percentile` (GK) is bounded but
  * approximate — fine for monitoring (`a21`), not for a published
  * boundary that must reproduce bit-for-bit. The missing shape is the
  * RANK-PICK: the value at global rank k of n, computed blocked:
  *
  *   1. one pass computes (min, max, n) — a one-row broadcast;
  *   2. each row maps to a fixed grid cell over [min, max] (monotone in
  *      the value, so cell-major order IS value order — the same
  *      prefix-of-the-sort-key argument as [[Curation.epochShuffle]]);
  *   3. per-cell counts (≤ nCells rows) prefix-sum into cell offsets —
  *      the only unpartitioned window, over a BOUNDED table;
  *   4. a rank within each cell (partitioned window) plus the cell
  *      offset is the exact global rank;
  *   5. filter to the requested ranks — at most |picks| rows survive.
  *
  * Work: two corpus passes (stats + rank), shuffles on the cell id
  * only, no global sort anywhere. Skewed grids degrade gracefully: a
  * hot cell means a bigger partitioned-window partition, never a
  * broken result — and the cell histogram (step 3) is exactly the
  * evidence needed to re-grid.
  *
  * `valueCol` must be an exact integer column (micro-points for money —
  * determinism rule 2); ranks are 1-based over ORDER BY value. The
  * value at a given rank is well-defined under ties (the sorted
  * multiset), so no tiebreak column is needed for the emitted rows. */
object ExactRank {

  /** Rows of `df` annotated with their exact 1-based global rank by
    * `valueCol` — cell-blocked as described above. Null values are
    * excluded (they have no rank in either engine's ORDER BY... the
    * gate forbids nullable sort keys outright, rule 4).
    *
    * The output DELIBERATELY carries the total row count as `_n`
    * alongside `rank`: rank-relative consumers (quantile picks,
    * equi-depth binning — both in-repo callers) need n in the same
    * row, and recomputing it downstream would cost another corpus
    * pass. Drop it if you only want ranks. */
  def withGlobalRank(df: DataFrame, valueCol: String,
                     nCells: Int = 256): DataFrame = {
    val v = col(valueCol)
    val in = df.filter(v.isNotNull)
    val stats = in.agg(min(v).as("_lo"), max(v).as("_hi"),
      count(lit(1)).as("_n"))
    // cell id in DOUBLE space, clamped: correctness needs only that
    // the cell is MONOTONE in the value (ranks are exact whatever the
    // cell boundaries are), and long→double conversion, positive
    // scaling, and floor are each monotone — so the double path is
    // safe for the FULL long range, where (v−lo)·nCells in BIGINT
    // would overflow for ranges past 2⁶³/nCells (PropertySpec pins
    // Long.MinValue/MaxValue endpoints). Skew from double rounding
    // only moves cell boundaries — a bigger partitioned-window
    // partition, never a wrong rank.
    val cell = least(greatest(
      floor((v.cast("double") - col("_lo").cast("double")) * lit(nCells.toDouble) /
        (col("_hi").cast("double") - col("_lo").cast("double") + lit(1.0))),
      lit(0L)), lit(nCells.toLong - 1)).cast(LongType).as("_cell")
    val celled = in.crossJoin(broadcast(stats))
      .withColumn("_cell", cell)
    val counts = celled.groupBy("_cell").agg(count(lit(1)).as("_cn"))
    val wCells = Window.orderBy("_cell")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("_off",
      coalesce(sum("_cn").over(wCells), lit(0L)))
    val wInCell = Window.partitionBy("_cell").orderBy(valueCol)
    celled
      .join(broadcast(offsets.select("_cell", "_off")), Seq("_cell"))
      .withColumn("rank", (col("_off") + row_number().over(wInCell))
        .cast(LongType))
      .drop("_cell", "_lo", "_hi", "_off")
  }

  /** The values at the given quantile fractions, as exact rank-picks
    * (rank = ⌈q·n⌉, the lower-discrete convention — no interpolation,
    * so the emitted value is a value FROM the data, bit-stable across
    * engines). Output: (q, rank, value-under-the-original-name), ONE
    * row per requested q — when several qs resolve to the same rank
    * (small n, close or duplicate fractions) the row is emitted once
    * per q, exactly like the oracle's qs-table cross join. */
  def quantilePicks(df: DataFrame, valueCol: String, qs: Seq[Double],
                    nCells: Int = 256): DataFrame = {
    // out-of-range fractions (q=0 → rank 0, q>1 → rank past n) match
    // NO row, so a caller typo (25 for 0.25) would return an
    // empty/short result instead of an error — reject at entry
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1], got $qs")
    val ranked = withGlobalRank(df, valueCol, nCells)
      .select(col(valueCol), col("rank"), col("_n"))
    val qHits = array(qs.map(q =>
      struct(lit(q).as("q"),
        ceil(lit(q) * col("_n")).cast(LongType).as("r"))): _*)
    ranked
      .select(col(valueCol), col("rank"),
        explode(filter(qHits, s => s.getField("r") === col("rank")))
          .as("_pick"))
      .select(col("_pick.q").as("q"), col("rank"), col(valueCol))
  }
}
