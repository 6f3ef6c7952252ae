package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a BOUNDED
  * DataFrame — the point-frequency member of the mergeable-sketch family
  * (MisraGries = heavy hitters, HLL = distinct, GK = quantiles).
  *
  * Instead of a typed Aggregator buffer, the sketch here IS a tiny
  * relation `(j, h, c)` with key domain ≤ depth·width: one
  * explode-by-depth projection feeds a groupBy whose partial aggregation
  * does the map-side combining, so a 100 TB scan reduces to ≤ d·w rows
  * with no executor ever holding more than the cell grid. That makes
  * every sketch operation relational:
  *   - merge(sketchA, sketchB) = union + re-aggregate (same bound);
  *   - estimate = min over the d probed cells, via a BROADCAST join of
  *     the cell grid against the probe keys — map-side scoring, the
  *     corpus is never re-shuffled.
  *
  * Guarantees: est(x) ≥ true(x) always (cells only ever over-count), and
  * est(x) ≤ true(x) + εN with probability 1−δ for width ≥ ⌈e/ε⌉,
  * depth ≥ ⌈ln 1/δ⌉. CountMinSpec asserts the one-sided bound exactly
  * and the εN envelope on the corpus; the gated query composes the
  * sketch with an exact verify pass (the [[HeavyHitters]] pattern), so
  * over-counts can ONLY cost a little pass-2 work, never a wrong row:
  * est < t ⟹ true < t makes the candidate set a superset of the truth.
  *
  * The d hash functions are xxhash64(item, j) mod width — the depth
  * index folded into the hash input is the standard seeded family.
  */
object CountMin {

  /** Build the cell grid `(j INT, h BIGINT, c BIGINT)` over `items`.
    * Absent cells are implicit zeros (the grid is sparse-stored). */
  def sketch(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CM geometry d=$depth w=$width")
    items
      .filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast(StringType).as("it"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .groupBy(col("j"), pmod(xxhash64(col("it"), col("j")), lit(width.toLong)).as("h"))
      .agg(count(lit(1)).cast(LongType).as("c"))
  }

  /** Merge two sketches of the SAME geometry (cell-wise sum). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("j", "h").agg(sum(col("c")).cast(LongType).as("c"))

  /** Point-frequency estimates for the DISTINCT keys of `probe`:
    * output `(itemCol, est BIGINT)`, est = min over the d probed cells.
    *
    * The sketch side is ≤ d·w rows → broadcast; the probe explodes its d
    * cell addresses map-side. A probed cell absent from the sparse grid
    * means no corpus item ever hashed there → contributes 0 (and then
    * est = 0: the key is certainly absent from the sketched stream). */
  def estimate(
      probe: DataFrame,
      itemCol: String,
      sk: DataFrame,
      depth: Int,
      width: Int): DataFrame =
    probe
      .filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast(StringType).as("it"))
      .distinct()
      .select(col("it"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("h", pmod(xxhash64(col("it"), col("j")), lit(width.toLong)))
      .join(broadcast(sk), Seq("j", "h"), "left")
      .groupBy(col("it").as(itemCol))
      .agg(min(coalesce(col("c"), lit(0L))).cast(LongType).as("est"))
}
