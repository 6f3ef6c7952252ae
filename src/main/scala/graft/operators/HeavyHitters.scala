package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.MisraGries

/** Exact top-k heavy hitters with BOUNDED memory — the two-pass
  * sketch-then-verify pattern for key domains too large for a per-task
  * count hash map:
  *
  *   1. one scan merges per-partition [[MisraGries]] sketches (≤ sketchK
  *      counters per task, whatever the distinct-key count) into a
  *      candidate set of ≤ sketchK keys;
  *   2. a second scan exact-counts ONLY the candidates (the filter keeps
  *      the aggregate's key domain ≤ sketchK) and takes the top k with a
  *      total (count desc, key asc) order.
  *
  * Output ≡ plain `groupBy.count` top-k whenever the true k-th frequency
  * exceeds N/(sketchK+1) — the MG guarantee makes pass 1's candidates a
  * superset of the true top-k. With sketchK ≫ k the premise only fails
  * on near-flat distributions, where no answer is stable anyway;
  * HeavyHittersSpec exercises both regimes, and the gated entry pins
  * equality with the exact oracle. The driver-side `head()` fetches one
  * row holding ≤ sketchK (token, count) pairs — a scalar readout, not a
  * data collect.
  */
object HeavyHitters {

  def topK(items: DataFrame, itemCol: String, k: Int, sketchK: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    // nulls are dropped up front (a null key would become a null map key
    // in the sketch buffer, which the SQL map encoder rejects), and BOTH
    // passes compare the item through the same string cast — matching the
    // raw column against string candidates would route non-string items
    // (decimal, timestamp) through implicit casts that can disagree with
    // pass 1's explicit one.
    val nonNull = items.filter(col(itemCol).isNotNull)
    val ds = nonNull.select(col(itemCol).cast(StringType)).as[String]
    val sketch = ds.select(new MisraGries(sketchK).toColumn).head()
    val candidates = sketch.keys.toSeq
    nonNull
      .filter(if (candidates.isEmpty) lit(false)
              else col(itemCol).cast(StringType).isInCollection(candidates))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc(itemCol))
      .limit(k)
  }
}
