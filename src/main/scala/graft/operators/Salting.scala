package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY §7.5; builder-prompt scale
  * requirement). AQE's skew-join split handles most skew at runtime; the
  * explicit forms below are for the cases AQE cannot fix:
  *
  *   - a single hot GROUP BY key whose partial aggregate still funnels
  *     into one reducer → [[saltedAggregate]] splits the hot key across
  *     `salts` reducers, then combines the per-salt partials (legal for
  *     any commutative/associative aggregate — here count/sum, the
  *     decomposable core);
  *   - a shuffle join where one key's rows exceed an executor →
  *     [[saltedJoin]] scatters the big side's hot rows over `salts`
  *     sub-keys and replicates the dimension side `salts`× so every
  *     sub-key still finds its match. Replication cost is |dim|×salts,
  *     which is the right trade exactly when the dim is small and the
  *     fact side is skewed.
  *
  * Salts are derived with xxhash64 from a caller-chosen column — never
  * `rand()`: deterministic input → deterministic partitioning → retryable
  * tasks (a nondeterministic salt breaks task retry exactly-once).
  */
object Salting {

  /** Two-phase salted count/sum aggregate over `keys`: phase 1 groups on
    * (keys, salt) — spreading each hot key over `salts` reducers — and
    * phase 2 combines the partials per key. Result ≡ the unsalted
    * `groupBy(keys).agg(count, sum(valueCol))`.
    *
    * `saltBy` must VARY WITHIN the hot key (a row id, an event id) —
    * salting by the aggregated value itself would collapse to one salt
    * whenever the hot key's values are constant or NULL (xxhash64(NULL)
    * is a constant), recreating the straggler. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int, saltBy: Column): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts.toLong)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__cnt").as("cnt"), sum("__sum").as(s"sum_$valueCol"))

  /** Salted equi-join of a skewed `big` side with a small `dim` side on
    * `key`. `saltBy` must be a big-side column that varies within the hot
    * key (it only drives load balancing, not semantics). Inner-join
    * result ≡ `big.join(dim, key)`. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
                 salts: Int, saltBy: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts.toLong)))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
