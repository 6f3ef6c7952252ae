package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Statistical outlier detection with EXACT integer arithmetic: a row is
  * flagged when its value sits more than `z` population standard
  * deviations from its group mean. The z² > z₀² test is algebraically
  * cleared of divisions and square roots —
  *
  *   (n·v − S)² > z₀² · (n·SS − S²)
  *
  * over milli-unit fixed-point values (DECIMAL(38,0) on the Spark side,
  * HUGEINT in the DuckDB oracle), so both engines decide every boundary
  * case identically and two cluster runs can never disagree.
  *
  * Shape: `stats` is a map-side partial aggregate (|groups| rows);
  * `flagged` broadcasts it back over a re-scan — no full-data shuffle
  * at any scale. The same predicate drives the STREAMING twin
  * (`flaggedStream`): precomputed stats join each micro-batch
  * broadcast, state-free — refreshing the stats table is a batch
  * concern, scoring is map-side at stream throughput.
  */
object Outliers {

  private val D38 = DecimalType(38, 0)

  /** Milli-unit fixed point (truncation toward zero — DuckDB
    * `CAST(TRUNC(v * 1000.0) AS BIGINT)`). */
  def fixedPoint(value: Column): Column =
    (value * lit(1000.0)).cast(LongType)

  /** Per-group integer moments (n, s = Σv, ss = Σv²) over
    * `fixedPoint(valueCol)`, null values excluded. */
  def stats(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), fixedPoint(col(valueCol)).as("vi"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        sum(col("vi")).as("s"),
        sum(col("vi") * col("vi")).as("ss"))

  /** The integer-exact z-score predicate over columns (n, s, ss, vi);
    * requires n ≥ 2 so a singleton group never self-flags. */
  def predicate(z: Int): Column = {
    val n  = col("n").cast(D38)
    val s  = col("s").cast(D38)
    val ss = col("ss").cast(D38)
    val vi = col("vi").cast(D38)
    col("n") >= 2 &&
      (n * vi - s) * (n * vi - s) > lit(z * z).cast(D38) * (n * ss - s * s)
  }

  /** Batch flags: the rows of `df` beyond `z` population std-devs of
    * their group, scored against stats computed from `df` itself. */
  def flagged(df: DataFrame, groupCol: String, valueCol: String,
              z: Int = 3): DataFrame = {
    val v = df.filter(col(valueCol).isNotNull)
      .withColumn("vi", fixedPoint(col(valueCol)))
    v.join(broadcast(stats(df, groupCol, valueCol)), groupCol)
      .filter(predicate(z))
      .drop("vi", "n", "s", "ss")
  }

  /** Streaming twin: score a stream against PRECOMPUTED per-group
    * stats (from [[stats]] over history). The stats frame re-plans and
    * broadcasts into every micro-batch — map-side, state-free. */
  def flaggedStream(stream: DataFrame, statsDf: DataFrame, groupCol: String,
                    valueCol: String, z: Int = 3): DataFrame =
    stream.filter(col(valueCol).isNotNull)
      .withColumn("vi", fixedPoint(col(valueCol)))
      .join(broadcast(statsDf), Seq(groupCol))
      .filter(predicate(z))
      .drop("vi", "n", "s", "ss")
}
