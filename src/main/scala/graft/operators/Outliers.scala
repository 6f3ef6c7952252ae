package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Best mean-shift split points of an ordered integer series — exact
    * change-point detection for drift monitoring ("did event volume step
    * on some day?"). For each candidate split after position i of the
    * N-point series (prefix sum Sᵢ, total T), the between-means gap
    *
    *   |Sᵢ/i − (T−Sᵢ)/(N−i)|  =  |Sᵢ·(N−i) − (T−Sᵢ)·i| / (i·(N−i))
    *
    * is scored in exact scaled-integer arithmetic:
    * `score = (|Sᵢ·(N−i) − (T−Sᵢ)·i| · scale) DIV (i·(N−i))` — every op
    * a long multiply/floor-divide over non-negatives, so Spark and the
    * oracle agree bit for bit (same discipline as the z² outlier test
    * above). Top-`k` splits by (score desc, position asc).
    *
    * Shape: the series is |positions| rows (already aggregated from the
    * corpus — days, hours, versions), so the window prefix sum and the
    * top-k are sketch-sized; nothing here touches raw events. Overflow
    * envelope: |gap numerator| ≤ T·N and ·scale must stay < 2⁶³ —
    * holds for T·N·scale ≲ 9·10¹⁸ (e.g. 10⁹ total events over 10³
    * buckets at scale 10⁶); shrink `scale` for extreme totals.
    */
  def changePoints(series: DataFrame, orderCol: String, valueCol: String,
                   k: Int, scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.orderBy(col("split_at"))
    val n = Window.partitionBy(lit(1))
    series
      .select(col(orderCol).as("split_at"),
        col(valueCol).cast(LongType).as("v"))
      .withColumn("i", row_number().over(w).cast(LongType))
      .withColumn("s", sum(col("v")).over(w).cast(LongType))
      .withColumn("t", sum(col("v")).over(n).cast(LongType))
      .withColumn("cnt", count(lit(1)).over(n).cast(LongType))
      .filter(col("i") < col("cnt")) // a split needs both sides non-empty
      .withColumn("score", expr(
        s"(abs(s * (cnt - i) - (t - s) * i) * ${scale}L) DIV (i * (cnt - i))"))
      .select(col("split_at"), col("i").as("n_before"),
        (col("cnt") - col("i")).as("n_after"),
        col("s").as("sum_before"), (col("t") - col("s")).as("sum_after"),
        col("score"))
      .orderBy(desc("score"), asc("split_at"))
      .limit(k)
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
