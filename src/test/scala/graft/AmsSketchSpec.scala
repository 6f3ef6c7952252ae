package graft

import org.apache.spark.sql.functions._

import graft.operators.AmsSketch

/** AMS F₂ sketch: estimator envelope on skewed data, additive
  * mergeability, partition invariance, and the gated a26 composition on
  * real testdata. Deterministic throughout — the sign family is md5
  * bits, so every assertion is exact replay, not a flaky sample. */
class AmsSketchSpec extends SparkSuite {
  import spark.implicits._

  private val (groups, per) = (5, 25)
  private val nReps = groups * per

  private def f2Exact(items: Seq[String]): Long =
    items.groupBy(identity).values.map(g => g.size.toLong * g.size).sum

  private def estimate(items: Seq[String]): Double = {
    val df = items.toDF("it")
    AmsSketch.estimateF2(AmsSketch.signedSums(df, "it", nReps), groups, per)
      .select("est_f2").as[Double].head()
  }

  test("median-of-group-means estimate lands within a small factor of " +
       "exact F2 on a zipf-ish stream") {
    val items = (1 to 200).flatMap(i => Seq.fill(400 / i)(s"k$i"))
    val est = estimate(items)
    val ex = f2Exact(items).toDouble
    // var(group mean) = 2*F2^2/25 → std ≈ 0.28*F2; median of 5 groups.
    // The measured value is deterministic; the envelope documents it.
    assert(est / ex > 0.4 && est / ex < 2.5, s"est=$est exact=$ex")
  }

  test("signed sums merge by addition: sums(A ∪ B) ≡ sums(A) + sums(B)") {
    val a = (1 to 60).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i"))
    val b = (40 to 110).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i"))
    val sa = AmsSketch.signedSums(a.toDF("it"), "it", nReps)
    val sb = AmsSketch.signedSums(b.toDF("it"), "it", nReps)
    val merged = sa.unionByName(sb).groupBy("j")
      .agg(sum("s").cast("long").as("s"))
      .as[(Int, Long)].collect().toMap
    val direct = AmsSketch.signedSums((a ++ b).toDF("it"), "it", nReps)
      .as[(Int, Long)].collect().toMap
    assert(merged == direct)
  }

  test("the sketch is partition-invariant and ignores null keys") {
    val items = (1 to 90).flatMap(i => Seq.fill(i % 4 + 1)(s"k$i"))
    val withNulls = (items.map(Option(_)) ++ Seq(None, None)).toDF("it")
    val s7 = AmsSketch.signedSums(withNulls.repartition(7), "it", nReps)
      .as[(Int, Long)].collect().toMap
    val s1 = AmsSketch.signedSums(items.toDF("it").coalesce(1), "it", nReps)
      .as[(Int, Long)].collect().toMap
    assert(s7 == s1)
    assert(s7.size == nReps)
    // every |S_j| is bounded by the stream length
    s7.values.foreach(v => assert(math.abs(v) <= items.size))
  }

  test("gated a26 composition: ratio column is est/exact and within the " +
       "documented envelope on real testdata") {
    val row = graft.queries.Inventory.byName("a26_ams_f2")
      .run(spark, "/root/testdata/sf0.001")
      .as[(Double, Long, Double)].head()
    val (est, exact, ratio) = row
    assert(exact > 0L)
    assert(ratio == est / exact.toDouble)
    assert(ratio > 0.4 && ratio < 2.5, s"est=$est exact=$exact")
  }
}
