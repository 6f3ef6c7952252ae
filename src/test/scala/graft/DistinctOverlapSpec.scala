package graft

import org.apache.spark.sql.functions._

import graft.queries.Inventory

/** a25_distinct_overlap: the map-side pair generation ≡ the oracle's
  * self-join shape, and the HLL inclusion–exclusion estimate (the 100 TB
  * instrument for the same question) tracks the exact overlap within the
  * sketch's error envelope. */
class DistinctOverlapSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pair explode from per-user sorted sets ≡ distinct self-join") {
    val out = Inventory.byName("a25_distinct_overlap").run(spark, dir)
    val e = graft.core.Tables(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select("user_id", "event_type").distinct().cache()
    try {
      val naive = e.as("a").join(e.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
        .as[(String, String, Long)].collect().toSet
      val got = out.select("type_a", "type_b", "n_both")
        .as[(String, String, Long)].collect().toSet
      assert(got == naive)
      // n_a/n_b really are the per-type distinct-user counts
      val nd = e.groupBy("event_type").count().as[(String, Long)]
        .collect().toMap
      out.select("type_a", "n_a").as[(String, Long)].collect()
        .foreach { case (t, n) => assert(n == nd(t)) }
    } finally { e.unpersist() }
  }

  test("jaccard column is exactly n_both/(n_a+n_b-n_both)") {
    val rows = Inventory.byName("a25_distinct_overlap").run(spark, dir)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, na, nb, nBoth, j) =>
      assert(nBoth <= math.min(na, nb))
      assert(j == nBoth.toDouble / (na + nb - nBoth).toDouble)
    }
  }

  test("HLL inclusion–exclusion estimates the overlap within the sketch " +
       "envelope (the mergeable path a 100 TB run would take)") {
    val e = graft.core.Tables(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
    // one lgK=12 sketch per type — re-aggregatable state, union via
    // hll_union_agg exactly like a24_hll_reagg
    val sk = e.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
        count_distinct(col("user_id")).as("nd"))
      .cache()
    try {
      val types = sk.select("event_type").as[String].collect().sorted
      val exact = Inventory.byName("a25_distinct_overlap").run(spark, dir)
        .select("type_a", "type_b", "n_both")
        .as[(String, String, Long)].collect()
        .map { case (a, b, n) => (a, b) -> n }.toMap
      for (a <- types; b <- types if a < b) {
        val est = sk.filter(col("event_type").isin(a, b))
          .agg(
            hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
              .as("u"),
            sum(col("nd")).as("s"))
          .select(col("s") - col("u")) // |A|+|B| − est|A∪B|
          .as[Double].head()
        val ex = exact.getOrElse((a, b), 0L).toDouble
        // lgK=12 → ~1.04/√2¹² ≈ 1.6% std err on the union; the
        // difference of two ~n-sized quantities amplifies it, so allow
        // 10% of the UNION size as the envelope
        val union = sk.filter(col("event_type").isin(a, b))
          .agg(sum(col("nd"))).as[Long].head().toDouble
        assert(math.abs(est - ex) <= 0.10 * union + 2.0,
          s"($a,$b): hll≈$est exact=$ex union≈$union")
      }
    } finally { sk.unpersist() }
  }

  test("distinctLicenseReport pins the k boundary: exactly-k fills to " +
       "margin 0 unsaturated, k+1 trips saturated, and the license " +
       "decision agrees with the flag") {
    val k = 8
    // three planted report keys, one sketch cell each:
    //   "full"  — exactly k distinct values (margin 0, still licensed)
    //   "over"  — k+1 distinct values (saturated, license (a) broken)
    //   "half"  — k/2 distinct values (the healthy-operations row)
    val rows =
      (0 until k).map(i => ("full", "c", s"f$i")) ++
      (0 to k).map(i => ("over", "c", s"o$i")) ++
      (0 until k / 2).map(i => ("half", "c", s"h$i"))
    val base = rows.toDF("g", "cell", "v")
    val rep = graft.pipeline.IncrementalFinal
      .distinctLicenseReport(base, Seq("g"), Seq("cell"), "v", k)
      .as[(String, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(rep("full") == ("full", 1L, k.toLong, 1000000L, 0L, false, true))
    assert(rep("over") == ("over", 1L, (k + 1).toLong,
      (k + 1).toLong * 1000000L / k, -1L, true, true))
    assert(rep("half") == ("half", 1L, (k / 2).toLong,
      500000L, (k / 2).toLong, false, true))
    // the report's saturated flag and the license decision must agree:
    // the near-saturation grain is still licensed, the overflowing one
    // is refused (k boundary inclusive on the license side too)
    assert(graft.pipeline.IncrementalFinal.verifiedDistinctLicense(
      base.filter(col("g") === "full"), Seq("g"), "v", k))
    assert(!graft.pipeline.IncrementalFinal.verifiedDistinctLicense(
      base.filter(col("g") === "over"), Seq("g"), "v", k))
    // multi-cell rollup: margins and fills aggregate per REPORT key
    // (min margin / max fill across cells), the shape the registered
    // type×day store reports at
    val multi = graft.pipeline.IncrementalFinal
      .distinctLicenseReport(
        ((0 until k).map(i => ("m", "c1", s"a$i")) ++
         (0 until 2).map(i => ("m", "c2", s"b$i"))).toDF("g", "cell", "v"),
        Seq("g"), Seq("cell"), "v", k)
      .as[(String, Long, Long, Long, Long, Boolean, Boolean)].head()
    assert(multi == ("m", 2L, k.toLong, 1000000L, 0L, false, true))
  }
}
