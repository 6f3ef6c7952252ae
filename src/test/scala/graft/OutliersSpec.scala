package graft

import graft.operators.Outliers

/** Change-point semantics (the gated twin `t6_change_point` hash-checks
  * the full algebra against DuckDB on the daily event series). */
class OutliersSpec extends SparkSuite {
  import spark.implicits._

  test("changePoints finds a clean step and scores it as the exact mean gap") {
    // 10,10,10,10 then 50,50,50,50: the only structure is the step at 4
    val series = ((1L to 4L).map(i => (i, 10L)) ++ (5L to 8L).map(i => (i, 50L)))
      .toDF("pos", "v")
    val top = Outliers.changePoints(series, "pos", "v", k = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // split after pos 4: means 10 vs 50 → gap 40 → score 40·10⁶ exactly
    assert(top === ((4L, 4L, 4L, 40L, 200L, 40000000L)))
  }

  test("changePoints on a constant series scores every split zero") {
    val series = (1L to 6L).map(i => (i, 7L)).toDF("pos", "v")
    val got = Outliers.changePoints(series, "pos", "v", k = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 3)
    assert(got.forall(_._6 === 0L))
    // zero ties break by position ascending
    assert(got.map(_._1).toList === List(1L, 2L, 3L))
  }

  test("changePoints never splits outside 1..n-1") {
    val series = (1L to 5L).map(i => (i, i * 10L)).toDF("pos", "v")
    val got = Outliers.changePoints(series, "pos", "v", k = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 4) // n-1 candidate splits, k clamps above
    assert(got.forall(r => r._2 >= 1L && r._3 >= 1L))
  }
}
