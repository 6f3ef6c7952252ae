package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench gate's integrity contract: a failing query can never
  * impersonate a fast run. */
class BenchSuite extends SparkSuite {
  import spark.implicits._

  test("a deliberately-broken query records -1 and lands in the errors list") {
    val good = (s: SparkSession, _: String) => {
      import s.implicits._
      Seq(1, 2, 3).toDF("x")
    }
    val broken = (_: SparkSession, _: String) =>
      throw new RuntimeException("boom")
    val results = Bench.timeQueries(spark, "/tmp/unused",
      Seq("q_ok" -> good, "q_broken" -> broken))
    val byName = results.toMap
    assert(byName("q_ok") >= 0.0)
    assert(byName("q_broken") === -1.0)

    val json = Bench.toJson(results, "/tmp/unused")
    assert(json.contains(""""errors":["q_broken"]"""))
    assert(json.contains(""""q_broken":-1"""))
    // the total excludes the failure instead of silently absorbing it
    assert(json.contains(s""""value":${byName("q_ok")}"""))
  }

  test("runtime failures (not just construction) also surface as -1") {
    val lazyBoom = (s: SparkSession, _: String) => {
      import s.implicits._
      Seq("not-a-number").toDF("v").selectExpr("CAST(v AS INT) + 1 AS n")
        .filter($"n" > 0) // ANSI cast throws at EXECUTION, not planning
    }
    val results = Bench.timeQueries(spark, "/tmp/unused", Seq("q_lazy" -> lazyBoom))
    assert(results.head._2 === -1.0)
  }
}
