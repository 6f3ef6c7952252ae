package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench gate's integrity contract: a failing query can never
  * impersonate a fast run, and the reported number is the min over
  * repeated runs (noise resistance) with the raw runs preserved. */
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
    assert(Bench.best(byName("q_ok")) >= 0.0)
    assert(Bench.best(byName("q_broken")) === -1.0)

    val json = Bench.toJson(results, "/tmp/unused")
    assert(json.contains(""""errors":["q_broken"]"""))
    assert(json.contains(""""q_broken":-1"""))
    // the total excludes the failure instead of silently absorbing it
    assert(json.contains(s""""value":${Bench.best(byName("q_ok"))}"""))
  }

  test("runtime failures (not just construction) also surface as -1") {
    val lazyBoom = (s: SparkSession, _: String) => {
      import s.implicits._
      Seq("not-a-number").toDF("v").selectExpr("CAST(v AS INT) + 1 AS n")
        .filter($"n" > 0) // ANSI cast throws at EXECUTION, not planning
    }
    val results = Bench.timeQueries(spark, "/tmp/unused", Seq("q_lazy" -> lazyBoom))
    assert(Bench.best(results.head._2) === -1.0)
  }

  test("each query runs `runs` times; the reported number is the min; raw runs are kept") {
    val good = (s: SparkSession, _: String) => {
      import s.implicits._
      Seq(1, 2, 3).toDF("x")
    }
    val results = Bench.timeQueries(spark, "/tmp/unused",
      Seq("q_ok" -> good), runs = 3)
    val timings = results.head._2
    assert(timings.length === 3)
    assert(timings.forall(_ >= 0.0))
    assert(Bench.best(timings) === timings.min)

    val json = Bench.toJson(results, "/tmp/unused")
    // the min lands in `queries`, the raw spread in `runs`
    assert(json.contains(s""""queries":{"q_ok":${timings.min}}"""))
    assert(json.contains(s""""runs":{"q_ok":[${timings.mkString(",")}]}"""))
  }

  test("summary line stays tail-sized for a 200-query inventory and carries the totals") {
    // the driver keeps only the last ~2 KB of stdout; the summary line
    // must fit that window no matter how large the inventory grows,
    // while still honoring the {"metric","value","unit","queries","sf"}
    // schema and pointing at the committed full artifact
    val results: Seq[(String, Seq[Double])] =
      (1 to 200).map(i => f"query_with_a_long_name_$i%03d" -> Seq(i / 7.0, i / 6.5)) :+
        ("q_broken" -> Seq(-1.0))
    val s = Bench.toSummaryJson(results, "/root/testdata/sf0.1", "bench_out.json")
    assert(s.length < 1800, s"summary is ${s.length} bytes — exceeds the tail budget")
    val total = results.map(r => Bench.best(r._2)).filter(_ >= 0).sum
    assert(s.contains(s""""value":$total"""))
    assert(s.contains(""""metric":"total""""))
    assert(s.contains(""""queries_full":"bench_out.json""""))
    assert(s.contains(""""errors":["q_broken"]"""))
    assert(s.contains(""""n_queries":201"""))
    // the compact map keeps the MOST EXPENSIVE mins (the ones worth
    // reading first), not an arbitrary prefix
    assert(s.contains("query_with_a_long_name_200"))
    assert(!s.contains("query_with_a_long_name_001"))
  }

  test("a failure stops further runs for that query (no wasted re-runs of a broken plan)") {
    var calls = 0
    val broken = (_: SparkSession, _: String) => {
      calls += 1
      throw new RuntimeException("boom")
    }
    Bench.timeQueries(spark, "/tmp/unused", Seq("q_broken" -> broken), runs = 3)
    assert(calls === 1)
  }
}
