package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {

  /** Time one full materialization per query (noop sink forces every
    * output column; count() would let Catalyst prune expensive
    * projections away). Cache is cleared between runs: operators
    * that cache internally (the dedup shingle indexes) must not
    * subsidize later queries or accumulate storage memory across the
    * full inventory in one JVM.
    *
    * Each query runs `runs` times and reports the per-query MIN — this
    * box's wall clock swings ±50% (same binary measured 458 s / 162 s /
    * 70 s across three round-6 runs), so a single-shot number cannot
    * distinguish a regression from ambient load; the min of repeated
    * runs is the standard noise-resistant estimator of query cost. The
    * raw per-run timings are kept alongside (`"runs"` in the JSON) so
    * the artifact itself shows the spread.
    *
    * A failed query must be VISIBLE in the result (-1 timing), never a
    * normal-looking fast number — a silently-swallowed failure is
    * indistinguishable from a fast run. A failure on ANY run marks the
    * query failed (-1, remaining runs skipped). (BenchSuite feeds a
    * deliberately-broken query and asserts the -1 + errors contract.) */
  def timeQueries(spark: SparkSession, sfDir: String,
                  queries: Seq[(String, (SparkSession, String) => DataFrame)],
                  runs: Int = 2): Seq[(String, Seq[Double])] =
    queries.map { case (name, fn) =>
      val timings = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      var i = 0
      while (i < runs && !failed) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          timings += (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"bench: query '$name' FAILED: ${e.getClass.getName}: ${e.getMessage}")
            failed = true
            timings += -1.0
        }
        i += 1
      }
      name -> timings.toSeq
    }

  /** Min over a query's runs; -1 (failure) if any run failed. */
  def best(timings: Seq[Double]): Double =
    if (timings.exists(_ < 0)) -1.0 else timings.min

  /** The driver's one-line JSON contract: `queries` carries the
    * per-query MIN across runs, `runs` the raw timings behind it,
    * `value` the total of the mins; failed queries are -1 in `queries`
    * and listed by name in `errors` (excluded from the total). */
  def toJson(results: Seq[(String, Seq[Double])], sfDir: String): String = {
    val mins = results.map { case (k, v) => k -> best(v) }
    val qs = mins.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, v) =>
      "\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = mins.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = mins.map(_._2).filter(_ >= 0).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$raw,"errors":$failed,"sf":"$sfDir"}"""
  }

  /** Tail-survivable summary line: the round driver keeps only the last
    * ~2 KB of stdout, and the full JSON for 181 queries is ~6× that —
    * BENCH_r08/r09 both came back `"parsed": null` with ~75% of
    * per-query numbers lost. This line honors the driver's
    * `{"metric","value","unit","queries","sf"}` schema but carries only
    * the `topN` most expensive mins (bounded size regardless of
    * inventory growth), plus a pointer to the committed full artifact. */
  def toSummaryJson(results: Seq[(String, Seq[Double])], sfDir: String,
                    fullFile: String, topN: Int = 20): String = {
    val mins = results.map { case (k, v) => k -> best(v) }
    val top = mins.filter(_._2 >= 0).sortBy(-_._2).take(topN)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = mins.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = mins.map(_._2).filter(_ >= 0).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$top,""" +
      s""""queries_truncated":true,"n_queries":${results.size},""" +
      s""""queries_full":"$fullFile","errors":$failed,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runsRaw = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2")
    val runs = runsRaw.toIntOption.getOrElse(
      sys.error(s"SPARK_GRAFT_BENCH_RUNS must be an integer, got '$runsRaw'"))
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    val spark = graft.core.Sessions.local("graft-bench")

    // Warm-up: JVM/codegen/classloading dominate the first query in a
    // fresh session; one untimed pass makes per-query numbers reflect
    // query cost. (Runs the cheapest scan query.)
    try SparkEntry.queries("a3_scalar_count")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // dev iteration aid: SPARK_GRAFT_BENCH_ONLY=q1,q2 times a subset
    // (the driver never sets it — full inventory is the default)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = timeQueries(spark, sfDir, selected, runs)
    val full = toJson(results, sfDir)
    // full artifact → committed file (survives regardless of stdout
    // truncation); overridable for tests
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), full + "\n")
    // full line first (complete when stdout is kept whole), compact
    // summary LAST so a 2 KB tail capture always parses the totals
    println(full)
    println(toSummaryJson(results, sfDir, outFile))
    spark.stop()
  }
}
