package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {

  /** Time one full materialization per query (noop sink forces every
    * output column; count() would let Catalyst prune expensive
    * projections away). Cache is cleared between queries: operators
    * that cache internally (the dedup shingle indexes) must not
    * subsidize later queries or accumulate storage memory across the
    * full inventory in one JVM.
    *
    * A failed query must be VISIBLE in the result (-1 timing), never a
    * normal-looking fast number — on a box whose wall clock swings with
    * ambient load, a silently-swallowed failure is indistinguishable
    * from a fast run. (BenchSuite feeds a deliberately-broken query and
    * asserts the -1 + errors contract.) */
  def timeQueries(spark: SparkSession, sfDir: String,
                  queries: Seq[(String, (SparkSession, String) => DataFrame)])
      : Seq[(String, Double)] =
    queries.map { case (name, fn) =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"bench: query '$name' FAILED: ${e.getClass.getName}: ${e.getMessage}")
          name -> -1.0
      }
    }

  /** The driver's one-line JSON contract: total excludes failed queries,
    * which appear as -1 in `queries` and by name in `errors`. */
  def toJson(results: Seq[(String, Double)], sfDir: String): String = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$failed,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-bench")

    // Warm-up: JVM/codegen/classloading dominate the first query in a
    // fresh session; one untimed pass makes per-query numbers reflect
    // query cost. (Runs the cheapest scan query.)
    try SparkEntry.queries("a3_scalar_count")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    println(toJson(
      timeQueries(spark, sfDir, SparkEntry.queries.toSeq.sortBy(_._1)), sfDir))
    spark.stop()
  }
}
