package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-bench")

    // Warm-up: JVM/codegen/classloading dominate the first query in a
    // fresh session; one untimed pass makes per-query numbers reflect
    // query cost. (Runs the cheapest scan query.)
    try SparkEntry.queries("a3_scalar_count")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // noop sink forces full computation of every output column —
    // count() would let Catalyst prune expensive projections away.
    // Cache is cleared between queries: operators that cache internally
    // (the dedup shingle indexes) must not subsidize later queries or
    // accumulate storage memory across the full inventory in one JVM.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
