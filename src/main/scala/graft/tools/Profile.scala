package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.operators.Dedup

/** Scratch stage-profiler for bench hot paths (dev tool, not API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(spark, dir, "documents")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    docs.write.format("noop").mode("overwrite").save() // warm-up

    time("COLD full minhashLshPairs")(noop(Dedup.minhashLshPairs(docs, 3, 0.8)))
    spark.catalog.clearCache()
    time("warm full minhashLshPairs")(noop(Dedup.minhashLshPairs(docs, 3, 0.8)))
    spark.catalog.clearCache()
    time("signature array only")(noop(Dedup.minhashSignatureArray(docs, 3, 64)))
    spark.stop()
  }
}
