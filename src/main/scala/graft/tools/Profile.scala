package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.operators.Dedup
import graft.functions.TextFunctions

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

    time("simhash sketch COLD")(noop(Dedup.simhashPairs(docs, 3)))
    time("simhash sketch warm")(noop(Dedup.simhashPairs(docs, 3)))
    // tf stage alone
    val tf = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), xxhash64(col("tok")).as("th"), col("tf"))
    time("tf stage only")(noop(tf))
    time("sketch agg only")(noop(Dedup.simhashSignatures(docs)))
    spark.stop()
  }
}
