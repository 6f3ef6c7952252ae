package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Scratch A/B: string-shingle vs hashed-shingle inverted index, same
  * JVM back-to-back so ambient load cancels (dev tool, not API). */
object JaccardAB {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-jacc-ab")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(spark, dir, "documents")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ab] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    docs.write.format("noop").mode("overwrite").save() // warm-up

    def stringShingles = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(TextFunctions.shinglesFromTokens(col("toks"), 3)).as("shingle"))
      .distinct()
    def run(sh: org.apache.spark.sql.DataFrame): Unit = {
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val common = sh.as("x").join(sh.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_common"))
      noop(common.join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a"))
    }
    for (round <- 1 to 2) {
      spark.catalog.clearCache()
      time(s"string r$round")(run(stringShingles.cache()))
      spark.catalog.clearCache()
      time(s"hashed r$round")(run(Dedup.docShingles(docs, 3).cache()))
    }
    spark.stop()
  }
}
