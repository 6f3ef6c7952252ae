package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyMatch

/** Deletion-neighborhood fuzzy matching ≡ the naive blocked comparator
  * for edit distance ≤ 1 (completeness + no false pairs). */
class FuzzyMatchSpec extends SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    // block 1: sub, insert, delete, exact-dup and a far name
    (1L, 10L, "martin"),
    (1L, 11L, "martim"),   // substitution  → dist 1 to 10
    (1L, 12L, "martin "),  // insertion     → dist 1 to 10
    (1L, 13L, "marti"),    // deletion      → dist 1 to 10, 2 to 11
    (1L, 14L, "martin"),   // exact dup     → dist 0 to 10
    (1L, 15L, "zzzzzz"),
    // block 2: same string as block 1 — must NOT pair across blocks
    (2L, 20L, "martin"),
    (2L, 21L, ""),         // empty-string guard
    (2L, 22L, "a"))        // dist 1 to "" (insertion)

  test("pairsWithin1 equals the naive blocked levenshtein ≤ 1 comparator") {
    val df = rows.toDF("block", "key", "name")
    val got = FuzzyMatch.pairsWithin1(df, "key", "name", "block")
      .as[(Long, Long, Int)].collect().toSet
    val naive = df.as("a").join(df.as("b"),
        col("a.block") === col("b.block") && col("a.key") < col("b.key"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= 1)
      .select(col("a.key"), col("b.key"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got === naive)
    assert(got.contains((10L, 11L, 1)) && got.contains((10L, 14L, 0))
      && got.contains((21L, 22L, 1)))
    // no cross-block leakage despite identical strings
    assert(!got.exists { case (x, y, _) => x < 20L && y >= 20L })
  }

  test("index is linear: len+1 variants per string, join never a product") {
    val df = rows.toDF("block", "key", "name")
    val p = FuzzyMatch.pairsWithin1(df, "key", "name", "block")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"), p)
  }
}
