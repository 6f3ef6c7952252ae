package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-trained character-bigram language model scoring — the CCNet /
  * KenLM quality-filter shape in miniature: estimate bigram statistics
  * from the corpus itself, then score every document by how typical its
  * character transitions are. Low scores flag gibberish, encoding
  * damage, and wrong-language text without any external model artifact.
  *
  * Determinism: a real LM multiplies probabilities (log-space — but libm
  * `ln` is not correctly rounded and diverges across engines). Instead
  * each bigram contributes `⌊10⁶ · n₂/n₁⌋` micro-probability POINTS via
  * exact integer division (same value in Spark `DIV` and DuckDB `//`),
  * summed as BIGINT — order-free — with ONE double division at the end.
  *
  * Scale design: the model is a char-bigram count table, ≤ |charset|² rows
  * whatever the corpus size — it broadcasts; the scoring join is map-side.
  * Training is one explode + count over corpus characters; the explode
  * rides the same scan as scoring at 100 TB (cache the bigram table).
  *
  * Overflow bound: the `1_000_000 · n₂` intermediate is 64-bit, so a
  * single bigram may occur at most ~9.2·10¹² times (≈ 18 PB of that one
  * pair) before the count table must be downscaled (divide both n₂ and
  * n₁ by a common factor — the ratio, and the score, are unchanged).
  */
object LanguageModel {

  /** Char bigrams of a text column, as an array (length-1 sliding pairs).
    * The length guard matters: Spark's `sequence(1, 0)` yields a
    * DESCENDING [1, 0] — not the empty series DuckDB's generate_series
    * produces — so 1-char docs would fabricate bigrams unguarded. */
  private def bigrams(text: org.apache.spark.sql.Column) =
    when(length(text) >= 2,
      transform(sequence(lit(1), length(text) - 1), i => text.substr(i, lit(2))))
      .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))

  /** Corpus bigram model: (bg, n2 = count of bg, n1 = count of bg's
    * first char as a prefix). Σ n2 over a prefix = that prefix's n1. */
  def charBigramModel(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(explode(bigrams(col("text"))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("n2"))
    val prefix = counts
      .groupBy(substring(col("bg"), 1, 1).as("c1"))
      .agg(sum(col("n2")).as("n1"))
    counts.join(prefix, substring(col("bg"), 1, 1) === col("c1"))
      .select(col("bg"), col("n2"), col("n1"))
  }

  /** Score each document: mean corpus probability of its char bigrams in
    * exact micro-points. Output (doc_id, n_bigrams, lm_micro_sum,
    * lm_score); documents shorter than 2 chars have no bigrams and are
    * absent (callers wanting them keep a left join on doc ids). */
  def scoreDocs(docs: DataFrame): DataFrame = {
    val model = broadcast(charBigramModel(docs))
    docs
      .select(col("doc_id"), explode(bigrams(col("text"))).as("bg"))
      .join(model, "bg")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(expr("(1000000 * n2) DIV n1")).cast(LongType).as("lm_micro_sum"))
      .select(col("doc_id"), col("n_bigrams").cast(LongType).as("n_bigrams"),
        col("lm_micro_sum"),
        (col("lm_micro_sum").cast("double") / (lit(1e6) * col("n_bigrams")))
          .as("lm_score"))
  }
}
