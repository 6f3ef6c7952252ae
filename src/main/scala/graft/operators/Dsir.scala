package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions.tokens

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
  * the "pick raw-corpus documents that look like the target domain"
  * curation signal, re-expressed with an exact-integer contract.
  *
  * DSIR proper weights a document by the likelihood ratio of a
  * target-domain n-gram model over a raw-corpus model, i.e.
  * exp(Σ_w c_doc(w)·[log p_t(w) − log p_r(w)]). An IEEE log makes the
  * hashed result engine-implementation-defined (the gate's determinism
  * rule 2 forbids it), so the gated statistic is the per-token MEAN
  * frequency ratio instead:
  *
  *   score(doc) = (1/n_doc) · Σ_{tok ∈ doc} ⌊S·(c_t(tok)+1) / (c_r(tok)+1)⌋
  *
  * with add-one smoothing on both counts and S = 10⁶ fixed-point scale.
  * Every per-token ratio is an exact BIGINT (c_t ≤ c_r, so each term is
  * ≤ S), the document sum is an order-insensitive integer, and the one
  * division at emit is int/int in IEEE double — identical in DuckDB. The
  * ranking it induces agrees with the likelihood-ratio ranking whenever
  * the per-token ratios are roughly uniform within a document, and it
  * keeps DSIR's operational core: a vocabulary-sized ratio table scored
  * map-side over the raw corpus.
  *
  * Scale shape (the 100 TB story):
  *   1. ONE token-explode pass computes c_r and c_t together (c_t via a
  *      conditional sum over the same groupBy — the target is a subset
  *      predicate of the corpus, not a second scan);
  *   2. the ratio table is vocabulary-sized → broadcast; the per-doc
  *      score pass is a map-side join + one doc-keyed aggregate. The
  *      corpus is never shuffled on anything wider than doc_id.
  *
  * Reference anchor: the reference has no curation stage (its pipeline
  * ends at analytics SQL, `airflow/config/read_delta.py`); this extends
  * the engine per the builder prompt's training-data-pipeline scope.
  */
object Dsir {

  /** Per-document mean target/raw frequency-ratio score.
    *
    * Output: (idCol, n_tok BIGINT, score DOUBLE), one row per document
    * with at least one token.
    *
    * @param isTarget row predicate marking the target-domain documents
    *                 (must be computable from `docs`' columns alone)
    * @param scale    fixed-point ratio scale (default 10⁶)
    */
  def importanceScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      scale: Long = 1000000L): DataFrame = {
    val toks = docs
      .select(col(idCol), isTarget.as("is_t"),
        explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
    // one pass over the exploded corpus: raw count + target count per word
    val counts = toks.groupBy("tok").agg(
      count(lit(1)).as("c_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    // ⌊S·(c_t+1)/(c_r+1)⌋ — exact BIGINT, ≤ S because target ⊆ corpus
    val ratio = counts.select(col("tok"),
      expr(s"(c_t + 1L) * ${scale}L DIV (c_r + 1L)").as("r"))
    toks
      .join(broadcast(ratio), "tok")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast(LongType).as("n_tok"),
        sum(col("r")).cast(LongType).as("r_sum"))
      // Σr ≤ n_doc·S ≪ 2⁵³ — both operands exact in double, one IEEE
      // division shared by the oracle (determinism rule 2's emit form)
      .select(col(idCol), col("n_tok"),
        (col("r_sum").cast("double") / col("n_tok").cast("double"))
          .as("score"))
  }
}
