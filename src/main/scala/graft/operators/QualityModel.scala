package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

import graft.functions.TextFunctions

/** Trained weights for the hashed bag-of-words quality scorer — the
  * "swap for a trained 256-entry lookup" step that
  * [[TextFunctions.hashedBowSum]]'s deterministic hash stand-in
  * documents.
  *
  * Model: multinomial Naive Bayes log-odds per feature bucket,
  * α-smoothed — the closed-form fit (no iterations, no optimizer):
  * w_b = log P(b | good) − log P(b | bad). A document's score
  * Σ w_bucket(token) is then its class log-likelihood ratio up to the
  * prior constant — the fastText-style linear scorer.
  *
  * Scale design: the fit is ONE conditional aggregate over (bucket,
  * label) token counts — 256 output rows whatever the corpus size (the
  * driver collect reads the MODEL, not data, same bounded-readout
  * contract as HeavyHitters' sketch row). Scoring is the same map-side
  * fold as the stand-in with the literal 256-entry lookup swapped in:
  * no shuffle, no UDF, whole corpus scored in one projection.
  */
object QualityModel {

  val NumBuckets = 256

  /** Fit α-smoothed NB log-odds weights from labeled documents.
    * `labelCol` must be boolean-castable (true = high quality). */
  def trainLogOdds(labeled: DataFrame, textCol: String, labelCol: String,
                   alpha: Double = 1.0): Array[Double] = {
    val rows = labeled
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"),
        col(labelCol).cast(BooleanType).as("pos"))
      .select(TextFunctions.tokenBucket(col("tok")).as("bucket"), col("pos"))
      .groupBy("bucket")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))
      .collect() // ≤ 256 rows — the model, not the data
    val np = Array.fill(NumBuckets)(0L)
    val nn = Array.fill(NumBuckets)(0L)
    rows.foreach { r =>
      np(r.getInt(0)) = r.getLong(1)
      nn(r.getInt(0)) = r.getLong(2)
    }
    val totP = np.sum.toDouble + NumBuckets * alpha
    val totN = nn.sum.toDouble + NumBuckets * alpha
    Array.tabulate(NumBuckets)(b =>
      math.log((np(b) + alpha) / totP) - math.log((nn(b) + alpha) / totN))
  }

  /** Score text with a trained 256-entry lookup: the same hashed-BoW
    * fold as [[TextFunctions.hashedBowSum]], weights swapped in as a
    * broadcast-literal array — still map-side, still UDF-free. */
  def score(text: Column, weights: Seq[Double]): Column = {
    require(weights.length == NumBuckets,
      s"expected $NumBuckets weights, got ${weights.length}")
    val lookup = typedlit(weights)
    aggregate(
      transform(TextFunctions.tokens(text),
        t => get(lookup, TextFunctions.tokenBucket(t))),
      lit(0.0), (acc, x) => acc + x)
  }
}
