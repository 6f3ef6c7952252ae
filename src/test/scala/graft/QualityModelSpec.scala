package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.QualityModel

/** Trained hashed-BoW quality scorer: the NB log-odds fit must separate
  * planted high/low-quality fixtures BETTER than the deterministic hash
  * stand-in it replaces. */
class QualityModelSpec extends SparkSuite {
  import spark.implicits._

  // planted corpus: "good" docs draw from fluent prose vocabulary,
  // "bad" docs from spam/keyword-stuffing vocabulary, with shared
  // function words so separation isn't a disjoint-vocab freebie
  private val shared = Seq("the", "a", "to", "and", "of")
  private val goodWords = Seq("analysis", "measured", "evidence", "method",
    "results", "carefully", "however", "study", "observed", "consistent")
  private val badWords = Seq("click", "winner", "free", "casino", "pills",
    "prize", "urgent", "offer", "guaranteed", "bonus")

  private def doc(id: Long, words: Seq[String]): (Long, String, Boolean) = {
    // deterministic pseudo-random composition: cycle the class vocab,
    // interleave shared words every third token
    val toks = (0 until 24).map { i =>
      if (i % 3 == 2) shared((id.toInt + i) % shared.length)
      else words((id.toInt * 7 + i) % words.length)
    }
    (id, toks.mkString(" "), words eq goodWords)
  }

  private lazy val corpus: DataFrame =
    ((0L until 40L).map(doc(_, goodWords)) ++
      (40L until 80L).map(doc(_, badWords)))
      .toDF("doc_id", "text", "label")

  /** Pairwise ranking accuracy (AUC): P[score(good) > score(bad)]. */
  private def auc(scored: Seq[(Boolean, Double)]): Double = {
    val good = scored.filter(_._1).map(_._2)
    val bad = scored.filterNot(_._1).map(_._2)
    val wins = (for (g <- good; b <- bad)
      yield if (g > b) 1.0 else if (g == b) 0.5 else 0.0).sum
    wins / (good.length * bad.length)
  }

  test("trained log-odds separate held-out docs; the hash stand-in does not") {
    // the same md5 split rule as cur_split_assign: ~14/16 train, rest held out
    val h = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 1)
    val train = corpus.filter(h < "e")
    val test = corpus.filter(h >= "e")
    assert(train.count() > 0 && test.count() > 0)

    val w = QualityModel.trainLogOdds(train, "text", "label")
    def collectScores(score: org.apache.spark.sql.Column) =
      test.select(col("label"), score.cast("double"))
        .as[(Boolean, Double)].collect().toSeq

    val trainedAuc = auc(collectScores(QualityModel.score(col("text"), w.toSeq)))
    val standinAuc = auc(collectScores(TextFunctions.hashedBowSum(col("text"))))
    // the trained scorer ranks every held-out good doc above every bad
    // one; the hash stand-in is no better than a coin on this corpus
    assert(trainedAuc === 1.0, s"trained AUC $trainedAuc")
    assert(standinAuc < 0.8, s"stand-in unexpectedly separates: $standinAuc")
    assert(trainedAuc > standinAuc)
  }

  test("weights are a 256-entry lookup and spam buckets carry negative log-odds") {
    val w = QualityModel.trainLogOdds(corpus, "text", "label")
    assert(w.length === 256)
    // buckets never seen in training get the smoothed prior: weight
    // log(totN/totP) — with balanced token totals, near zero
    val goodTokenBucket = TextFunctions.tokenBucket(lit("evidence"))
    val badTokenBucket = TextFunctions.tokenBucket(lit("casino"))
    val Seq(gb, bb) = spark.range(1)
      .select(goodTokenBucket, badTokenBucket).head().toSeq.map(_.asInstanceOf[Int]).toSeq
    assert(w(gb) > 0.0)
    assert(w(bb) < 0.0)
  }

  test("scoring is map-side: no exchange in the scored projection") {
    val w = QualityModel.trainLogOdds(corpus, "text", "label")
    val p = corpus.select(QualityModel.score(col("text"), w.toSeq).as("q"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
