package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.operators.LanguageModel

/** Corpus-trained char-bigram LM scoring semantics. */
class LanguageModelSpec extends SparkSuite {
  import spark.implicits._

  test("gibberish scores below typical text; scores live in (0, 1]") {
    // 20 docs of repetitive English-ish text + one q-z-x soup outlier
    val typical = (0L until 20L).map(i => (i, "the cat sat on the mat and then the cat ran"))
    val docs = (typical :+ ((99L, "qzxqjv zzqx jqvxz qqzz"))).toDF("doc_id", "text")
    val scores = LanguageModel.scoreDocs(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("lm_score")).toMap
    assert(scores.values.forall(s => s > 0.0 && s <= 1.0))
    val typicalMin = (0L until 20L).map(scores).min
    assert(scores(99L) < typicalMin,
      s"gibberish ${scores(99L)} should score below typical min $typicalMin")
  }

  test("model prefix counts are consistent: n1 = Σ n2 over the prefix") {
    val docs = Seq((0L, "abab"), (1L, "abcd")).toDF("doc_id", "text")
    val model = LanguageModel.charBigramModel(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byPrefix = model.groupBy(_._1.substring(0, 1))
    byPrefix.foreach { case (_, rows) =>
      assert(rows.forall(_._3 == rows.map(_._2).sum))
    }
    // "ab" occurs 3 times: twice in abab, once in abcd
    assert(model.find(_._1 == "ab").get._2 === 3L)
  }

  test("a doc shorter than 2 chars is absent, others score normally") {
    val docs = Seq((0L, "x"), (1L, "xy xy")).toDF("doc_id", "text")
    val ids = LanguageModel.scoreDocs(docs).collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }

  test("the scoring join broadcasts the model — no shuffle of corpus bigrams for the join") {
    val docs = (0L until 50L).map(i => (i, "some plain text here")).toDF("doc_id", "text")
    val plan = LanguageModel.scoreDocs(docs).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("train + score share one corpus scan: the per-doc count exchange is reused") {
    // the corpus text must be scanned/exploded exactly once — the model
    // branch reads the SAME (doc_id, bg) shuffle the scoring branch
    // wrote. One scan node in the executed plan, plus a ReusedExchange
    // (AQE stage reuse) marking the dedup.
    val docs = (0L until 50L).map(i => (i, "some plain text here")).toDF("doc_id", "text")
    val scored = LanguageModel.scoreDocs(docs)
    scored.collect() // finalize THIS QueryExecution's adaptive plan
    val executed = scored.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange") || executed.contains("ReusedQueryStage"),
      executed)
  }
}
