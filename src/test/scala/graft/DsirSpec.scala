package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance scores: exact equivalence with a single-threaded
  * reference fold, selection behavior (target-like docs outrank
  * target-unlike docs), and edge handling. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    // target domain: "ml" vocabulary
    (1L, "model training data tokens model", "t"),
    (2L, "training tokens model gradient", "t"),
    // raw-only docs: one ml-like, one off-domain
    (3L, "model training tokens", "r"),
    (4L, "invoice payment ledger tax", "r"),
    (5L, "payment model ledger", "r"),
    (6L, "   ", "r") // whitespace-only → no tokens → no output row
  ).toDF("doc_id", "text", "dom")

  private def scores: Map[Long, (Long, Double)] =
    Dsir.importanceScores(docs, "doc_id", "text", col("dom") === "t")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> (n, s) }.toMap

  test("scores ≡ single-threaded reference fold (exact integers)") {
    val rows = docs.as[(Long, String, String)].collect()
    val toks = rows.flatMap { case (id, t, d) =>
      t.trim.split("\\s+").filter(_.nonEmpty).map(w => (id, w, d == "t")) }
    val cR = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cT = toks.filter(_._3).groupBy(_._2)
      .view.mapValues(_.length.toLong).toMap
    def ratio(w: String): Long =
      (cT.getOrElse(w, 0L) + 1L) * 1000000L / (cR(w) + 1L)
    val expect = toks.groupBy(_._1).map { case (id, ts) =>
      val rs = ts.map(t => ratio(t._2))
      id -> (ts.length.toLong, rs.sum.toDouble / ts.length.toDouble)
    }
    assert(scores == expect)
  }

  test("target-vocabulary docs outrank off-domain docs; score ≤ 10⁶") {
    val s = scores
    assert(!s.contains(6L), "token-less doc must drop out")
    // doc 3 shares all its words with the target; doc 4 shares none
    assert(s(3L)._2 > s(4L)._2)
    // mixed doc 5 lands between the extremes
    assert(s(5L)._2 > s(4L)._2 && s(5L)._2 < s(3L)._2)
    s.values.foreach { case (_, sc) => assert(sc > 0.0 && sc <= 1000000.0) }
  }

  test("score is partition-invariant (order-insensitive integer sum)") {
    val a = Dsir.importanceScores(docs.repartition(7), "doc_id", "text",
      col("dom") === "t").as[(Long, Long, Double)].collect().toSet
    val b = Dsir.importanceScores(docs.coalesce(1), "doc_id", "text",
      col("dom") === "t").as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }
}
