package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25 retrieval semantics on a planted corpus (the gated twin
  * `text_bm25_topk` hash-checks the full algebra against DuckDB). */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "quantum flux capacitor theory primer"),
    (1L, "quantum mechanics for beginners and beginners"),
    (2L, "cooking pasta with garlic and butter"),
    (3L, "garlic butter pasta recipe collection"),
    (4L, "unrelated filler words occupying space here")
  ).toDF("doc_id", "text")

  private def topk(queryIds: Long*) = Retrieval.bm25TopK(
    corpus,
    corpus.filter(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("query_id"), col("text")),
    k = 3)

  test("a query document retrieves itself first") {
    val rows = topk(0L).orderBy("rank").collect()
    assert(rows.head.getAs[Long]("doc_id") === 0L)
    assert(rows.head.getAs[Long]("rank") === 1L)
  }

  test("term overlap drives ranking: topical neighbors beat unrelated docs") {
    val rows = topk(2L).orderBy("rank").collect()
    val ranked = rows.map(_.getAs[Long]("doc_id")).toSeq
    // the pasta doc retrieves the other pasta doc before anything quantum
    assert(ranked.head === 2L)
    assert(ranked(1) === 3L)
    assert(!ranked.contains(0L) || ranked.indexOf(3L) < ranked.indexOf(0L))
  }

  test("docs sharing no query term are never retrieved") {
    val rows = topk(0L).collect()
    // doc 2/3 share no term with the quantum query (stopword-free corpus)
    assert(!rows.map(_.getAs[Long]("doc_id")).contains(2L))
    assert(!rows.map(_.getAs[Long]("doc_id")).contains(3L))
  }

  test("scores are deterministic across runs and rank is a total order") {
    val a = topk(0L, 2L).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val b = topk(0L, 2L).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a === b)
    // within a query, ranks are 1..n with strictly ordered (score, id)
    val perQ = a.groupBy(_._1)
    perQ.values.foreach { rs =>
      assert(rs.map(_._3) === (1L to rs.size).toSet)
    }
  }
}
