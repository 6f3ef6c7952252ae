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

  test("keywordsTfIdf ranks rare repeated terms above common ones") {
    val got = Retrieval.keywordsTfIdf(corpus, k = 2)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._6).map(_._2).toList).toMap
    // doc 1: "beginners" appears twice and only in doc 1 → tf=2, df=1
    // → score 2·10⁶ beats every single-occurrence term
    assert(got(1L).head === "beginners")
    // doc 0: all terms tf=1; "quantum" has df=2 so any df=1 term of
    // doc 0 ("capacitor", "flux", ...) outranks it; ties break by term
    assert(got(0L) === List("capacitor", "flux"))
    // exact score arithmetic: tf·10⁶ DIV df
    val rows = Retrieval.keywordsTfIdf(corpus, k = 2)
      .filter(col("term") === "beginners").as[(Long, String, Long, Long, Long, Long)]
      .collect()
    assert(rows.toList === List((1L, "beginners", 2L, 1L, 2000000L, 1L)))
  }

  test("keywordsTfIdf emits at most k rows per doc with ranks 1..k") {
    val got = Retrieval.keywordsTfIdf(corpus, k = 3)
      .as[(Long, String, Long, Long, Long, Long)].collect()
    got.groupBy(_._1).values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_._6).sorted.toList === (1L to rs.length).toList)
    }
  }

  test("phraseSearch: consecutive-token matches only, overlaps counted, positions exact") {
    val docs = Seq(
      (1L, "a b c a b c a b"),       // "a b c" at 0 and 3; "a b" also at 6
      (2L, "a c b a b"),             // "a b" at 3 only; no "a b c"
      (3L, "b c a"),                 // neither
      (4L, "a a a a")                // "a a" OVERLAPS: positions 0,1,2
    ).toDF("doc_id", "text")
    def got(p: String*) = Retrieval.phraseSearch(docs, p)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got("a", "b") ===
      List((1L, 3L, 0L), (2L, 1L, 3L)))
    assert(got("a", "b", "c") === List((1L, 2L, 0L)))
    assert(got("a", "a") === List((4L, 3L, 0L))) // overlapping occurrences
    assert(got("z") === Nil)                     // absent term: empty, no error
    // single-term phrase degenerates to the posting list itself
    assert(got("c") === List((1L, 2L, 2L), (2L, 1L, 1L), (3L, 1L, 1L)))
    // malformed phrases fail loudly
    intercept[IllegalArgumentException] {
      Retrieval.phraseSearch(docs, Seq("a b"))
    }
    intercept[IllegalArgumentException] {
      Retrieval.phraseSearch(docs, Nil)
    }
  }

  test("nearSearch: banded co-occurrence, exact distances, symmetric in its terms") {
    val docs = Seq(
      (1L, "x a y y b x a"), // a@{1,6}, b@4 → dists {3,2} at window 3
      (2L, "a x x x x b"),   // dist 5 — outside window 3, inside 5
      (3L, "b a")            // adjacent, dist 1
    ).toDF("doc_id", "text")
    def got(a: String, b: String, w: Int) = Retrieval
      .nearSearch(docs, a, b, w)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got("a", "b", 3) === List((1L, 2L, 2L), (3L, 1L, 1L)))
    assert(got("b", "a", 3) === got("a", "b", 3)) // symmetric
    assert(got("a", "b", 5) ===
      List((1L, 2L, 2L), (2L, 1L, 5L), (3L, 1L, 1L)))
    assert(got("a", "z", 3) === Nil) // absent term: empty, no error
    intercept[IllegalArgumentException] {
      Retrieval.nearSearch(docs, "a", "a", 3)
    }
    intercept[IllegalArgumentException] {
      Retrieval.nearSearch(docs, "a", "b", 0)
    }
  }
}
