package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Sparse-lexical retrieval over the corpus: BM25 top-k — the
  * "find training documents like these seeds" primitive behind
  * retrieval-based curation (seed-similar upsampling, targeted corpus
  * slices, nearest-neighbor quality audits by keyword rather than
  * embedding).
  *
  * Scale design:
  *   - the corpus term-frequency table is the only corpus-sized
  *     intermediate; everything else (document frequencies, query
  *     terms, the 1-row corpus stats) is vocabulary- or query-sized;
  *   - the query-term table broadcasts FIRST, so the scoring join
  *     touches only postings of query terms — cost ∝ matched postings,
  *     never |corpus| × |queries|;
  *   - per-document scores aggregate FIXED-POINT contributions:
  *     each term's (bit-identical IEEE) double is quantized to
  *     micro-points via `floor(c · 10⁶)` and summed as longs — exact
  *     and order-insensitive under any partitioning (a raw double sum
  *     would be partition-order-dependent — gate rule 2). A
  *     DECIMAL(38,15) intermediate was measured and rejected: the
  *     double→decimal CAST itself rounds differently across engines
  *     (Spark goes through the shortest string representation, DuckDB
  *     rounds the exact binary value), producing last-ulp mismatches;
  *     `floor` of an identical double is identical everywhere;
  *   - top-k per query is a rank over the already-reduced scored set.
  *
  * Exactness: idf is the RATIONAL form (N − df + ½)/(df + ½) — the
  * standard BM25 idf without the log. The log damps idf's dynamic
  * range but contributes nothing to ordering for single-term matches
  * and little for short queries; dropping it keeps every operation in
  * IEEE-exact +,−,×,÷ (libm `ln` is not correctly-rounded and differs
  * across engines, which would break the bit-exact DuckDB oracle).
  * Swap in `log(...)` for published-BM25 fidelity where cross-engine
  * bit-equality is not a requirement. */
object Retrieval {

  /** Top-`k` corpus documents per query by rational-idf BM25.
    *
    * `queries` must expose (query_id, text); query term multiplicity is
    * ignored (set semantics — standard BM25). Output: (query_id,
    * doc_id, rank, score), rank 1..k by (score desc, doc_id asc).
    * Query documents drawn from the corpus match themselves — the
    * standard sanity anchor (self ranks first). */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast(LongType).as("dl"))
    // 1-row corpus stats; avgdl = sum/count in DOUBLE on both sides
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast(DoubleType) / count(lit(1))).as("avgdl"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qt = queries
      .select(col("query_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .distinct()
    // query terms restrict FIRST (broadcast), then attach df/dl/stats
    // to the matched postings only. The literal arithmetic mirrors the
    // oracle SQL token for token — same IEEE ops, same association —
    // so scores are bit-identical.
    val contrib = tf
      .join(broadcast(qt), "term")
      .join(dfT, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats)) // one row: n_docs, avgdl
      .select(col("query_id"), col("doc_id"),
        floor((((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1.0))
          / (col("tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          * lit(1000000.0)).as("c"))
    val scores = contrib.groupBy("query_id", "doc_id")
      .agg(sum("c").as("sc"))
    val w = Window.partitionBy("query_id").orderBy(desc("sc"), asc("doc_id"))
    scores.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        (col("sc").cast(DoubleType) / lit(1000000.0)).as("score"))
  }

  /** Top-`k` keywords per document by exact integer tf-idf: the
    * "what is this document about" extraction feeding topic audits and
    * per-domain vocabularies.
    *
    *   score = (tf · scale) DIV df
    *
    * Rationale: within ONE corpus the document count N is a constant,
    * so ranking by tf·N/df and by tf/df is the same per-document
    * ordering up to floor interaction — omitting N keeps the product
    * inside a long at ANY corpus size (tf ≤ doc length, scale = 10⁶;
    * tf·scale·N would overflow at web scale) and keeps every op in
    * exact integer arithmetic (no libm log — same discipline as
    * `bm25TopK`'s rational idf).
    *
    * Shape: tf is the one corpus-sized intermediate (one shuffle on
    * (doc, term)); df aggregates it to vocab size (shuffle on term);
    * scoring joins tf ⋈ df on term; top-k is a WindowGroupLimit rank
    * per document — no global sort anywhere.
    */
  def keywordsTfIdf(docs: DataFrame, k: Int,
                    scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast(LongType).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).cast(LongType).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("term"))
    tf.join(dfT, "term")
      .withColumn("score", expr(s"(tf * ${scale}L) DIV df"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Exact PHRASE search over a positional inverted index: documents
    * containing `phrase` as consecutive whitespace tokens, with
    * occurrence count and first match position (0-based). Emits
    * (doc_id, n_occ, first_pos).
    *
    * Shape: postings (doc, pos, term) are FILTERED to the phrase's own
    * terms before anything shuffles — the classic inverted-index probe,
    * so cost ∝ the phrase terms' posting lists, never |corpus tokens|.
    * Position intersection is a chain of (doc, pos−i) equi-joins, one
    * per phrase term past the first: each join is posting-list-sized
    * and co-partitions on doc_id, exactly the merge a monolithic
    * search engine does per posting cursor — expressed as joins so
    * Catalyst plans, reorders, and (for rare terms) broadcasts them. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phraseSearch: each phrase term must be one whitespace-free " +
        s"token, got ${phrase.mkString("[", ", ", "]")}")
    val toks = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
    def postings(t: String) = toks.filter(col("term") === lit(t))
    val first = postings(phrase.head).select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (t, i)) =>
        val next = postings(t)
          .select(col("doc_id").as("_d"), (col("pos") - lit(i)).as("_p"))
        acc.join(next, col("doc_id") === col("_d") && col("pos") === col("_p"))
          .select(col("doc_id"), col("pos"))
    }
    matched.groupBy("doc_id")
      .agg(count(lit(1)).as("n_occ"),
        min(col("pos").cast(LongType)).as("first_pos"))
  }

  /** PROXIMITY search over the same positional index: documents where
    * `a` and `b` occur within `window` tokens of each other — the
    * "terms near each other" relevance primitive between bag-of-words
    * (BM25) and exact adjacency ([[phraseSearch]]). Emits (doc_id,
    * n_pairs, min_dist): co-occurring position pairs and the closest
    * distance.
    *
    * Shape: both posting lists filter BEFORE the shuffle; the
    * proximity join is an equi-join on doc_id with the |Δpos| ≤ window
    * band as a post-join filter — never a cross product, and the
    * per-document pair fan-out is bounded by the two terms' in-document
    * frequencies (tiny for any real query term). */
  def nearSearch(docs: DataFrame, a: String, b: String,
                 window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(a != b, "nearSearch: use phraseSearch/postings for a = b")
    require(Seq(a, b).forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"nearSearch: terms must be whitespace-free tokens, got '$a', '$b'")
    val toks = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
    val pa = toks.filter(col("term") === lit(a))
      .select(col("doc_id"), col("pos").as("_pa"))
    val pb = toks.filter(col("term") === lit(b))
      .select(col("doc_id").as("_d"), col("pos").as("_pb"))
    pa.join(pb, col("doc_id") === col("_d") &&
        abs(col("_pa") - col("_pb")) <= window)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("_pa") - col("_pb")).cast(LongType)).as("min_dist"))
  }
}
