package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.TextFunctions._
import graft.operators.Curation

/** Text-analysis inventory (LLM-pipeline surface) over `documents`.
  * All built-ins, all codegen'd, all one scan — no UDFs, no shuffle
  * except the final oracle-determinism sort. */
object TextOps {

  /** Stopwords present in the corpus vocabulary. */
  val Stopwords: Seq[String] = Seq("the", "a")

  /** Marker words per language, in argmax priority order — MUST stay in
    * sync with the oracle SQL of `text_lang_id`. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "es" -> Seq("el", "la", "que"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "et"),
    "zh" -> Seq("的", "是"))

  /** Shared corpus-index substrate of the novelty/growth reports: one
    * md5-hashed (doc_id, h) row per word-`n`-gram occurrence — thin
    * 32-byte keys, the document text never shuffles. Callers distinct
    * or min-aggregate as their semantics need. */
  private def shingleKeys(docs: org.apache.spark.sql.DataFrame,
                          n: Int): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(shinglesFromTokens(col("toks"), n)).as("sh"))
      .select(col("doc_id"), md5(col("sh")).as("h"))

  val entries: Seq[Entry] = Seq(

    // token counting: whitespace + BPE-ish regex proxy.
    Entry(
      "text_token_count",
      (s, dir) => Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          tokenCount(col("text")).cast(LongType).as("n_tokens"),
          regexTokenCount(col("text")).cast(LongType).as("n_regex_tokens"),
          col("n_chars"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                     len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_regex_tokens,
                     n_chars
              FROM documents ORDER BY doc_id""")),

    // quality scoring: length saturation, stopword ratio, mean token len.
    Entry(
      "text_quality_score",
      (s, dir) => Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          tokenCount(col("text")).cast(LongType).as("n_tokens"),
          meanTokenLength(col("text")).as("mean_tok_len"),
          stopwordRatio(col("text"), Stopwords).as("stop_ratio"),
          qualityScore(col("text"), Stopwords).as("quality"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents),
              s AS (
                SELECT doc_id,
                       len(toks) AS nt,
                       len(list_filter(toks, x -> x IN ('the', 'a'))) AS ns,
                       list_aggregate(list_transform(toks, x -> CAST(length(x) AS BIGINT)), 'sum') AS sumlen
                FROM t)
              SELECT doc_id,
                     CAST(nt AS BIGINT) AS n_tokens,
                     CAST(sumlen AS DOUBLE) / CAST(nt AS DOUBLE) AS mean_tok_len,
                     CAST(ns AS DOUBLE) / CAST(nt AS DOUBLE) AS stop_ratio,
                     LEAST(CAST(nt AS DOUBLE) / 100.0, 1.0)
                       * (1.0 - CAST(ns AS DOUBLE) / CAST(nt AS DOUBLE)) AS quality
              FROM s ORDER BY doc_id""")),

    // language-ID heuristic (marker-word argmax, first-wins ties) compared
    // against the labeled lang column.
    Entry(
      "text_lang_id",
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
        .select(
          col("doc_id"), col("lang"),
          langIdFromTokens(col("toks"), LangMarkers).as("pred_lang"))
        .withColumn("agree", (col("pred_lang") === col("lang")).cast(IntegerType))
        .orderBy("doc_id"),
      // The CASE chain is the strictly-greater argmax fold: a later
      // language wins only if it strictly beats the running max.
      Some("""WITH t AS (
                SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents),
              h AS (
                SELECT doc_id, lang,
                       len(list_filter(toks, x -> x IN ('the', 'a'))) AS he,
                       len(list_filter(toks, x -> x IN ('el', 'la', 'que'))) AS hs,
                       len(list_filter(toks, x -> x IN ('der', 'die', 'und'))) AS hd,
                       len(list_filter(toks, x -> x IN ('le', 'les', 'et'))) AS hf,
                       len(list_filter(toks, x -> x IN ('的', '是'))) AS hz
                FROM t)
              SELECT doc_id, lang,
                     CASE WHEN hz > GREATEST(he, hs, hd, hf) THEN 'zh'
                          WHEN hf > GREATEST(he, hs, hd) THEN 'fr'
                          WHEN hd > GREATEST(he, hs) THEN 'de'
                          WHEN hs > he THEN 'es'
                          ELSE 'en' END AS pred_lang,
                     CASE WHEN (CASE WHEN hz > GREATEST(he, hs, hd, hf) THEN 'zh'
                                     WHEN hf > GREATEST(he, hs, hd) THEN 'fr'
                                     WHEN hd > GREATEST(he, hs) THEN 'de'
                                     WHEN hs > he THEN 'es'
                                     ELSE 'en' END) = lang
                          THEN 1 ELSE 0 END AS agree
              FROM h ORDER BY doc_id""")),

    // Gopher-style repetition stats: most frequent unigram/bigram and
    // their fractions — the repetition filters of Rae et al. §A1.2. The
    // Spark side is a zero-shuffle sorted-run fold (TextFunctions
    // .topGram); the oracle is the relational explode → count → rank
    // formulation — identical argmax with (count desc, gram asc) ties.
    // Bigram columns join LEFT: a <2-token doc has no bigrams, so
    // top_bigram/top_bigram_frac are NULL on both sides (an inner join
    // would drop the doc row entirely; the Spark side guards the
    // denominator so no 0/0 NaN can leak into a downstream gate).
    Entry(
      "text_repetition",
      (s, dir) => graft.operators.Curation
        .repetitionStats(Tables(s, dir, "documents"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM documents),
              u AS (SELECT doc_id, unnest(w) AS tok FROM t),
              uc AS (SELECT doc_id, tok, COUNT(*) AS c FROM u GROUP BY 1, 2),
              tu AS (
                SELECT doc_id, tok, c FROM (
                  SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id ORDER BY c DESC, tok ASC) AS rk
                  FROM uc) WHERE rk = 1),
              b AS (
                SELECT doc_id, array_to_string(list_slice(w, i, i+1), ' ') AS bg
                FROM t, unnest(generate_series(1, len(w) - 1)) AS s(i)
                WHERE len(w) >= 2),
              bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY 1, 2),
              tb AS (
                SELECT doc_id, bg, c FROM (
                  SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id ORDER BY c DESC, bg ASC) AS rk
                  FROM bc) WHERE rk = 1)
              SELECT t.doc_id,
                     CAST(len(w) AS BIGINT) AS n_tokens,
                     tu.tok AS top_tok,
                     CAST(tu.c AS DOUBLE) / CAST(len(w) AS DOUBLE) AS top_tok_frac,
                     tb.bg AS top_bigram,
                     CAST(tb.c AS DOUBLE) / CAST(len(w) - 1 AS DOUBLE) AS top_bigram_frac
              FROM t
                JOIN tu ON t.doc_id = tu.doc_id
                LEFT JOIN tb ON t.doc_id = tb.doc_id
              ORDER BY t.doc_id""")),

    // PII scrubbing over free text: email + phone spans replaced by
    // typed tags — the corpus twin of the reference's column-level
    // masking view (init-db.sql:74-89 nulls whole PII COLUMNS per user;
    // a training corpus must redact PII SPANS inside text). documents
    // .text carries no PII by construction, so the gate synthesizes
    // contact strings from customer rows IDENTICALLY on both sides and
    // certifies that the Java and RE2 regex engines agree on the
    // redaction over real matches.
    Entry(
      "text_pii_scrub",
      (s, dir) => Tables(s, dir, "customer")
        .select(col("c_custkey"),
          concat(col("c_name"), lit(" <"),
            lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", "")),
            lit("@example.com> call 555-"),
            col("c_custkey").cast(StringType)).as("contact"))
        .select(col("c_custkey"), col("contact"),
          scrubPii(col("contact")).as("scrubbed"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, contact,
                     regexp_replace(regexp_replace(contact,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\d{3}-\d+', '<PHONE>', 'g') AS scrubbed
              FROM (
                SELECT c_custkey,
                       c_name || ' <' ||
                         lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) ||
                         '@example.com> call 555-' || CAST(c_custkey AS VARCHAR)
                         AS contact
                FROM customer)
              ORDER BY c_custkey""")),

    // corpus-level vocabulary heavy hitters: top-20 tokens by total
    // frequency — the tokenizer-vocabulary / stopword-discovery scan.
    // Shape: explode → map-side partial counts → one shuffle on token →
    // TakeOrderedAndProject (top-k never global-sorts). Total ordering
    // via (count desc, token asc) keeps the cut deterministic.
    Entry(
      "text_vocab_topk",
      (s, dir) => Tables(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("tok"))
        .limit(20),
      Some("""SELECT tok, COUNT(*) AS n
              FROM (SELECT UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS tok
                    FROM documents)
              GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20""")),

    // BM25 top-k retrieval: the "find training docs like these seeds"
    // primitive of retrieval-based curation. Query set = docs 0-2, set
    // semantics on query terms, k = 10. Rational idf (no log — libm ln
    // is not correctly rounded and differs across engines) keeps every
    // op IEEE-exact so per-term doubles are bit-identical to the
    // oracle; per-doc sums ride floor(c·10⁶) micro-point LONGS
    // (order-insensitive, rule 2 — a DECIMAL intermediate was measured
    // to diverge at the last ulp because the double→decimal CAST
    // rounds differently across engines). Self-match ranks first
    // (sanity anchor). The oracle is the same algebra token for token.
    Entry(
      "text_bm25_topk",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        graft.operators.Retrieval.bm25TopK(docs,
            docs.filter(col("doc_id") < 3)
              .select(col("doc_id").as("query_id"), col("text")),
            k = 10)
          .orderBy("query_id", "rank")
      },
      Some("""WITH toks AS (
                SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
                FROM documents),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
              dl AS (
                SELECT doc_id,
                       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS dl
                FROM documents),
              stats AS (
                SELECT COUNT(*) AS n_docs,
                       CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
                FROM dl),
              dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
              qt AS (
                SELECT DISTINCT doc_id AS query_id, term FROM toks
                WHERE doc_id < 3),
              contrib AS (
                SELECT qt.query_id, tf.doc_id,
                       CAST(floor((((s.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
                         * (tf.tf * (1.2 + 1.0))
                         / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / s.avgdl)))
                         * 1000000.0) AS BIGINT) AS c
                FROM tf
                  JOIN qt ON tf.term = qt.term
                  JOIN dfr ON tf.term = dfr.term
                  JOIN dl ON tf.doc_id = dl.doc_id, stats s),
              scores AS (
                SELECT query_id, doc_id, SUM(c) AS sc
                FROM contrib GROUP BY 1, 2),
              r AS (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY sc DESC, doc_id ASC) AS rank
                FROM scores)
              SELECT query_id, doc_id, rank,
                     CAST(sc AS DOUBLE) / 1000000.0 AS score
              FROM r WHERE rank <= 10 ORDER BY query_id, rank""")),

    // ⊕ exact phrase search over a positional inverted index — the
    // lexical primitive BM25 can't express (term ADJACENCY): which
    // documents contain the exact phrase "hash join", how often, and
    // where it first appears. Postings filter to the phrase's own
    // terms BEFORE any shuffle (the inverted-index probe), the
    // position intersection is a (doc, pos−i) equi-join chain — cost ∝
    // the two terms' posting lists at any corpus size. The oracle
    // rebuilds the same positional index via DuckDB's zipped unnest
    // and replays the intersection verbatim.
    Entry(
      "text_phrase_search",
      (s, dir) => graft.operators.Retrieval
        .phraseSearch(Tables(s, dir, "documents"), Seq("hash", "join"))
        .orderBy("doc_id"),
      Some("""WITH arr AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                FROM documents),
              toks AS (
                SELECT doc_id,
                       CAST(unnest(range(1, len(a)+1)) AS BIGINT) - 1 AS pos,
                       unnest(a) AS term
                FROM arr),
              m0 AS (SELECT doc_id, pos FROM toks WHERE term = 'hash'),
              m1 AS (SELECT doc_id, pos FROM toks WHERE term = 'join'),
              hits AS (
                SELECT m0.doc_id, m0.pos
                FROM m0 JOIN m1
                  ON m1.doc_id = m0.doc_id AND m1.pos = m0.pos + 1)
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ,
                     MIN(pos) AS first_pos
              FROM hits GROUP BY 1 ORDER BY doc_id""")),

    // ⊕ proximity search — the relevance shape between bag-of-words
    // and exact adjacency: documents where "hash" and "scan" fall
    // within 3 tokens of each other, with the co-occurrence count and
    // closest distance. Both posting lists filter before the shuffle;
    // the proximity condition is a post-equi-join band filter, never a
    // cross product.
    Entry(
      "text_near_search",
      (s, dir) => graft.operators.Retrieval
        .nearSearch(Tables(s, dir, "documents"), "hash", "scan", 3)
        .orderBy("doc_id"),
      Some("""WITH arr AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                FROM documents),
              toks AS (
                SELECT doc_id,
                       CAST(unnest(range(1, len(a)+1)) AS BIGINT) - 1 AS pos,
                       unnest(a) AS term
                FROM arr),
              pa AS (SELECT doc_id, pos FROM toks WHERE term = 'hash'),
              pb AS (SELECT doc_id, pos FROM toks WHERE term = 'scan'),
              hits AS (
                SELECT pa.doc_id, abs(pa.pos - pb.pos) AS dist
                FROM pa JOIN pb
                  ON pb.doc_id = pa.doc_id
                 AND abs(pa.pos - pb.pos) <= 3)
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                     MIN(dist) AS min_dist
              FROM hits GROUP BY 1 ORDER BY doc_id""")),

    // document fingerprinting (md5 of normalized text = the dedup key).
    Entry(
      "text_fingerprint",
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     md5(array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')) AS fp
              FROM documents ORDER BY doc_id"""))
,
    // Winnowing fingerprints (rolling-hash family, Schleimer et al.):
    // min shingle-hash per sliding window — detects PARTIAL overlap
    // where text_fingerprint only catches whole-doc duplicates. md5
    // strings + lexicographic min make the selector identical in DuckDB.
    Entry(
      "text_winnow_fp",
      (s, dir) => Tables.spread(Tables(s, dir, "documents"))
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), shinglesFromTokens(col("toks"), 3).as("sh"))
        .select(col("doc_id"),
          explode(winnowFingerprints(col("sh"), 4)).as("fp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"), min(col("fp")).as("min_fp")),
      Some("""WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM documents),
              s AS (
                SELECT doc_id,
                       list_transform(generate_series(1, len(w) - 2),
                         i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS hs
                FROM t WHERE len(w) >= 3),
              wins AS (
                SELECT doc_id,
                       list_distinct(list_transform(generate_series(1, len(hs) - 3),
                         i -> list_min(hs[i:i+3]))) AS fps
                FROM s WHERE len(hs) >= 4)
              SELECT doc_id, len(fps) AS n_fp, list_min(fps) AS min_fp
              FROM wins""")),

    // boilerplate discovery: the word-8-grams shared by the most
    // DOCUMENTS (doc frequency, not raw count) — license headers, nav
    // chrome, templates. Shape: distinct (doc, shingle) → df count →
    // TakeOrderedAndProject; the same hot-shingle signal the ngram
    // dedup path caps (Dedup.maxShingleDocFreq), surfaced as a report.
    Entry(
      "text_boilerplate_ngrams",
      (s, dir) => Tables.spread(Tables(s, dir, "documents"))
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(shinglesFromTokens(col("toks"), 8)).as("s8"))
        .distinct()
        .groupBy("s8").agg(count(lit(1)).cast(LongType).as("df"))
        .filter(col("df") >= 2)
        .orderBy(desc("df"), asc("s8"))
        .limit(20),
      Some("""WITH words AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM documents),
              sh AS (
                SELECT DISTINCT doc_id,
                       array_to_string(list_slice(w, i, i+7), ' ') AS s8
                FROM words, unnest(generate_series(1, len(w) - 7)) AS t(i)
                WHERE len(w) >= 8)
              SELECT s8, CAST(COUNT(*) AS BIGINT) AS df
              FROM sh GROUP BY s8 HAVING COUNT(*) >= 2
              ORDER BY df DESC, s8 ASC LIMIT 20""")),

    // corpus-trained char-bigram LM scoring (the CCNet/KenLM filter
    // shape in miniature): P(bigram) estimated from the corpus itself,
    // docs scored by mean bigram probability. Probabilities ride exact
    // integer micro-points (floor(1e6·n2/n1) via DIV ≡ DuckDB //) so
    // the fold is order-free and bit-identical — no libm log. The
    // model table is ≤ |charset|² rows whatever the corpus size: it
    // broadcasts, and scoring is map-side after one training count.
    Entry(
      "text_char_lm",
      (s, dir) => graft.operators.LanguageModel
        .scoreDocs(Tables(s, dir, "documents"))
        .orderBy("doc_id"),
      Some("""WITH bg AS (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, length(text) - 1),
                         i -> substring(text, i, 2))) AS bg
                FROM documents),
              counts AS (SELECT bg, COUNT(*) AS n2 FROM bg GROUP BY bg),
              prefix AS (
                SELECT substring(bg, 1, 1) AS c1, SUM(n2) AS n1
                FROM counts GROUP BY 1),
              model AS (
                SELECT bg, n2, n1 FROM counts
                JOIN prefix ON substring(counts.bg, 1, 1) = prefix.c1),
              scored AS (
                SELECT b.doc_id,
                       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                       CAST(SUM((1000000 * m.n2) // m.n1) AS BIGINT) AS lm_micro_sum
                FROM bg b JOIN model m ON b.bg = m.bg
                GROUP BY b.doc_id)
              SELECT doc_id, n_bigrams, lm_micro_sum,
                     CAST(lm_micro_sum AS DOUBLE) / (1000000.0 * n_bigrams) AS lm_score
              FROM scored ORDER BY doc_id""")),

    // hashed bag-of-words linear scorer (fasttext-shaped): feature-hash
    // every token into 256 buckets, sum per-bucket weights, squash
    // rationally (z/(1+|z|) — libm exp/tanh are not correctly rounded
    // and would diverge across engines; the rational squash is IEEE
    // division + abs, bit-exact). Map-side only: no shuffle, no UDF —
    // the shape of running a learned quality classifier over 100 TB.
    // Integer weight sums keep the fold order-free (rule 2).
    Entry(
      "text_quality_model",
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          tokenCount(col("text")).cast(LongType).as("n_tokens"),
          hashedBowSum(col("text")).as("bow_sum"))
        .withColumn("bow_logit",
          col("bow_sum").cast(DoubleType) / (lit(256.0) * col("n_tokens")))
        .withColumn("bow_score",
          col("bow_logit") / (lit(1.0) + abs(col("bow_logit"))))
        .orderBy("doc_id"),
      Some("""WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents),
              s AS (
                SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                       CAST(list_aggregate(list_transform(toks, x ->
                         (instr('0123456789abcdef', substring(md5(x), 1, 1)) - 1) * 16
                           + instr('0123456789abcdef', substring(md5(x), 2, 1)) - 1
                           - 128), 'sum') AS BIGINT) AS bow_sum
                FROM t),
              z AS (
                SELECT doc_id, n_tokens, bow_sum,
                       CAST(bow_sum AS DOUBLE) / (256.0 * n_tokens) AS bow_logit
                FROM s)
              SELECT doc_id, n_tokens, bow_sum, bow_logit,
                     bow_logit / (1.0 + abs(bow_logit)) AS bow_score
              FROM z ORDER BY doc_id""")),

    // the SAME top-20 vocabulary, computed with bounded memory: merged
    // Misra-Gries sketches (256 counters/task however many distinct
    // tokens stream by) nominate candidates, a second pass exact-counts
    // candidates only. ≡ text_vocab_topk whenever the 20th frequency
    // exceeds N/257 (holds on this corpus by orders of magnitude); the
    // oracle IS the exact top-k SQL — a hash match certifies the sketch
    // path loses nothing. This is the shape that survives a token
    // domain too large for per-task count maps at 100 TB.
    Entry(
      "text_vocab_topk_mg",
      (s, dir) => graft.operators.HeavyHitters.topK(
        Tables(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("tok")),
        "tok", k = 20, sketchK = 256),
      Some("""SELECT tok, COUNT(*) AS n
              FROM (SELECT UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS tok
                    FROM documents)
              GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20""")),

    // first BPE merge-round statistics: top adjacent CHARACTER pairs
    // across the corpus. The scale trick: aggregate to the DISTINCT
    // vocabulary first (heavy shuffle on small keys), then explode
    // char pairs over the vocab × its corpus frequency — pair work is
    // O(vocab · token_len), not O(corpus tokens). This
    // aggregate-then-expand shape is how every tokenizer-induction
    // pass should meet 100 TB. Total (n desc, pair asc) order keeps
    // the top-k cut deterministic.
    Entry(
      "text_bpe_pairs",
      (s, dir) => {
        val vocab = Tables(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("freq"))
        vocab
          .filter(length(col("tok")) >= 2)
          .select(explode(transform(
            sequence(lit(1), length(col("tok")) - 1),
            i => col("tok").substr(i, lit(2)))).as("pair"),
            col("freq"))
          .groupBy("pair").agg(sum(col("freq")).cast(LongType).as("n"))
          .orderBy(desc("n"), asc("pair"))
          .limit(20)
      },
      Some("""WITH vocab AS (
                SELECT tok, COUNT(*) AS freq
                FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                      FROM documents)
                GROUP BY tok),
              pairs AS (
                SELECT unnest(list_transform(
                         generate_series(1, length(tok) - 1),
                         i -> substring(tok, i, 2))) AS pair,
                       freq
                FROM vocab WHERE length(tok) >= 2)
              SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
              FROM pairs GROUP BY pair
              ORDER BY n DESC, pair ASC LIMIT 20""")),

    // per-source corpus report: doc/token totals + exact rank-based
    // percentiles of doc length. Percentiles are MANUAL rank picks
    // (floor((n+1)/2), ceil(0.9n)) over a (n_tokens, doc_id) total
    // order — engine-portable integer semantics, where quantile_cont /
    // percentile interpolation differs subtly across engines. Shape:
    // one narrow map pass → one shuffle on source → per-group window +
    // conditional agg; at 100 TB the window spans one source's docs,
    // not the corpus.
    Entry(
      "text_corpus_stats",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            tokenCount(col("text")).cast(LongType).as("n_tokens"))
        val w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
        t.withColumn("rk", row_number().over(w))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy("source")))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            (sum(col("n_tokens")).cast(DoubleType) / count(lit(1)))
              .as("avg_tokens"),
            max(when(col("rk") === floor((col("n") + lit(1)) / lit(2)),
              col("n_tokens"))).as("p50_tokens"),
            max(when(col("rk") === ceil(col("n") * lit(0.9)),
              col("n_tokens"))).as("p90_tokens"))
          .orderBy("source")
      },
      Some("""WITH t AS (
                SELECT source, doc_id,
                       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                         AS n_tokens
                FROM documents),
              r AS (
                SELECT source, n_tokens,
                       ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY n_tokens, doc_id) AS rk,
                       COUNT(*) OVER (PARTITION BY source) AS n
                FROM t)
              SELECT source,
                     CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                     CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
                     MAX(CASE WHEN rk = (n + 1) // 2 THEN n_tokens END) AS p50_tokens,
                     MAX(CASE WHEN rk = CAST(ceil(n * 0.9) AS BIGINT) THEN n_tokens END)
                       AS p90_tokens
              FROM r GROUP BY source ORDER BY source""")),

    // ⊕ per-document keyword extraction: top-5 terms by exact integer
    // tf-idf (score = tf·10⁶ DIV df; N omitted — constant per corpus,
    // and dropping it keeps the product in a long at web scale; no
    // libm log, same discipline as BM25's rational idf). tf is the one
    // corpus-sized intermediate; top-k is a per-doc rank, no global
    // sort. See operators/Retrieval.keywordsTfIdf.
    Entry(
      "text_keywords_tfidf",
      (s, dir) => graft.operators.Retrieval
        .keywordsTfIdf(Tables(s, dir, "documents"), k = 5)
        .orderBy("doc_id", "rank"),
      Some("""WITH t AS (
                SELECT doc_id,
                       UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS term
                FROM documents),
              tf AS (
                SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                FROM t GROUP BY 1, 2),
              df AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                FROM tf GROUP BY 1),
              sc AS (
                SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       (tf.tf * 1000000) // df.df AS score
                FROM tf JOIN df USING (term)),
              r AS (
                SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, term ASC) AS BIGINT) AS rank
                FROM sc)
              SELECT doc_id, term, tf, df, CAST(score AS BIGINT) AS score,
                     rank
              FROM r WHERE rank <= 5
              ORDER BY doc_id, rank""")),

    // ⊕ corpus novelty score — the "how much of this doc is new text"
    // signal curation pipelines weigh alongside quality (RefinedWeb /
    // Gopher style): per document, the fraction of its DISTINCT word-
    // 8-gram shingles whose corpus-FIRST sighting (min doc_id over all
    // docs containing the shingle) is this document. Shape: one
    // map-side shingle explosion hashed to md5 (thin 32-byte keys, the
    // document text never shuffles) → distinct (doc, shingle) → a
    // min-aggregate inverted index keyed on shingle → join back on the
    // SAME key (co-partitioned, no extra exchange) → per-doc counts.
    // Hot boilerplate shingles skew the join's probe side; the build
    // side is one row per shingle, so AQE skew-split handles it — the
    // same hazard profile as dedup_ngram_jaccard, without the pair
    // blowup. Novelty = exact integer division at emit.
    Entry(
      "text_novelty",
      (s, dir) => {
        val pairs = shingleKeys(Tables.spread(Tables(s, dir, "documents")), 8)
          .distinct()
        val first = pairs.groupBy("h").agg(min(col("doc_id")).as("first_doc"))
        pairs.join(first, "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .select(col("doc_id"), col("n_shingles"), col("n_novel"),
            (col("n_novel").cast(DoubleType) /
              col("n_shingles").cast(DoubleType)).as("novelty"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM documents),
              p AS (
                SELECT DISTINCT doc_id,
                       unnest(list_transform(generate_series(1, len(w)-7),
                         i -> md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||
                           w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||
                           w[i+6]||' '||w[i+7])))
                         AS h
                FROM t WHERE len(w) >= 8),
              f AS (SELECT h, MIN(doc_id) AS first_doc FROM p GROUP BY 1)
              SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                     CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_novel,
                     CAST(CAST(SUM(CASE WHEN f.first_doc = p.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS novelty
              FROM p JOIN f ON f.h = p.h
              GROUP BY 1 ORDER BY doc_id""")),

    // ⊕ vocabulary growth curve (Heaps-law report): word-3-gram TYPES
    // first seen per 1/16th of the doc_id axis, with the running total
    // — the measurement behind tokenizer sizing and "is more data
    // still adding new text" curation calls. Shares [[shingleKeys]]
    // with text_novelty (min is distinct-insensitive, so no distinct
    // here). The grid is FIXED at 16 buckets whatever the corpus
    // (width from one broadcast max(doc_id) row) and ZERO-FILLED, so
    // every curve has exactly 16 aligned rows and the cumulative
    // window runs over 16 — bounded by construction, PlanSpec-
    // allowlisted. Precondition: buckets slice the doc_id VALUE range,
    // so "1/16th of the corpus" reads correctly when ids are ~dense
    // from ~0 (as this table's are); for sparse/offset ids assign a
    // row-number-based position upstream first.
    Entry(
      "text_vocab_growth",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val first = shingleKeys(Tables.spread(Tables(s, dir, "documents")), 3)
          .groupBy("h").agg(min(col("doc_id")).as("first_doc"))
        val mx = Tables(s, dir, "documents").agg(max(col("doc_id")).as("mx"))
        val counted = first.crossJoin(broadcast(mx))
          .select(expr("first_doc DIV (mx DIV 16 + 1)").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
        val grid = s.range(16).select(col("id").as("bucket"))
        val buckets = grid.join(counted, Seq("bucket"), "left")
          .select(col("bucket"), coalesce(col("n"), lit(0L)).as("new_types"))
        val w = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        buckets
          .select(col("bucket"), col("new_types"),
            sum(col("new_types")).over(w).cast(LongType).as("cum_types"))
          .orderBy("bucket")
      },
      Some("""WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM documents),
              s AS (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(w)-2),
                         i -> md5(w[i]||' '||w[i+1]||' '||w[i+2]))) AS tok
                FROM t WHERE len(w) >= 3),
              f AS (SELECT tok, MIN(doc_id) AS first_doc FROM s GROUP BY 1),
              mx AS (SELECT MAX(doc_id) AS mx FROM documents),
              b AS (
                SELECT first_doc // (mx // 16 + 1) AS bucket, COUNT(*) AS n
                FROM f, mx GROUP BY 1),
              g AS (
                SELECT CAST(t.range AS BIGINT) AS bucket,
                       COALESCE(b.n, 0) AS new_types
                FROM range(0,16) t LEFT JOIN b ON b.bucket = t.range)
              SELECT bucket, CAST(new_types AS BIGINT) AS new_types,
                     CAST(SUM(new_types) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_types
              FROM g ORDER BY bucket""")),

    // Count-Min point-frequency with exact verify (the HeavyHitters
    // sketch-then-verify shape, but for PROBE-driven lookups): which
    // words of the src0 slice are corpus-frequent (freq ≥ N/100)?
    // Pass 1 reduces the corpus to a ≤ d·w cell grid (bounded state,
    // map-side combine); the probe's estimates are a broadcast join
    // against that grid; est ≥ true makes the candidate set a superset
    // of the truth, so pass 2's exact count over candidates-only gives
    // the exact answer — over-counts cost pass-2 work, never a wrong
    // row. At 100 TB the corpus is scanned twice but shuffled only on
    // ≤ d·w cells + the candidate vocabulary.
    Entry(
      "text_freq_cm",
      (s, dir) => {
        import graft.operators.CountMin
        val corpus = Tables(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= "")
        val probe = Tables(s, dir, "documents")
          .filter(col("source") === "src0")
          .select(explode(tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= "")
        val (d, w) = (4, 2048)
        val sk = CountMin.sketch(corpus, "tok", d, w)
        val est = CountMin.estimate(probe, "tok", sk, d, w)
        // the sketch carries N for free: every depth row's cells sum to
        // the stream length — no separate corpus-count scan (AQE reuses
        // the sketch exchange between this and the estimate)
        val total = sk.filter(col("j") === 0)
          .agg(sum(col("c")).cast(LongType).as("n_total"))
        val candidates = est.crossJoin(broadcast(total))
          .filter(col("est") >= expr("n_total DIV 100L"))
          .select("tok")
        corpus
          .join(broadcast(candidates), Seq("tok"), "left_semi")
          .groupBy("tok").agg(count(lit(1)).cast(LongType).as("n"))
          .crossJoin(broadcast(total))
          .filter(col("n") >= expr("n_total DIV 100L"))
          .select(col("tok"), col("n"))
          .orderBy("tok")
      },
      Some("""WITH corpus AS (
                SELECT tok
                FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                        AS tok
                      FROM documents)
                WHERE tok <> ''),
              probe AS (
                SELECT DISTINCT tok
                FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                        AS tok
                      FROM documents WHERE source = 'src0')
                WHERE tok <> ''),
              tot AS (SELECT COUNT(*) AS n_total FROM corpus)
              SELECT c.tok, CAST(COUNT(*) AS BIGINT) AS n
              FROM corpus c JOIN probe USING (tok), tot
              GROUP BY c.tok, tot.n_total
              HAVING COUNT(*) >= tot.n_total // 100
              ORDER BY tok""")),

    // tokenizer APPLICATION: per-doc token counts under a real BPE
    // merge table ([[graft.operators.Bpe.FixedMerges]] — tokenizer
    // config as input, the way a serving pipeline counts tokens).
    // Scale shape: the greedy merge fold (Bpe.applyMerge, an array
    // HOF — no UDF) runs once per DISTINCT word, never per corpus
    // occurrence; the corpus then equi-joins its exploded tokens to
    // the ≤|vocab| symbol-count table (AQE broadcasts it) and
    // aggregates per doc — one corpus-sized shuffle on doc_id, same
    // as any per-doc count. The oracle re-expresses the fold as two
    // string-replace passes per merge, exact for left≠right pairs
    // (proof: Bpe.replaceFoldEquivalence scaladoc; randomized law in
    // PropertySpec).
    Entry(
      "text_bpe_encode",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .filter(trim(col("text")) =!= "")
        val toks = docs.select(col("doc_id"),
          explode(tokens(col("text"))).as("tok"))
        val vocab = graft.operators.Bpe
          .encodeVocab(toks.select("tok").distinct(), graft.operators.Bpe.FixedMerges)
          .select(col("tok"), size(col("syms")).as("n_syms"))
        toks.join(vocab, "tok")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast(LongType).as("n_words"),
            sum(col("n_syms")).cast(LongType).as("n_bpe_tokens"))
          .orderBy("doc_id")
      },
      Some(raw"""WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                FROM documents WHERE trim(text) <> ''),
              vocab AS (
                SELECT tok,
                       ${graft.operators.Bpe.replaceFoldSql(
                         raw"(' ' || regexp_replace(tok, '(.)', '\1 ', 'g'))",
                         graft.operators.Bpe.FixedMerges)} AS seq
                FROM (SELECT DISTINCT tok FROM tok)),
              enc AS (
                SELECT tok,
                       length(seq) - length(replace(seq, ' ', '')) - 1 AS n_syms
                FROM vocab)
              SELECT t.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_words,
                     CAST(SUM(e.n_syms) AS BIGINT) AS n_bpe_tokens
              FROM tok t JOIN enc e USING (tok)
              GROUP BY t.doc_id ORDER BY t.doc_id""")),

    // ⊕ corpus-trained BPE merge TABLE, gated end-to-end: 6 rounds of
    // the real training loop (pair-count over the distinct vocabulary →
    // deterministic argmax → greedy merge fold), emitted as one row per
    // learned merge. The oracle REPLAYS TRAINING — six unrolled rounds
    // of pair-count/argmax/two-pass-replace in plain SQL — so the hash
    // certifies selection order, tie-breaks, and weighted counts, not
    // just a final encoding (the apply half text_bpe_encode already
    // gates). Candidates are restricted to non-self pairs, the exact
    // constraint under which Bpe.replaceFoldSql's replace∘replace ≡
    // fold proof licenses the string-form replay; the unconstrained
    // trainer stays spec-covered (BpeSpec). Learned merges compose
    // across rounds (round 6 at sf0.01 merges 'm'+'er', consuming
    // round 1's product). Scale: per round one aggregate over Σ|word|
    // symbol pairs of the DISTINCT vocab — never the corpus — a 1-row
    // readout, and a map-side fold (the HeavyHitters bounded-readout
    // contract); k rounds cost k vocab scans however large the corpus.
    Entry(
      "text_bpe_train",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .filter(trim(col("text")) =!= "")
        val merges = graft.operators.Bpe.trainReplayable(docs, 6)
        import s.implicits._
        merges.map(m => (m.round.toLong, m.left, m.right, m.n))
          .toDF("round", "lhs", "rhs", "n").orderBy("round")
      },
      Some(graft.operators.Bpe.trainReplaySql(6))),

    // ⊕ hashing-trick text features: word uni+bigrams hashed into 256
    // signed buckets (bucket from the 48-bit md5 integer, sign from an
    // independent hex digit — the fastText/Vowpal feature map that
    // gives quality/topic classifiers a FIXED-WIDTH input whatever the
    // vocabulary). Map-side explode → codegen'd md5 → one partial-agg
    // fold; the feature space is 256 buckets however large the corpus.
    // Same md5-derived integer family as the curation samplers, so the
    // oracle replays every bucket and sign exactly.
    Entry(
      "text_hash_features",
      (s, dir) => {
        val toks = Tables.spread(Tables(s, dir, "documents"))
          .select(col("doc_id"), tokens(col("text")).as("toks"))
        toks
          .select(col("doc_id"), explode(concat(
            shinglesFromTokens(col("toks"), 1),
            shinglesFromTokens(col("toks"), 2))).as("g"))
          .select(col("doc_id"), md5(col("g")).as("h"))
          .select(col("doc_id"),
            expr(s"${Curation.hexIntSql("h")} % 256").as("bucket"),
            expr("CASE WHEN substring(h, 13, 1) <= '7' THEN 1L ELSE -1L END")
              .as("sgn"))
          .groupBy("doc_id", "bucket")
          .agg(sum(col("sgn")).cast(LongType).as("feature"),
            count(lit(1)).cast(LongType).as("n_grams"))
          .orderBy("doc_id", "bucket")
      },
      Some(raw"""WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM documents),
              g AS (
                SELECT doc_id, unnest(w) AS g FROM t
                UNION ALL
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(w) - 1),
                         i -> w[i] || ' ' || w[i+1])) AS g
                FROM t WHERE len(w) >= 2),
              h AS (SELECT doc_id, md5(g) AS h FROM g)
              SELECT doc_id,
                     ${Curation.hexIntSql("h")} % 256 AS bucket,
                     CAST(SUM(CASE WHEN substring(h, 13, 1) <= '7'
                              THEN 1 ELSE -1 END) AS BIGINT) AS feature,
                     CAST(COUNT(*) AS BIGINT) AS n_grams
              FROM h GROUP BY 1, 2 ORDER BY doc_id, bucket"""))
  )
}
