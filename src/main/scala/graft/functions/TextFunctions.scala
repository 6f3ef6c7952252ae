package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column functions for the LLM-data-pipeline surface:
  * tokenization, token counting, quality scoring, language-ID, document
  * fingerprinting, and word-n-gram shingling.
  *
  * Everything is built from codegen'd built-ins (`split`, `regexp_*`,
  * `transform`, `md5`) — no UDFs — so whole-stage codegen spans the full
  * projection and the operators scale linearly with input bytes.
  *
  * Determinism: all ratios are a single int/int double division; all
  * hashes are md5 (identical in DuckDB for oracle checks).
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of word chars or single non-word-non-space
    * chars — the cheap proxy for subword token budgeting. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Word n-gram shingles from a PRE-SPLIT token array (space-joined).
    *
    * `toks` must be a materialized column (project `tokens(text)` into a
    * named column first): the lambda body references `toks` once per
    * n-gram position, and `transform` is a non-codegen expression with no
    * subexpression elimination — an inline `split` would re-tokenize the
    * whole document at every shingle offset, turning an O(words) scan
    * into O(words²) regex work per doc (measured 10× on the corpus).
    * `element_at` is 1-based. Short docs (< n words) yield an empty
    * array. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*)))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Convenience form splitting inline — ONLY for single-use contexts;
    * see [[shinglesFromTokens]] for why hot paths must pre-split. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Hashed bag-of-words feature bucket of a token: the first md5 byte,
    * 0..255 — the feature-hashing trick (Weinberger et al. 2009) with
    * D = 256 buckets. ONE md5 per token (`conv` of the first two hex
    * chars): this runs inside `transform` lambdas, where Spark applies
    * no subexpression elimination, so a two-`md5` formulation would
    * double the hashing on the hot path. The gated oracle states the
    * same byte independently via per-char `instr` arithmetic. */
  def tokenBucket(t: Column): Column =
    conv(substring(md5(t), 1, 2), 16, 10).cast(IntegerType)

  /** Exact integer weight sum of a hashed bag-of-words linear model:
    * Σ (bucket(token) − 128) ∈ BIGINT. The per-bucket weights here are
    * the centered hash value itself — a deterministic stand-in kept for
    * the gated oracle (integer arithmetic, engine-portable);
    * [[graft.operators.QualityModel]] is the TRAINED swap — NB log-odds
    * fit as a 256-entry literal lookup scored with this same fold —
    * a fasttext-style classifier scoring 100 TB map-side, no shuffle,
    * no UDF. Integer accumulation keeps the stand-in's sum order-free
    * and bit-identical across engines. */
  def hashedBowSum(text: Column): Column =
    aggregate(
      transform(tokens(text), t => (tokenBucket(t) - lit(128)).cast(LongType)),
      lit(0L), (acc, x) => acc + x)

  /** Stopword ratio over a fixed stopword set. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords.map(lit(_).cast(StringType)): _*)))
      .cast(DoubleType) / size(toks).cast(DoubleType)
  }

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast(LongType))
      .cast(DoubleType) / size(toks).cast(DoubleType)
  }

  /** Punctuation-character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0)))

  /** Heuristic quality score in [0, 1]: length saturation × (1 − stopword
    * excess) — a deterministic stand-in for a model-based scorer, with the
    * same column shape. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenSat = least(tokenCount(text).cast(DoubleType) / lit(100.0), lit(1.0))
    lenSat * (lit(1.0) - stopwordRatio(text, stopwords))
  }

  /** Marker-word language-ID over a PRE-SPLIT token array: counts hits of
    * per-language marker words and takes the argmax (first language in
    * `markers` wins ties — keep the order identical in any oracle).
    *
    * Takes tokens, not text, so callers tokenize ONCE: `ArrayFilter` is a
    * non-codegen expression (no subexpression elimination), so passing raw
    * text would re-run the regex split per language. */
  def langIdFromTokens(toks: Column, markers: Seq[(String, Seq[String])]): Column = {
    // ONE interpreted pass over the token array accumulating every
    // language's hit count in a struct (ArrayAggregate has no codegen, so
    // per-language `filter` passes would cost numLanguages × array walks
    // plus a filtered-array allocation each — measured 3× slower). The
    // argmax runs in the aggregate's FINISH lambda: the accumulator is a
    // bound lambda variable there, so reading it per language is free —
    // referencing the aggregate expression itself per language would
    // re-run the whole fold each time (no subexpression elimination in
    // interpreted expressions).
    val zero = struct(markers.map { case (l, _) => lit(0).as(s"h_$l") }: _*)
    aggregate(
      toks,
      zero,
      (acc, t) =>
        struct(markers.map { case (l, ws) =>
          (acc.getField(s"h_$l") +
            when(t.isin(ws.map(lit(_).cast(StringType)): _*), 1).otherwise(0))
            .as(s"h_$l")
        }: _*),
      acc => {
        // argmax via a strictly-greater fold over (lang, hits) in
        // declared order — first language wins ties.
        val scored = markers.map { case (lang, _) =>
          (lit(lang), acc.getField(s"h_$lang")) }
        val (l0, h0) = scored.head
        val init = struct(l0.as("lang"), h0.as("h"))
        scored.tail.foldLeft(init) { case (best, (lang, h)) =>
          when(h > best.getField("h"), struct(lang.as("lang"), h.as("h")))
            .otherwise(best)
        }.getField("lang")
      })
  }

  /** Convenience form tokenizing inline (fine for one-off use). */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    langIdFromTokens(tokens(text), markers)

  /** Document fingerprint: md5 of whitespace-normalized text — the exact
    * dedup key. (md5 matches DuckDB's md5 for oracle checks; at scale
    * swap for xxhash64 — same plumbing, cheaper hash.) */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Winnowing fingerprints (Schleimer et al., MOSS): the minimum shingle
    * hash of every sliding window of `k` consecutive shingle hashes — the
    * rolling-hash fingerprint family that detects PARTIAL overlap (two
    * docs sharing any ≥ (k+n−1)-token run share a fingerprint), where the
    * whole-doc [[fingerprint]] only catches full duplicates.
    *
    * `sh` must be a MATERIALIZED shingle-array column (see
    * [[shinglesFromTokens]] for the HOF re-evaluation trap). Hash = md5
    * string, min = lexicographic: any total order over hashes is a valid
    * winnowing selector, and md5 strings order identically in DuckDB —
    * oracle-checkable. Docs with fewer than `k` shingles yield an empty
    * array (no window fits). */
  def winnowFingerprints(sh: Column, k: Int): Column =
    // the md5-hash array is bound ONCE as a lambda variable (wrapped in a
    // 1-element array) — referencing the transform expression directly
    // inside the window lambda would re-hash every shingle per window
    element_at(
      transform(array(transform(sh, s => md5(s))), hs =>
        when(size(hs) >= k,
          array_distinct(transform(
            sequence(lit(1), size(hs) - lit(k - 1)),
            i => array_min(slice(hs, i, lit(k))))))
          .otherwise(array().cast(ArrayType(StringType)))),
      1)

  /** Most frequent element of a STRING array and its count, as
    * struct(tok, n) — computed as the longest run of the SORTED array,
    * one interpreted fold, zero shuffle. Ties break to the
    * lexicographically smallest element (the first run encountered in
    * sorted order wins on strictly-greater). The per-doc relational
    * alternative (explode → groupBy → window) costs two shuffles of
    * every token in the corpus; this is a map-side scan. Pass a
    * MATERIALIZED array column ([[shinglesFromTokens]] HOF trap).
    * Empty arrays yield (null, 0). */
  def topGram(arr: Column): Column = {
    val folded = aggregate(
      sort_array(arr),
      struct(
        lit(null).cast(StringType).as("prev"), lit(0L).as("run"),
        lit(null).cast(StringType).as("best"), lit(0L).as("bestn")),
      (st, x) => {
        val run =
          when(st.getField("prev") === x, st.getField("run") + lit(1L))
            .otherwise(lit(1L))
        val better = run > st.getField("bestn")
        struct(
          x.as("prev"), run.as("run"),
          when(better, x).otherwise(st.getField("best")).as("best"),
          when(better, run).otherwise(st.getField("bestn")).as("bestn"))
      },
      st => struct(st.getField("best").as("tok"),
        st.getField("bestn").as("n")))
    folded
  }

  /** Regex PII scrubber: emails then phone-shaped digit groups replaced
    * with typed placeholder tags — the corpus-text twin of the
    * reference's column-level masking view (SURVEY §2.3 P6;
    * init-db.sql:74-89 nulls PII columns per user, this redacts PII
    * SPANS inside free text). Both patterns stay inside the regex
    * surface Java and RE2 agree on (character classes, +, {m,}). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\d{3}-\\d+", "<PHONE>")
}
