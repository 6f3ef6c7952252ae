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

  /** Word n-gram shingles (space-joined), as an array column.
    * `sequence` + `transform` stay inside codegen; `element_at` is
    * 1-based. Short docs (< n words) yield an empty array. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*)))
      .otherwise(array().cast(ArrayType(StringType)))
  }

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
    def hits(ws: Seq[String]): Column =
      size(filter(toks, t => t.isin(ws.map(lit(_).cast(StringType)): _*)))
    // argmax via a strictly-greater fold over (lang, hits) in declared order
    val scored = markers.map { case (lang, ws) => (lit(lang), hits(ws)) }
    val (l0, h0) = scored.head
    val init = struct(l0.as("lang"), h0.as("h"))
    scored.tail.foldLeft(init) { case (best, (lang, h)) =>
      when(h > best.getField("h"), struct(lang.as("lang"), h.as("h")))
        .otherwise(best)
    }.getField("lang")
  }

  /** Convenience form tokenizing inline (fine for one-off use). */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    langIdFromTokens(tokens(text), markers)

  /** Document fingerprint: md5 of whitespace-normalized text — the exact
    * dedup key. (md5 matches DuckDB's md5 for oracle checks; at scale
    * swap for xxhash64 — same plumbing, cheaper hash.) */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))
}
