package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM-data pipelines (north star §2.6):
  * tokenization, quality scoring, language ID, token counting, document
  * fingerprinting. All are pure Column expressions — whole-stage-codegen
  * friendly, no UDFs — so at 100 TB they run as a narrow map stage fused
  * into the parquet scan.
  */
object TextAnalysis {

  /** Word tokens: lowercase, split on non-alphanumerics, drop empties. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Whitespace-ish token count (long, matching ANSI count types). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation — the shape of a byte-pair pre-tokenizer's word split.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeTokenCount(text: Column): Column =
    size(bpeTokens(text)).cast(LongType)

  /** Fraction of characters that are neither alphanumeric nor space:
    * stripping [a-z0-9 ] leaves exactly the punctuation, so its length
    * over the total IS the ratio (not its complement).
    */
  def punctRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9 ]", ""))
      .cast(DoubleType) / length(text)

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val tk = tokens(text)
    size(filter(tk, t => t.isInCollection(stopwords))).cast(DoubleType) /
      size(tk)
  }

  /** Per-language stopword marker sets for the n-gram/stopword language
    * heuristic. Deliberately tiny: language ID here is a scoring shape,
    * not a model.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "una", "por"))

  /** Number of tokens hitting a marker set. */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers)))

  /** Marker-hit counts from a PRE-PROJECTED token array — stage
    * [[tokens]] as a real column first so the split/filter pass runs
    * once, not once per language (Catalyst does not CSE across lambda
    * bodies, so the single-Column [[detectLang]] re-tokenizes for every
    * score it compares).
    */
  def langScoresFromTokens(tk: Column): Seq[(String, Column)] =
    langMarkers.map { case (l, m) =>
      l -> size(filter(tk, t => t.isInCollection(m)))
    }

  /** Deterministic argmax over already-MATERIALIZED score columns (first
    * language in [[langMarkers]] order wins ties) — 'und' when nothing
    * hits. Callers must stage the scores as real columns; passing raw
    * score expressions here duplicates them across the CASE chain.
    */
  def pickLang(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, s), alt) =>
      when(s === best && s > 0, lit(l)).otherwise(alt)
    }
  }

  /** Single-Column convenience form of language ID. Prefer the staged
    * [[langScoresFromTokens]]+[[pickLang]] path on wide scans — this
    * form re-derives the token array inside every score comparison.
    */
  def detectLang(text: Column): Column =
    pickLang(langMarkers.map { case (l, m) => l -> langScore(text, m) })

  /** Canonical-form document fingerprint: md5 of the text stripped to
    * lowercase alphanumerics. Equal fingerprints = exact near-identity
    * (whitespace/punctuation-insensitive duplicate).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", "").cast(BinaryType))

  /** Distinct character n-gram shingles (for Jaccard similarity).
    * Guarded: Spark's `sequence(1, 0)` counts DOWN, so short texts must
    * short-circuit to an empty array.
    */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(
        transform(
          sequence(lit(1), length(text) - (n - 1)),
          i => lower(text).substr(i, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Distinct word-bigram shingles from a PRE-PROJECTED token array —
    * project [[tokens]] into a column first so the split/filter pass
    * isn't duplicated across the guard and both element_at lookups.
    */
  def wordShinglesFromTokens(tk: Column): Column =
    when(size(tk) > 1,
      array_distinct(transform(
        sequence(lit(1), size(tk) - 1),
        i => concat(element_at(tk, i), lit(" "), element_at(tk, i + 1)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Single-expression convenience form (tokenization inlined). */
  def wordShingles(text: Column): Column =
    wordShinglesFromTokens(tokens(text))

  /** Composite quality score features (length / punctuation / stopword
    * ratios) — the standard cheap pre-filter for LLM training corpora.
    * Token-array-derived features read from the pre-projected `tk`
    * column (see [[langScoresFromTokens]] for why staging matters).
    */
  def qualityFeaturesFromTokens(text: Column, tk: Column): Seq[(String, Column)] = Seq(
    "n_tokens" -> size(tk).cast(LongType),
    "n_bpe_tokens" -> bpeTokenCount(text),
    "avg_token_len" ->
      (length(regexp_replace(lower(text), "[^a-z0-9]", "")).cast(DoubleType)
        / size(tk).cast(LongType)),
    "punct_ratio" -> punctRatio(text),
    "stopword_ratio" ->
      (size(filter(tk, t => t.isInCollection(langMarkers.flatMap(_._2))))
        .cast(DoubleType) / size(tk)))

  /** Single-Column convenience form (tokenization inlined per feature). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = Seq(
    "n_tokens" -> tokenCount(text),
    "n_bpe_tokens" -> bpeTokenCount(text),
    "avg_token_len" ->
      (length(regexp_replace(lower(text), "[^a-z0-9]", "")).cast(DoubleType)
        / tokenCount(text)),
    "punct_ratio" -> punctRatio(text),
    "stopword_ratio" -> stopwordRatio(text, langMarkers.flatMap(_._2)))
}
