package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenization,
  * quality scoring, language-ID, fingerprinting (builder-prompt extension
  * surface; no reference analog — the reference's text ops stop at
  * split/trim, SURVEY.md §2.8 F2/F3).
  *
  * Everything here is a pure `Column` expression (codegen'd, no UDFs), so
  * it stays inside whole-stage codegen and scales linearly with a scan.
  */
object TextAnalysis {

  /** Whitespace tokens (single-space split — documents are space-joined). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words plus one extra token per 4 chars
    * of long words (public rule-of-thumb ~4 chars/token for English).
    */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + greatest(lit(1L), ceil(length(w) / 4).cast("long")))

  /** Non-overlapping occurrences of `needle` — the replace trick, chosen
    * because it evaluates identically in any SQL engine (oracle parity).
    */
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(needle), "")))
      / needle.length).cast("long")

  /** Word n-grams as an array column (shingles for MinHash / Jaccard).
    * Texts shorter than n words yield an empty array (Spark's `sequence`
    * would otherwise count DOWN when stop < start).
    */
  def wordNGrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val cnt = size(toks) - (n - 1)
    // chained zip_with over n shifted views: O(len) per doc — the naive
    // transform(sequence)(i => slice(toks, i, n)) is O(len²)
    val head = slice(toks, lit(1), greatest(cnt, lit(0)))
    val joined = (1 until n).foldLeft(head) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(cnt, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(cnt < 1, array().cast("array<string>")).otherwise(joined)
  }

  /** Character n-grams (shingles) of the raw string. */
  def charNGrams(text: Column, n: Int): Column = {
    val cnt = length(text) - (n - 1)
    when(cnt < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), cnt), i => text.substr(i, lit(n))))
  }

  /** Quality metrics struct: token count, average token length, uppercase /
    * digit / punctuation ratios, distinct-token ratio. All ratios are exact
    * integer counts divided at the end (deterministic doubles).
    */
  def qualityMetrics(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val nChar = length(text).cast("long")
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("long")
    val digit = length(regexp_replace(text, "[^0-9]", "")).cast("long")
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("long")
    val space = length(regexp_replace(text, "[^ ]", "")).cast("long")
    val distinctToks = size(array_distinct(toks)).cast("long")
    struct(
      nTok.as("n_tokens"),
      nChar.as("n_chars"),
      (nChar.cast("double") / greatest(nTok, lit(1L))).as("avg_token_len"),
      (alpha.cast("double") / greatest(nChar, lit(1L))).as("alpha_ratio"),
      (digit.cast("double") / greatest(nChar, lit(1L))).as("digit_ratio"),
      (punct.cast("double") / greatest(nChar, lit(1L))).as("punct_ratio"),
      (space.cast("double") / greatest(nChar, lit(1L))).as("space_ratio"),
      (distinctToks.cast("double") / greatest(nTok, lit(1L))).as("uniq_token_ratio"))
  }

  /** Heuristic quality score in [0,1]: favors mid-length docs with diverse
    * alphabetic tokens — a deterministic toy stand-in for a model scorer.
    */
  def qualityScore(text: Column): Column = {
    val m = qualityMetrics(text)
    val lengthScore = least(m("n_tokens").cast("double") / 50, lit(1.0))
    val diversity = m("uniq_token_ratio")
    val alpha = m("alpha_ratio")
    round((lengthScore + diversity + alpha) / 3, 6)
  }

  /** Marker vocabularies for the n-gram language-ID heuristic. Public
    * common-word lists (top function words per language).
    */
  val defaultLangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "es" -> Seq(" el ", " de ", " la ", " es "),
    "fr" -> Seq(" le ", " de ", " la ", " est "))

  /** Language-ID: per-language marker occurrence totals; argmax with
    * alphabetical tiebreak; 'und' when no marker hits. Padding with spaces
    * makes word-boundary matching engine-agnostic.
    */
  def langId(text: Column,
      markers: Seq[(String, Seq[String])] = defaultLangMarkers): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scored = markers.map { case (lang, ms) =>
      (lang, ms.map(m => occurrences(padded, m)).reduce(_ + _))
    }
    // argmax via greatest over (score, lang) structs — lexicographic struct
    // ordering gives score-desc then lang tiebreak (invert lang for asc).
    val best = scored.map { case (lang, s) => struct(s.as("s"), lit(lang).as("l")) }
      .reduce((a, b) => when(b("s") > a("s"), b).otherwise(a))
    when(best("s") > 0, best("l")).otherwise("und")
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key (rolling-hash analog, engine-portable).
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Prefix fingerprint: md5 of the first `nWords` words — catches docs
    * that share a long prefix (truncation-style near-dups).
    */
  def prefixFingerprint(text: Column, nWords: Int): Column =
    md5(concat_ws(" ", slice(tokens(text), 1, nWords)))

  // ------------------------------------------------------------------
  // PII detection / redaction — the compliance gate every training-data
  // pipeline runs before anything ships. Patterns deliberately stay in
  // the regex subset Java regex and RE2 (DuckDB) interpret identically
  // (character classes, bounded repetition, \b, non-capturing groups —
  // no lookaround, no backreferences), so counts and redactions are
  // engine-portable and oracle-checkable. Pure codegen'd expressions
  // (regexp_count / regexp_replace), scan-linear, no UDF.
  // ------------------------------------------------------------------

  /** (label, pattern, replacement) — ordered: redaction applies email
    * first so a phone-like digit run inside an address is already gone.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Per-kind PII match counts for a text column, keyed by label. */
  def piiCounts(text: Column): Map[String, Column] =
    piiPatterns.map { case (label, re, _) =>
      label -> regexp_count(text, lit(re))
    }.toMap

  /** Redact all PII kinds (in [[piiPatterns]] order). Spark's
    * regexp_replace is global; an oracle mirror needs its engine's
    * global flag (DuckDB: 'g').
    */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, re, repl)) =>
      regexp_replace(c, lit(re), lit(repl))
    }
}
