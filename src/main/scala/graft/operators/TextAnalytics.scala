package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis column builders for large-scale training-data pipelines:
  * tokenization, word n-gram shingles, portable 60-bit token hashes,
  * SimHash fingerprints, language-ID scoring and quality metrics.
  *
  * Per-element hot loops (SimHash votes, token length/stopword tallies) are
  * codegen'd Catalyst expressions — Spark HOF lambdas are CodegenFallback
  * (always interpreted), so composing `aggregate`/`transform` there costs
  * ~100x. Everything stays a narrow map over 100 TB of documents with no
  * shuffle beyond the final aggregation.
  *
  * Hash portability: token/shingle hashes are the first 15 hex chars of
  * sha256 (60 bits, < 2^63), so any SQL engine (the DuckDB oracle included)
  * reproduces them exactly.
  */
object TextAnalytics {

  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val DeStopwords: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht")
  val EsStopwords: Seq[String] = Seq("el", "la", "de", "que", "los")
  val FrStopwords: Seq[String] = Seq("le", "la", "les", "des", "est")

  /** Whitespace tokens, CPython `str.split()` semantics (`ws-split-v2`):
    * split on runs of whitespace, NO empty tokens — leading/trailing
    * whitespace yields leading/trailing empties from the regex split and
    * the filter drops them, so no trim is needed. v1 (`split(trim, " ")`)
    * emitted `""` terms on consecutive spaces, a real (if tiny) reference
    * divergence since the reference tokenizes with no-arg `str.split()`.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Distinct word 3-gram shingles (empty for texts under 3 words). */
  def shingles(words: Column): Column =
    when(size(words) >= 3,
      array_distinct(transform(sequence(lit(1), size(words) - 2), i =>
        concat_ws(" ", element_at(words, i), element_at(words, i + 1), element_at(words, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** Portable 60-bit hash: first 15 hex chars of sha256, as BIGINT. */
  def hash60(s: Column): Column =
    conv(substring(sha2(s, 256), 1, 15), 16, 10).cast(LongType)

  /** 60-bit SimHash over an array of 60-bit token hashes: per bit position,
    * tokens vote +1/-1 by their bit; the fingerprint sets bits with a
    * non-negative vote. Near-duplicate docs land within small Hamming
    * distance. One codegen'd JVM loop per doc ([[graft.functions.SimHash60]]
    * — HOF lambdas are interpreted and cost ~100x here), no explode.
    */
  def simhash(tokenHashes: Column): Column =
    graft.functions.SimHash60.simhash60(tokenHashes)

  // ------------------------------------------------------------- redaction

  /** PII-ish patterns, deliberately RE2-safe (no lookaround/backrefs) so
    * Java regex and any RE2 engine (the DuckDB oracle, Go/Rust scrubbers)
    * agree match-for-match. Conservative by design: a training-corpus
    * scrubber prefers typed placeholder tokens over deletions so
    * tokenization stays stable.
    */
  val UrlRe = "https?://\\S+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d[\\d ]{7,}\\d"

  /** Text with URLs/emails/IPv4s/phone numbers replaced by typed tokens —
    * composed builtin `regexp_replace` (codegen'd), applied in fixed
    * order (URL first: it swallows everything to whitespace).
    */
  def redact(text: Column): Column = {
    val r1 = regexp_replace(text, UrlRe, "<URL>")
    val r2 = regexp_replace(r1, EmailRe, "<EMAIL>")
    val r3 = regexp_replace(r2, Ipv4Re, "<IP>")
    regexp_replace(r3, PhoneRe, "<PHONE>")
  }

  /** Per-category match counts over the ORIGINAL text (independent counts
    * — the audit signal a scrubbing pipeline reports).
    */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_url" -> regexp_count(text, lit(UrlRe)),
    "n_email" -> regexp_count(text, lit(EmailRe)),
    "n_ip" -> regexp_count(text, lit(Ipv4Re)),
    "n_phone" -> regexp_count(text, lit(PhoneRe)))

  /** GPT-2-style pre-tokenizer, engine-portable form: contraction tails,
    * space-prefixed letter runs, digit runs, punctuation runs, whitespace
    * runs. Deliberately RE2-safe (the upstream GPT-2 regex's `\s+(?!\S)`
    * lookahead is dropped) so Java regex and the DuckDB oracle count
    * identical token boundaries — the cheap corpus-budget estimator a
    * training pipeline runs BEFORE paying for real BPE.
    */
  val BpeTokenRe = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+"

  /** Estimated BPE-ish token count: matches of [[BpeTokenRe]]. Whitespace
    * that isn't a single-space token prefix is simply skipped between
    * matches — single word gaps ride along via the ` ?` prefixes, exactly
    * as real BPE merges a leading space into the following token.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenRe))

  /** Count of distinct tokens appearing in a stopword list. */
  def stopwordScore(distinctTokens: Column, stopwords: Seq[String]): Column =
    size(array_intersect(distinctTokens, array(stopwords.map(lit): _*)))

  /** Sum of token character lengths (codegen'd single pass). */
  def totalTokenChars(tokens: Column): Column =
    graft.functions.SumCharLengths.sumCharLengths(tokens)

  /** Count of tokens (with repeats) in a fixed word list (codegen'd). */
  def wordListHits(tokens: Column, words: Seq[String]): Column =
    graft.functions.WordListHits.wordListHits(tokens, words)

  /** Mode of a string array as `struct(cnt, value)`, computed per-row by
    * folding adjacent runs of the SORTED array — no explode, no per-doc
    * shuffle: the repetition metrics stay a narrow map at any corpus
    * size. Strict `>` keeps the first max run in sorted order, so count
    * ties resolve to the lexicographically smallest value — the order the
    * oracle's `ORDER BY cnt DESC, value` replays. Empty array → (0, '').
    */
  def topRun(arr: Column): Column = {
    val sorted = array_sort(arr)
    val init = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"), lit("").as("bestv"))
    aggregate(sorted, init,
      (s, x) => {
        val run = when(x === s.getField("prev"), s.getField("run") + 1L)
          .otherwise(lit(1L))
        val isBest = run > s.getField("best")
        struct(x.as("prev"), run.as("run"),
          when(isBest, run).otherwise(s.getField("best")).as("best"),
          when(isBest, x).otherwise(s.getField("bestv")).as("bestv"))
      },
      s => struct(s.getField("best").as("cnt"), s.getField("bestv").as("value")))
  }

  /** Heuristic language id from stopword hits, fixed tie-break order
    * en > de > es > fr, 'und' (undetermined) when all scores are zero.
    */
  def langId(sEn: Column, sDe: Column, sEs: Column, sFr: Column): Column =
    when(sEn === 0 && sDe === 0 && sEs === 0 && sFr === 0, "und")
      .when(sEn >= sDe && sEn >= sEs && sEn >= sFr, "en")
      .when(sDe >= sEs && sDe >= sFr, "de")
      .when(sEs >= sFr, "es")
      .otherwise("fr")
}
