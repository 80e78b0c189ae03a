package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for LLM-data pipelines: tokenization, quality stats,
  * language ID, fingerprinting. Everything is built from codegen'd
  * Catalyst expressions (`split`, `regexp_extract_all`, higher-order
  * `aggregate`/`transform`) — no UDFs, so whole-stage codegen spans the
  * full projection and the scan only reads the text column
  * (column-pruned at the parquet reader).
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenization: letter runs, digit runs, and single
    * non-alphanumeric marks — the usual byte-pair pre-split shape. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Occurrences of `needle` in `text` by length difference — exact,
    * cheap, and expressible in any SQL dialect (oracle-friendly). */
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(needle), ""))) / needle.length).cast("int")

  /** Quality stats: character/token counts, vowel count, stopword hits,
    * and a short-document flag — the length/punct/stopword ratio family
    * of quality filters. */
  def charCount(text: Column): Column = length(text)

  def vowelCount(text: Column): Column =
    length(text) - length(regexp_replace(lower(text), "[aeiou]", ""))

  def nonAlnumCount(text: Column): Column =
    length(text) - length(regexp_replace(lower(text), "[^a-z0-9\\s]", ""))

  /** Marker-token language-ID heuristic: score each candidate language by
    * occurrences of its most frequent function words, take the argmax
    * (ties broken by the fixed language order). A real n-gram profile
    * model plugs in the same way — per-language score columns + argmax —
    * without changing the plan shape. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
  )

  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => occurrences(text, m)).reduce(_ + _)

  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(padded, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Deterministic 61-bit polynomial rolling hash over the document's
    * characters (document fingerprinting). Modular reduction at every
    * step keeps the accumulator < 2^56 so `acc*31 + code` never overflows
    * a long (Spark 4 runs ANSI mode — overflow would throw, not wrap). */
  val FingerprintMod = 36028797018963913L // largest prime < 2^55

  /** Native expression (primitive per-codepoint loop) — bit-identical to
    * the declarative `aggregate(split(text, ''), 0, (a, c) ->
    * pmod(a*31 + ascii(c), mod))` fold it replaces (property-tested in
    * NativeTextSpec), ~10-100× faster on gram-hashing passes. */
  def fingerprint(text: Column): Column =
    graft.functions.NativeText.poly_fingerprint(text, lit(0L), FingerprintMod)

  /** Word k-shingles: join each k-run of tokens back into a string.
    * Documents shorter than k tokens yield their single full-token
    * shingle. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val starts = sequence(lit(0), greatest(size(toks) - k, lit(0)))
    array_distinct(transform(starts, i => array_join(slice(toks, i + 1, lit(k)), " ")))
  }

  /** Shingle set hashed to 64-bit longs — what the dedup pipeline
    * actually shuffles and intersects: 8-byte compares instead of string
    * compares, and an order of magnitude less shuffle payload. Collisions
    * at 64 bits are negligible for Jaccard estimation.
    *
    * Backed by a native Catalyst expression (one primitive loop per
    * document) — the higher-order-function formulation evaluates
    * interpreted with per-element boxing and is ~100× slower on a large
    * corpus. */
  def hashedShingles(text: Column, k: Int): Column =
    graft.functions.NativeText.hashed_shingles(text, k)

  /** PII redaction — the scrub pass a training corpus gets before any
    * model sees it. Patterns are deliberately conservative and
    * ENGINE-PORTABLE (plain character classes, no lookaround, no
    * backreferences) so Java regex (Spark) and RE2 (DuckDB, Go tooling)
    * match identically — auditable downstream of either engine. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  def countPattern(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Emails first, then phones over the email-redacted text (an email's
    * digit runs must not double-count as phones). Codegen'd, map-only. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
}
