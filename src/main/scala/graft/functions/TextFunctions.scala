package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data pipelines, composed from
  * codegen'd Spark built-ins (no UDFs — every function here stays inside
  * whole-stage codegen; SURVEY.md §7 "Functions, not UDFs").
  *
  * Each function has a mechanical DuckDB translation used by the oracle SQL
  * in SparkEntry (string_split_regex / list_filter / list_distinct).
  */
object TextFunctions {

  /** Whitespace-collapsed, lowercased, trimmed canonical text. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Type-token ratio — vocabulary richness, 4dp. */
  def typeTokenRatio(text: Column): Column =
    round(distinctTokenCount(text).cast("double") /
      greatest(tokenCount(text), lit(1L)), 4)

  def avgTokenLen(text: Column): Column =
    round(length(regexp_replace(normalize(text), " ", "")).cast("double") /
      greatest(tokenCount(text), lit(1L)), 4)

  /** English function words; the same list is inlined in the oracle SQL. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is")

  def stopwordRatio(text: Column): Column = {
    val stops = Stopwords.map(lit(_))
    val nStop = size(filter(tokens(text), t => t.isInCollection(Stopwords)))
    round(nStop.cast("double") / greatest(tokenCount(text), lit(1L)), 4)
  }

  /** Composite quality score in [0,1]: length saturation + vocabulary
    * richness + non-boilerplate share. A heuristic in the spirit of
    * C4/Gopher quality filters, deterministic and oracle-checkable.
    *
    * The 1e-9 nudge before rounding breaks 4dp half-way ties: the weighted
    * components are exact 1e-4 multiples, so the composite lands on a .00005
    * midpoint often, where Spark's exact-decimal HALF_UP and DuckDB's
    * float-multiply rounding disagree. The nudge (mirrored in the oracle
    * SQL) sends both engines to the same side.
    */
  def qualityScore(text: Column): Column =
    round(
      least(tokenCount(text).cast("double") / 500.0, lit(1.0)) * 0.4 +
        typeTokenRatio(text) * 0.3 +
        (lit(1.0) - stopwordRatio(text)) * 0.3 + 1e-9, 4)

  /** Per-language marker-word lists for the n-gram/keyword language-ID
    * heuristic. Tiny on purpose — the mechanism (score per language, argmax
    * with fixed tie order) is the operator; lists are swappable.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "los", "y", "que", "un"),
    "fr" -> Seq("le", "la", "et", "les", "une"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers))).cast("long")

  /** Predicted language: argmax marker hits, ties broken by list order,
    * zero hits → "und".
    */
  def langId(text: Column): Column = {
    val scored = LangMarkers.map { case (lang, m) => (lang, langScore(text, m)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Stable 128-bit content fingerprint of the canonical text (exact-dedup
    * key). md5 exists verbatim in DuckDB → oracle-checkable.
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Cross-engine 52-bit hash: the first 13 hex chars of md5, parsed as an
    * integer. DuckDB computes the identical value with
    * `('0x' || substr(md5(x), 1, 13))::BIGINT`, so any hash-ordered or
    * hash-bucketed operator built on this (simhash bit votes, bottom-k
    * sampling order) is fully oracle-checkable. 13 hex digits = 52 bits:
    * always positive, exact in a DOUBLE, far below BIGINT overflow.
    */
  def hash52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** The SECOND independent 52-bit hash from the same md5 — hex chars
    * 14–26, disjoint from [[hash52]]'s 1–13. The wide-signature operators
    * (d9/m6 band widening beyond the 13-bit key unit) draw their extra
    * majority-vote bits from here, so one md5 per token funds up to 104
    * signature bits. Same DuckDB convention as hash52
    * (`('0x' || substr(md5(x), 14, 13))::BIGINT`) if a twin ever needs it.
    */
  def hash52b(c: Column): Column =
    conv(substring(md5(c), 14, 13), 16, 10).cast("long")

  /** The DuckDB twin of [[hash52]] over SQL expression `e`. */
  def hash52Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 13))::BIGINT"

  /** Word n-gram shingles (distinct) over a *materialized* token-array
    * attribute. The column passed here MUST be a plain attribute (staged in
    * its own projection), not a `tokens(text)` expression tree: Catalyst
    * does no common-subexpression elimination across lambda boundaries, so
    * an inlined split would be re-evaluated for every element access
    * (~250 regex splits per document — measured 10s+ for 5k docs).
    * Guarded for docs shorter than n tokens — Spark `sequence(1, 0)` would
    * generate a DESCENDING [1, 0] rather than an empty array.
    */
  def shinglesOfTokens(t: Column, n: Int = 3): Column = {
    val cnt = size(t) - (n - 1)
    val grams = when(cnt <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), cnt), i =>
        concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*)))
    array_distinct(grams)
  }
}
