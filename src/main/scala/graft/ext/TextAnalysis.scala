package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization and token counting, stopword-profile language ID,
  * heuristic quality scoring, and deterministic document fingerprints.
  *
  * All are pure Catalyst expressions (no UDFs) so they run inside
  * whole-stage codegen and scale embarrassingly — per-row work only, no
  * shuffle. The fingerprint fold is a higher-order `aggregate` over the
  * token array, i.e. a per-row sequential fold, not a distributed
  * reduction — deterministic by construction.
  */
object TextAnalysis {

  /** Whitespace tokenizer. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * other non-space chars.
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Exact count of tokens that belong to `words` (token-equality, so no
    * substring/overlap ambiguity).
    */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    stopwordCountFromTokens(tokens(c), words)

  /** Stopword count over an ALREADY-MATERIALIZED token-array column.
    * Callers scoring several profiles must project `tokens` once and
    * pass the bound attribute — same lesson as
    * [[graft.ext.Dedup.shinglesFromTokens]]: handing each profile the
    * `split(...)` tree re-tokenizes the document once per profile.
    */
  def stopwordCountFromTokens(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t))).cast("long")
  }

  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ein"))

  /** Per-profile score columns from a materialized token array; project
    * these as named columns, then pick with [[langIdFromScores]].
    */
  def profileScores(toks: Column): Seq[(String, Column)] =
    StopwordProfiles.map { case (lang, ws) => lang -> stopwordCountFromTokens(toks, ws) }

  /** Language pick from per-profile score columns. The fold references
    * each score several times, so the inputs must be bound attributes
    * (projected columns), not expression trees — otherwise every
    * reference recomputes the count.
    */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    // expression fold: replace the running best only on strictly greater
    // score, so ties keep the earlier profile → deterministic
    val (blang, bscore) = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (l, s)) =>
        (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(bscore > 0, blang).otherwise(lit("und"))
  }

  /** N-gram-profile language ID heuristic: the language whose stopword
    * profile hits the most tokens; ties and zero-hit rows resolve in
    * profile order / to "und" (undetermined). One-shot convenience — for
    * the hot path, project `tokens` + [[profileScores]] as columns first
    * and use [[langIdFromScores]] (this inline form re-tokenizes per
    * profile and re-scores per fold reference).
    */
  def langId(c: Column): Column = langIdFromScores(profileScores(tokens(c)))

  /** Heuristic quality score in [0,1]: long-enough docs with moderate
    * mean token length and some stopword mass score high. Weights are
    * arbitrary but fixed; the point is the shape (ratios + clamp), the
    * reference pattern for filtering pretraining text.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c)
    val meanLen = (length(c) - nTok + 1).cast("double") / nTok // chars per token
    val stop = stopwordCount(c, StopwordProfiles.flatMap(_._2))
    val stopRatio = stop.cast("double") / nTok
    val lenScore = least(nTok.cast("double") / 50.0, lit(1.0))
    val lenPenalty = when(meanLen < 3.0 || meanLen > 10.0, 0.5).otherwise(1.0)
    round(least(greatest(lenScore * lenPenalty * (lit(0.7) + stopRatio), lit(0.0)), lit(1.0)), 4)
  }

  /** Tokens containing at least one ASCII letter — the Gopher-style
    * "fraction of alphabetic words" signal (low ⇒ tables/code/noise).
    * Operates on a MATERIALIZED token array (same staging rule as
    * [[stopwordCountFromTokens]]).
    */
  def alphaTokenCount(toks: Column): Column =
    size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")

  /** Occurrences of hash marks and ellipses ('#', '...', '…') — the
    * Gopher symbol-ratio numerator (boilerplate/link-farm marker).
    */
  def symbolCount(c: Column): Column =
    size(regexp_extract_all(c, lit("#|\\.\\.\\.|…"), lit(0))).cast("long")

  /** Deterministic 63-bit rolling document fingerprint:
    * fold over tokens of (acc*31 + code(token)) mod p, where
    * code(t) = ascii(first char)*1000 + length(t). Oracle-expressible
    * (DuckDB list_reduce) and stable across engines — unlike
    * xxhash64-based fingerprints, which are Spark-internal.
    */
  def rollingFingerprint(c: Column): Column = {
    val p = 1000000007L
    val codes = transform(tokens(c), t => (ascii(substring(t, 1, 1)) * 1000L + length(t)).cast("long"))
    aggregate(codes, lit(0L), (acc, x) => pmod(acc * 31L + x, lit(p)))
  }

  /** xxhash64 whole-text fingerprint (engine-internal but fast; for
    * exact-dup detection at scale prefer this over the text itself as the
    * shuffle key).
    */
  def hashFingerprint(c: Column): Column = xxhash64(c)

  /** Dedup-normalization of text: strip every non-alphanumeric to a
    * space, collapse whitespace runs, trim, lowercase — the canonical
    * form exact dedup hashes so that punctuation/casing/spacing
    * variants collapse to one key. Non-ASCII characters are REPLACED by
    * the character-class step before `lower` runs, so the lowercase is
    * ASCII-only — the one form whose semantics every engine agrees on
    * (Unicode case folding differs across engines; ASCII does not).
    */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(c, "[^A-Za-z0-9\\s]", " "), "\\s+", " ")))

  /** All word n-grams (WITH duplicates, in order) from a token-array
    * column — the single owner of the gram-window arithmetic;
    * [[graft.ext.Dedup.shinglesFromTokens]] derives the sorted-distinct
    * shingle set from it.
    *
    * Built as a `zip_with` fold over SHIFTED SLICES of the token array,
    * never by indexing back into the array from inside a lambda: the
    * previous `transform(toks, (t, i) -> ... get(toks, i + j) ...)`
    * form re-evaluates the `toks` EXPRESSION per element (higher-order
    * functions run interpreted, so a derived child inside the lambda
    * body is O(len) per element → O(len²) per row — measured 8.2 s vs
    * 1.5 s for the plain tokenize over the sf0.1 corpus, taxing every
    * gram-based operator in the suite). Here lambdas touch only their
    * bound variables; `toks` is evaluated n times per ROW as slice
    * arguments. zip_with pads the shorter (shifted) side with nulls —
    * `concat_ws` skips them, producing short tail grams that the final
    * slice drops.
    */
  def gramsFromTokens(toks: Column, n: Int): Column =
    if (n == 1) toks
    else {
      val zipped = (1 until n).foldLeft(toks) { (acc, j) =>
        zip_with(acc,
          slice(toks, lit(j + 1), greatest(size(toks) - j, lit(0))),
          (a, b) => concat_ws(" ", a, b))
      }
      slice(zipped, lit(1), greatest(size(toks) - (n - 1), lit(0)))
    }

  /** Intra-document n-gram repetition ratio — the Gopher/RefinedWeb-
    * style quality signal (heavily repeated phrasing marks boilerplate
    * and spam): fraction of n-gram OCCURRENCES that are repeats of an
    * earlier n-gram, i.e. (total - distinct) / total; 0 for documents
    * shorter than n tokens. Input is a MATERIALIZED gram-array column
    * (project [[gramsFromTokens]] first — this fold references the
    * array four times, and lambda-bearing trees are excluded from
    * codegen subexpression elimination). Pure per-row expressions — no
    * shuffle, linear at any scale.
    */
  def repetitionRatioFromGrams(grams: Column): Column = {
    val total = size(grams)
    when(total <= 0, 0.0)
      .otherwise((total - size(array_distinct(grams))).cast("double") / total)
  }

  /** One-shot convenience; the hot path projects [[gramsFromTokens]] as
    * a column and uses [[repetitionRatioFromGrams]].
    */
  def repetitionRatio(toks: Column, n: Int): Column =
    repetitionRatioFromGrams(gramsFromTokens(toks, n))

  /** PII scrubbing — the redaction pass of a training-data pipeline.
    * Regexes are deliberately RE2-compatible (plain char classes, no
    * backrefs/lookarounds), so an external engine computes identical
    * matches; URLs scrub BEFORE emails so a UserInfo-style address
    * inside a URL is counted once, as a URL.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe)).cast("long")
  def urlCount(c: Column): Column = regexp_count(c, lit(UrlRe)).cast("long")
  def scrubPii(c: Column): Column =
    regexp_replace(regexp_replace(c, UrlRe, "<URL>"), EmailRe, "<EMAIL>")

  /** Vowel-group syllable estimate for one token: the count of maximal
    * `[aeiou]+` runs in the lowercased word — the standard cheap
    * syllable proxy readability formulas run on (silent-e etc. are
    * noise this screen doesn't chase).
    */
  def syllableEstimate(tok: Column): Column =
    size(regexp_extract_all(lower(tok), lit("[aeiou]+"), lit(0))).cast("long")
}
