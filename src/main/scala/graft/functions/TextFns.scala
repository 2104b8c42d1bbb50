package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims.{column, expression}
import org.apache.spark.sql.functions._

/** Per-record text operators (SURVEY §2.2), expressed as built-in SQL
  * functions so Catalyst codegens them — no UDFs on these paths.
  */
object TextFns {

  /** P2 `clean_text` (reference `pre_process_docs.py:16-20`):
    * `&quot;` → `"`, then drop every char outside `[:a-zA-Z0-9\s"'-]`.
    */
  def cleanText(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "&quot;", "\""),
      "[^:a-zA-Z0-9\\s\"'-]", "")

  /** P3 `remove_tags` (reference `pre_process_docs.py:54-56`, BeautifulSoup
    * text extraction): strip markup tags, then unescape the common HTML
    * entities that show up in news feeds.
    */
  def removeTags(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", "")
    val amp = regexp_replace(noTags, "&amp;", "&")
    val lt = regexp_replace(amp, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    regexp_replace(quot, "&#39;|&apos;", "'")
  }

  /** P6 concat-for-embedding (reference `embed_docs.py:30-42`): join the
    * string fields with newlines.
    */
  def concatForEmbedding(cols: Column*): Column = concat_ws("\n", cols: _*)

  /** P5 relevance-threshold entity extraction (reference
    * `pre_process_docs.py:23-79`): from `array<struct{name, relevance}>`
    * keep names with `relevance >= t`, render `"Prefix: a, b"`.
    */
  def extractEntities(c: Column, nameField: String, threshold: Double, prefix: String): Column =
    concat(
      lit(prefix + ": "),
      array_join(transform(filter(c, x => x.getField("relevance") >= threshold),
        x => x.getField(nameField)), ", "))

  // ---------------------------------------------------------------------
  // Text analysis for training-data pipelines (beyond the reference).
  // All SQL-expressible so the DuckDB oracle can replay them.
  // ---------------------------------------------------------------------

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column =
    size(split(trim(c), "\\s+"))

  /** BPE-ish subword-regex token count: words are split into runs of
    * letters / digits / single punctuation, approximating a byte-pair
    * tokenizer's pre-tokenization pass.
    */
  def tokenCountRegex(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Document fingerprint: md5 of the casefolded, whitespace-collapsed
    * text. Identical in Spark and DuckDB, so exact-dup detection is
    * oracle-checkable.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** 64-bit rolling fingerprint (xxhash64 of the normalized text) — the
    * scale path: 8 bytes/doc instead of a 32-char string.
    */
  def fingerprint64(c: Column): Column =
    xxhash64(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Public so the oracle-SQL generator stays in sync with the Column impl. */
  val stopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "this")

  /** Lower-cased whitespace tokens — materialize in a projection when
    * feeding the token-input variants below (an expression referenced
    * many times re-evaluates per reference).
    */
  def lowerTokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  def stopwordRatioTokens(toks: Column): Column = {
    val stops = filter(toks, t => t.isin(stopwordsEn: _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Stopword ratio against a fixed English stopword list (quality
    * signal; also the base feature of the language-ID heuristic).
    */
  def stopwordRatio(c: Column): Column = stopwordRatioTokens(lowerTokens(c))

  /** Quality score in [0,1]: blend of length, alpha ratio, and stopword
    * ratio — the standard cheap pre-filter of LLM data pipelines.
    */
  def qualityScoreTokens(c: Column, toks: Column): Column = {
    val len = length(c).cast("double")
    val lenScore = least(len / lit(500.0), lit(1.0))
    val alpha = length(regexp_replace(c, "[^A-Za-z ]", "")).cast("double")
    val alphaRatio = when(len > 0, alpha / len).otherwise(lit(0.0))
    val stopScore = least(stopwordRatioTokens(toks) * lit(4.0), lit(1.0))
    round(lenScore * lit(0.4) + alphaRatio * lit(0.4) + stopScore * lit(0.2), 6)
  }

  def qualityScore(c: Column): Column = qualityScoreTokens(c, lowerTokens(c))

  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "como"))

  /** Language-ID heuristic: count stopword hits per candidate language,
    * pick the argmax (ties broken by the fixed language order above),
    * "und" (undetermined) when nothing matches.
    */
  def langIdTokens(toks: Column): Column = {
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  def langId(c: Column): Column = langIdTokens(lowerTokens(c))

  /** Repetition ratio: 1 − distinct(word n-grams)/count(word n-grams).
    * High values flag boilerplate/spam (the Gopher-rules repetition
    * signal). 0 for docs shorter than n words.
    */
  /** Tokenization for [[repetitionRatioTokens]] — materialize this in
    * its own projection (`withColumn`) so the split runs once per row;
    * a lambda referencing a non-trivial expression re-evaluates it per
    * element.
    */
  def repetitionTokens(c: Column): Column =
    split(regexp_replace(lower(trim(c)), "\\s+", " "), " ")

  /** Positioned (non-distinct) word n-grams of a token array, in
    * document order; docs shorter than `n` yield one clamped whole-doc
    * gram. try_element_at instead of slice: no per-gram array copy;
    * concat_ws skips out-of-range nulls exactly like slice's short
    * tail, so the gram strings are identical (element_at would THROW
    * past the end under ANSI mode — the short-tail case is
    * size(toks) < n).
    */
  def wordGramsTokens(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1)))
    transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => try_element_at(toks, i + lit(o))): _*))
  }

  def repetitionRatioTokens(toks: Column, n: Int): Column = {
    val grams = wordGramsTokens(toks, n)
    when(size(grams) > 0,
      round(lit(1.0) - size(array_distinct(grams)).cast("double")
        / size(grams).cast("double"), 6))
      .otherwise(lit(0.0))
  }

  /** Convenience single-expression form (inlines the tokenization). */
  def repetitionRatio(c: Column, n: Int): Column =
    repetitionRatioTokens(repetitionTokens(c), n)

  /** Mean word length over whitespace tokens (Gopher-rules signal):
    * non-whitespace char count / token count.
    */
  def meanWordLength(c: Column): Column = {
    val toks = split(trim(c), "\\s+")
    when(size(toks) > 0,
      round(length(regexp_replace(trim(c), "\\s+", "")).cast("double")
        / size(toks).cast("double"), 6))
      .otherwise(lit(0.0))
  }

  /** Symbol ratio: fraction of characters outside [A-Za-z0-9\s]. */
  def symbolRatio(c: Column): Column =
    when(length(c) > 0,
      round((length(c) - length(regexp_replace(c, "[^A-Za-z0-9\\s]", "")))
        .cast("double") / length(c).cast("double"), 6))
      .otherwise(lit(0.0))

  /** Redact emails and URLs (PII scrub for training corpora). */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(c,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "https?://[^\\s]+", "<URL>")

  /** Character n-gram shingles of the normalized text (dedup feature). */
  def charShingles(c: Column, n: Int): Column = {
    val norm = regexp_replace(lower(trim(c)), "\\s+", " ")
    val idx = sequence(lit(1), greatest(length(norm) - lit(n - 1), lit(1)))
    array_distinct(transform(idx, i => norm.substr(i, lit(n))))
  }

  /** Word n-gram shingles from a pre-split token column — materialize
    * the tokens in their own projection (see [[repetitionTokens]]): a
    * lambda referencing the split expression re-runs it per element.
    */
  def wordShinglesTokens(toks: Column, n: Int): Column =
    array_distinct(wordGramsTokens(toks, n))

  /** Word n-gram shingles (single-expression convenience form). */
  def wordShingles(c: Column, n: Int): Column =
    wordShinglesTokens(repetitionTokens(c), n)

  /** SimHash signature of a token array — one native-expression pass per
    * document, no explode/shuffle. See [[TokenSimHash]].
    */
  def simHash(toks: Column, bits: Int = 32): Column =
    column(TokenSimHash(expression(toks), bits))

  /** MinHash signature array over word n-gram shingles of a token
    * array — shingling fused into the expression. See [[MinHashShingles]].
    */
  def minHashShingles(toks: Column, n: Int = 3, seeds: Int = 12): Column =
    column(MinHashShingles(expression(toks), n, seeds))

  /** Winnowing fingerprint selections `array<struct<pos,fp>>` over a
    * normalized document — the k-gram hash / sliding-min / dedup
    * pipeline fused per document. See [[WinnowFingerprints]].
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    column(WinnowFingerprints(expression(text), k, w))

  /** Adjacent-token bigrams as `array<struct<w1,w2>>` — one native pass
    * per document. See [[TokenBigrams]].
    */
  def tokenBigrams(toks: Column): Column =
    column(TokenBigrams(expression(toks)))
}
