package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Cross-document SPAN detection — the exact-substring dedup shape
  * (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better") re-expressed at token-n-gram granularity: for every
  * candidate pair, the length in tokens of the longest run of
  * consecutive shared `gramLen`-grams. A shared token span of length
  * `M ≥ gramLen` is exactly `M − gramLen + 1` consecutive matching
  * grams on ONE diagonal (same positional offset in both docs), so the
  * operator joins positioned gram digests, groups matches by
  * (pair, diagonal), and measures run lengths with the classic
  * islands trick (`i − row_number()` constant within a run) — no
  * suffix array, no per-pair alignment, every step a hash
  * shuffle/window over match rows.
  *
  * Scale: match rows are bounded by Σ_gram df² — boilerplate grams are
  * the hazard (a gram shared by k docs yields k² rows). `maxGramDf`
  * caps it: grams with corpus df above the cap are dropped before the
  * join (one extra df aggregation), trading away spans made ONLY of
  * ultra-common grams. None = lossless.
  *
  * Exchange keys are 16-byte md5 digests of grams (the d10 digest-key
  * plan), never raw strings.
  */
object SpanDedup {

  /** Pairs `(a, b, span)` with `a < b` sharing a token span of at least
    * `minSpan` tokens; `span` = longest shared run in tokens.
    * Tokenization matches the corpus-wide convention
    * ([[TextFns.repetitionTokens]]: lower, trim, whitespace split).
    */
  def selfPairs(corpus: DataFrame, idCol: String, textCol: String,
                gramLen: Int = 8, minSpan: Int = 20,
                maxGramDf: Option[Long] = None): DataFrame = {
    require(gramLen >= 2, s"gramLen must be >= 2, got $gramLen")
    require(minSpan >= gramLen, s"minSpan ($minSpan) must be >= gramLen ($gramLen)")
    // positioned grams (NOT distinct — runs need every occurrence)
    val grams0 = corpus
      .withColumn("__toks", TextFns.repetitionTokens(col(textCol)))
      .select(col(idCol).as("__id"),
        posexplode(TextFns.wordGramsTokens(col("__toks"), gramLen))
          .as(Seq("__p", "__g")))
      .select(col("__id"), (col("__p") + 1).as("__i"), md5(col("__g")).as("__gh"))
    val grams = maxGramDf match {
      case Some(cap) =>
        val dfs = grams0.groupBy(col("__gh"))
          .agg(countDistinct(col("__id")).as("__df"))
          .filter(col("__df") <= cap)
          .select(col("__gh"))
        grams0.join(dfs, "__gh")
      case None => grams0
    }
    val matches = grams.as("x").join(grams.as("y"),
        col("x.__gh") === col("y.__gh") && col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a"), col("y.__id").as("b"),
        col("x.__i").as("__i"), (col("x.__i") - col("y.__i")).as("__diag"))
    // islands: within (a, b, diagonal), consecutive i share a constant
    // i − row_number(); run length = island size
    val w = Window.partitionBy(col("a"), col("b"), col("__diag")).orderBy(col("__i"))
    matches
      .withColumn("__grp", col("__i") - row_number().over(w))
      .groupBy(col("a"), col("b"), col("__diag"), col("__grp"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col("a"), col("b"))
      .agg((max(col("__run")) + lit(gramLen - 1)).as("span"))
      .filter(col("span") >= minSpan)
  }
}
