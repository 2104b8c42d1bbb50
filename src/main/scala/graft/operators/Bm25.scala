package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** BM25 top-k text retrieval (Robertson et al., the Okapi weighting) —
  * the scored-search operator a training-data pipeline uses for corpus
  * exploration and eval-set mining, complementing the embedding-space
  * s1-s9 family with the lexical path.
  *
  * Plan shape (the 100 TB argument): the corpus explodes ONCE into
  * (doc, term, tf) postings, which are immediately SEMI-JOINED against
  * the broadcast query-term set — the inverted-index probe: postings
  * for non-query terms never shuffle, so the per-query cost tracks the
  * postings of its terms, not corpus size. Document frequencies
  * aggregate over that pruned postings set (one tiny exchange, ≤ one
  * row per query term), broadcast back, and the per-(query, doc) score
  * sum shuffles only scored postings. Corpus-wide scalars (N, Σdl)
  * fold in via a broadcast single-row cross join.
  *
  * Portability: per-term scores are rounded to 6 dp and summed in
  * DECIMAL(18,6) (the repo's portable-aggregation convention), so the
  * DuckDB oracle replays the whole scoring bit-identically. `idf`
  * defaults to the RATIONAL Robertson-Sparck-Jones core
  * (N − df + 0.5)/(df + 0.5) — every arithmetic op is exactly rounded
  * IEEE, where the textbook `ln(1 + …)` form depends on the host libm's
  * (≤1 ulp, not correctly-rounded) log and can diverge across engines.
  * `idfMode = "ln"` gives the textbook weighting for API users; the
  * oracle-gated catalog entry uses the rational form. Both are
  * monotone in df per term, so single-term rankings agree; multi-term
  * rankings are the standard BM25-family trade.
  */
object Bm25 {

  /** @param docs    corpus with `idCol` and `textCol`
    * @param queries query table with `qidCol` and whitespace query text
    *                in `qTextCol` (small — broadcast)
    * @param k       results per query
    * @return (qidCol, rk, idCol, score) — rk 1..k by score desc, id asc
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qidCol: String, qTextCol: String,
           k: Int, k1: Double = 1.2, b: Double = 0.75,
           idfMode: String = "rational"): DataFrame = {
    val toks = docs.select(col(idCol).as("__doc"),
        TextFns.lowerTokens(col(textCol)).as("__toks"))
      .select(col("__doc"), size(col("__toks")).cast("double").as("__dl"),
        explode(col("__toks")).as("__term"))
    val tf = toks.groupBy(col("__doc"), col("__dl"), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"))

    val g = docs.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(size(TextFns.lowerTokens(col(textCol)))).cast("double").as("__sumdl"))

    val qt = queries.select(col(qidCol).as("__qid"),
        explode(array_distinct(TextFns.lowerTokens(col(qTextCol)))).as("__term"))
    val qTermSet = qt.select(col("__term")).distinct()

    // inverted-index probe: non-query-term postings die before any shuffle
    val postings = tf.join(broadcast(qTermSet), Seq("__term"), "left_semi")
    val dfT = postings.groupBy(col("__term"))
      .agg(count(lit(1)).cast("double").as("__df"))

    val ratio = (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))
    val idf = idfMode match {
      case "rational" => ratio
      case "ln" => log(ratio + lit(1.0))
      case other => throw new IllegalArgumentException(s"idfMode: $other")
    }
    // parenthesization is part of the contract — the oracle replays the
    // identical exactly-rounded op sequence
    val tfNorm = (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * (col("__dl") * col("__n") / col("__sumdl"))))

    val perDoc = postings
      .join(broadcast(dfT), "__term")
      .join(broadcast(qt), "__term")
      .crossJoin(broadcast(g))
      .select(col("__qid"), col("__doc"),
        round(idf * tfNorm, 6).cast("decimal(18,6)").as("__ts"))
      .groupBy(col("__qid"), col("__doc"))
      .agg(sum(col("__ts")).cast("double").as("score"))

    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("__doc").asc)
    perDoc.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("__qid").as(qidCol), col("rk"),
        col("__doc").as(idCol), col("score"))
  }
}
