package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.GraftShims.{column, expression}
import org.apache.spark.sql.functions._

/** Column-level vector algebra over `array<float>` embedding columns.
  *
  * All operators in the engine treat embeddings as plain
  * `ArrayType(FloatType)` columns (reference stores them as JSON float
  * lists, `embed_docs.py:97-98`); the hot paths ride on the codegen'd
  * [[FloatVectorDot]] / [[FloatVectorNormSq]] expressions.
  */
object VectorFns {

  /** dot(a, b) — codegen'd, stays inside whole-stage codegen. */
  def dotProduct(a: Column, b: Column): Column =
    column(FloatVectorDot(expression(a), expression(b)))

  /** ‖a‖₂² */
  def normSq(a: Column): Column = column(FloatVectorNormSq(expression(a)))

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity for arbitrary (not necessarily unit) vectors. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (norm(a) * norm(b))

  /** Cosine distance, the clusterer's metric (reference
    * `clustering.py:62-66`: `1 - emb @ pool`, clipped to [0,1]).
    */
  def cosineDistance(a: Column, b: Column): Column =
    least(greatest(lit(1.0) - cosineSimilarity(a, b), lit(0.0)), lit(1.0))

  /** Cosine distance when both sides are already L2-normalized (the
    * engine's embedding contract — `embed_docs.py:76` normalize:true):
    * skips the two norm computations.
    */
  def unitCosineDistance(a: Column, b: Column): Column =
    least(greatest(lit(1.0) - dotProduct(a, b), lit(0.0)), lit(1.0))

  /** L2-normalize an `array<float>` column (zero vectors pass through). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => (x / n).cast("float")))
  }

  /** Element-wise sum of two equal-length vectors (pure built-ins —
    * used by the centroid-mean aggregation path).
    */
  def elementwiseSum(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => (x + y).cast("float"))

  /** Sparse dot product of two sorted (keys, values) term vectors —
    * codegen'd merge scan, O(n+m) per pair. See [[SortedTermDot]].
    */
  def sortedTermDot(keysA: Column, valsA: Column,
                    keysB: Column, valsB: Column): Column =
    column(SortedTermDot(expression(keysA), expression(valsA),
      expression(keysB), expression(valsB)))

  /** Intersection size of two sorted duplicate-free string arrays —
    * codegen'd merge scan. See [[SortedIntersectCount]].
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))
}
