package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import scala.util.hashing.MurmurHash3

/** Deterministic text embedding stub.
  *
  * The reference embeds with Bedrock Titan / a SageMaker endpoint
  * (`embed_docs.py:70-95`); model inference is out of the engine's scope —
  * the operator CONTRACT is `text → array<float>(dim)` with ‖v‖₂ = 1
  * (`embed_docs.py:76` normalize:true). This stub honors that contract
  * deterministically: a signed feature-hashing projection of word unigrams
  * + bigrams onto `dim` buckets, L2-normalized. Texts sharing vocabulary
  * land close in cosine space, so the downstream ε-clusterer behaves like
  * it would on real embeddings — which is exactly what the golden tests
  * need.
  */
object HashEmbed {

  val DefaultDim = 64

  def tokens(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Pure function — safe to call driver-side in tests and oracles. */
  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      val ts = tokens(text)
      var i = 0
      while (i < ts.length) {
        addFeature(v, ts(i), dim)
        if (i + 1 < ts.length) addFeature(v, ts(i) + " " + ts(i + 1), dim)
        i += 1
      }
    }
    var normSq = 0.0
    var j = 0
    while (j < dim) { normSq += v(j).toDouble * v(j).toDouble; j += 1 }
    if (normSq > 0) {
      val inv = (1.0 / math.sqrt(normSq)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
    }
    v
  }

  private def addFeature(v: Array[Float], feature: String, dim: Int): Unit = {
    val h = MurmurHash3.stringHash(feature, 0x9747b28c)
    val bucket = math.floorMod(h, dim)
    val sign = if ((h >>> 31) == 0) 1.0f else -1.0f
    v(bucket) += sign
  }

  def embedUdf(dim: Int = DefaultDim): UserDefinedFunction =
    udf((text: String) => embed(text, dim))

  /** Column form: `embedColumn($"text")`. */
  def embedColumn(c: Column, dim: Int = DefaultDim): Column = embedUdf(dim)(c)
}
