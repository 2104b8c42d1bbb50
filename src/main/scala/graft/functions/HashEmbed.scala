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

  /** The reference's endpoint batch cap: at most 200 articles per
    * inference call (`iac/roots/main/variables.tf:103-107`,
    * `embed_docs.py:67-68`). [[embedBatch]] enforces it so a real model
    * swap-in inherits the contract.
    */
  val MaxBatch = 200

  /** BATCHED embedding contract — the model seam. One call embeds one
    * chunk (≤ [[MaxBatch]] texts); a real deployment replaces this body
    * with one endpoint/model invocation per call and nothing upstream
    * changes. Output order matches input order.
    */
  def embedBatch(texts: Seq[String], dim: Int = DefaultDim): Seq[Array[Float]] = {
    require(texts.size <= MaxBatch,
      s"embedBatch called with ${texts.size} texts; the endpoint contract caps at $MaxBatch")
    texts.map(embed(_, dim))
  }

  /** Partition-level chunking shell: stream a partition through the
    * batched seam in ≤ `batchSize` chunks (the `mapInPandas` batch
    * shape, mirroring [[graft.operators.Multimodal.decodeImages]]).
    */
  def embedPartition(texts: Iterator[String], dim: Int = DefaultDim,
                     batchSize: Int = MaxBatch,
                     embedder: (Seq[String], Int) => Seq[Array[Float]] = embedBatch)
      : Iterator[Array[Float]] = {
    require(batchSize > 0 && batchSize <= MaxBatch)
    texts.grouped(batchSize).flatMap(chunk => embedder(chunk, dim))
  }

  def embedUdf(dim: Int = DefaultDim): UserDefinedFunction =
    udf((text: String) => embed(text, dim))

  /** Column form: `embedColumn($"text")` — per-row scalar path, kept for
    * ad-hoc column use; the pipeline stage goes through [[embedPartition]].
    */
  def embedColumn(c: Column, dim: Int = DefaultDim): Column = embedUdf(dim)(c)
}
