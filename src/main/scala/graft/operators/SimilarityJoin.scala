package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** ε-similarity joins over `array<float>` embedding columns (SURVEY J1).
  *
  * Two physical strategies behind one semantic contract
  * ("pairs with cosine distance ≤ eps"):
  *
  *  - `exact`: self/cross join + codegen'd dot product. O(N·M) — correct
  *    at any eps, right choice when one side is a micro-batch (the
  *    clusterer joins a 500-row batch against the pool: broadcast the
  *    batch, stream the pool — no shuffle of the big side).
  *  - `lsh`: `BucketedRandomProjectionLSH.approxSimilarityJoin`. On
  *    L2-normalized vectors cosine distance maps to Euclidean:
  *    d_euc² = 2·d_cos, so eps_cos=0.10 ⇒ eps_euc=√0.20. Sub-quadratic;
  *    the 100 TB path. Approximate (tunable recall via numHashTables).
  *
  * Both emit `(a_<keyCol>, b_<keyCol>, dist)` with a < b (dedup'd
  * unordered pairs).
  */
object SimilarityJoin {

  /** Exact pairwise ε-join between two frames keyed by a long id.
    * `df` columns: (key: long, vec: array<float>). Unit-norm inputs.
    */
  def exact(left: DataFrame, right: DataFrame, keyCol: String, vecCol: String,
            eps: Double, broadcastLeft: Boolean = false): DataFrame = {
    val l = left.select(col(keyCol).as("a"), col(vecCol).as("va"))
    val r = right.select(col(keyCol).as("b"), col(vecCol).as("vb"))
    val lside = if (broadcastLeft) broadcast(l) else l
    lside.crossJoin(r)
      .filter(col("a") < col("b"))
      .withColumn("dist", VectorFns.unitCosineDistance(col("va"), col("vb")))
      .filter(col("dist") <= eps)
      .select(col("a"), col("b"), col("dist"))
  }

  /** Exact self ε-join. */
  def exactSelf(df: DataFrame, keyCol: String, vecCol: String, eps: Double): DataFrame =
    exact(df, df, keyCol, vecCol, eps)

  /** LSH-bucketed approximate ε-join (scale path). */
  def lshSelf(df: DataFrame, keyCol: String, vecCol: String, eps: Double,
              numHashTables: Int = 4, bucketLength: Double = 1.0): DataFrame = {
    val withVec = df.select(
      col(keyCol).as("k"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength)
      .setNumHashTables(numHashTables)
      .setInputCol("features")
      .setOutputCol("hashes")
      .setSeed(42L)
    val model = lsh.fit(withVec)
    val epsEuc = math.sqrt(2.0 * eps)
    model.approxSimilarityJoin(withVec, withVec, epsEuc, "euclidean")
      .select(
        col("datasetA.k").as("a"),
        col("datasetB.k").as("b"),
        // back to cosine distance: d_cos = d_euc² / 2
        (col("euclidean") * col("euclidean") / 2.0).as("dist"))
      .filter(col("a") < col("b"))
  }
}
