package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
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
  * `exactSelf`/`lshSelf` emit `(a, b, dist)` with a < b (dedup'd
  * unordered pairs). The asymmetric `exact` emits every qualifying
  * (left, right) pair with a ≠ b — when left ⊆ right (the clusterer's
  * new×(pool∪new) call) within-left pairs appear in both directions;
  * downstream connected-components symmetrizes + dedups anyway, so no
  * extra shuffle is spent here.
  */
object SimilarityJoin {

  /** Exact pairwise ε-join between two frames keyed by a long id.
    * `df` columns: (key: long, vec: array<float>). Unit-norm inputs.
    *
    * NOTE: must NOT filter `a < b` — the clusterer's new entries carry
    * the HIGHEST seq values, so `a < b` would drop every (new, old-pool)
    * edge and new articles could never join existing clusters
    * (reference incremental block `process_records.py:344-354`).
    */
  def exact(left: DataFrame, right: DataFrame, keyCol: String, vecCol: String,
            eps: Double, broadcastLeft: Boolean = false): DataFrame = {
    val l = left.select(col(keyCol).as("a"), col(vecCol).as("va"))
    val r = right.select(col(keyCol).as("b"), col(vecCol).as("vb"))
    val lside = if (broadcastLeft) broadcast(l) else l
    lside.crossJoin(r)
      .filter(col("a") =!= col("b"))
      .withColumn("dist", VectorFns.unitCosineDistance(col("va"), col("vb")))
      .filter(col("dist") <= eps)
      .select(col("a"), col("b"), col("dist"))
  }

  /** Exact self ε-join: unique unordered pairs (a < b). */
  def exactSelf(df: DataFrame, keyCol: String, vecCol: String, eps: Double): DataFrame =
    exact(df, df, keyCol, vecCol, eps).filter(col("a") < col("b"))

  private def toVec(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(
      col(keyCol).as("k"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))

  /** Asymmetric LSH-bucketed approximate ε-join — the 100 TB clusterer
    * path: candidates come only from shared hash buckets, so the work is
    * O(|new| · bucket occupancy), not O(|new| · |pool|) and never
    * O(pool²). The model is fit on the (small) left side only — fitting
    * just computes random projection planes, so which side fits is
    * statistically irrelevant, but fitting on the batch avoids a pass
    * over the pool.
    */
  def lsh(left: DataFrame, right: DataFrame, keyCol: String, vecCol: String,
          eps: Double, numHashTables: Int = 4, bucketLength: Double = 1.0): DataFrame = {
    val l = toVec(left, keyCol, vecCol)
    val r = toVec(right, keyCol, vecCol)
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength)
      .setNumHashTables(numHashTables)
      .setInputCol("features")
      .setOutputCol("hashes")
      .setSeed(42L)
      .fit(l)
    // on unit vectors: d_euc² = 2·d_cos  ⇒  eps_cos=0.10 → eps_euc=√0.20
    val epsEuc = math.sqrt(2.0 * eps)
    model.approxSimilarityJoin(l, r, epsEuc, "euclidean")
      .select(
        col("datasetA.k").as("a"),
        col("datasetB.k").as("b"),
        (col("euclidean") * col("euclidean") / 2.0).as("dist"))
      .filter(col("a") =!= col("b"))
  }

  /** LSH-bucketed approximate self ε-join (unique unordered pairs). */
  def lshSelf(df: DataFrame, keyCol: String, vecCol: String, eps: Double,
              numHashTables: Int = 4, bucketLength: Double = 1.0): DataFrame =
    lsh(df, df, keyCol, vecCol, eps, numHashTables, bucketLength)
      .filter(col("a") < col("b"))

  /** EXACT pivot-band ε-join — same results as `exact`, sub-quadratic
    * plan. Angular distance to a fixed pivot is 1-Lipschitz in angular
    * distance between points (triangle inequality on the sphere), so
    * two unit vectors with cosine distance ≤ eps have per-pivot angle
    * bands differing by at most 1. Build side: one band key per pivot
    * tuple; probe side: the 3^pivots neighboring tuples. The cross join
    * becomes an equi-join on the band key + the exact distance filter —
    * zero recall loss, and Catalyst gets a shuffled hash join it can
    * partition, instead of a nested loop.
    *
    * Pivots are coordinate axes (θ = acos(v[k])) — free to evaluate.
    * Pruning power grows as eps shrinks (band width = θ_eps); at the
    * clusterer's eps=0.10 each pivot yields ~7 bands.
    */
  def bandExact(left: DataFrame, right: DataFrame, keyCol: String, vecCol: String,
                eps: Double, pivots: Int = 2): DataFrame = {
    // eps ≤ 1 keeps the exactness contract: dist ≤ eps ⟺ angle ≤
    // acos(1-eps) = thetaEps, so qualifying pairs differ by ≤ 1 band
    // per pivot. For eps > 1 the qualifying angle can reach π > thetaEps
    // and the ±1 neighbor window would silently drop pairs (ADVICE r2) —
    // callers needing eps > 1 should use `exact` (every pair qualifies
    // near eps=2 anyway, so banding buys nothing there).
    require(eps > 0 && eps <= 1, s"eps out of range for bandExact: $eps")
    val thetaEps = math.acos(1.0 - eps) // cosine dist → angle
    // try_element_at + coalesce-to-0: a vector shorter than the pivot
    // index banks on the dot product's own semantics — FloatVectorDot
    // runs over min(length), i.e. ZERO-padding — so the missing
    // component IS 0 and the axis angle is acos(0). (Clamping the null
    // instead would assign acos(−1)=π — greatest() SKIPS nulls — and
    // ragged-dimension pairs could band >1 apart yet sit within eps,
    // silently dropping results the cross-join plan keeps.)
    def theta(v: Column, k: Int): Column =
      acos(least(greatest(
        coalesce(try_element_at(v, lit(k + 1)).cast("double"), lit(0.0)),
        lit(-1.0)), lit(1.0)))
    def bandOf(v: Column, k: Int): Column =
      floor(theta(v, k) / lit(thetaEps)).cast("int")

    // build side: single band tuple
    val buildKey = concat_ws("|", (0 until pivots).map(k => bandOf(col("vb"), k)): _*)
    val r = right.select(col(keyCol).as("b"), col(vecCol).as("vb"))
      .withColumn("__band", buildKey)

    // probe side: all neighbor tuples (±1 per pivot)
    val offsets = (0 until pivots).foldLeft(Seq(Seq.empty[Int])) { (acc, _) =>
      acc.flatMap(t => Seq(-1, 0, 1).map(o => t :+ o))
    }
    // array_distinct: with bands defined for every vector (zero-padded
    // semantics above) all 3^p neighbor keys are distinct — kept as a
    // no-op safety net for the emit-each-pair-once guarantee below
    val probeKeys = array_distinct(array(offsets.map { off =>
      concat_ws("|", off.zipWithIndex.map { case (o, k) =>
        (bandOf(col("va"), k) + lit(o)).cast("int")
      }: _*)
    }: _*))
    val l = left.select(col(keyCol).as("a"), col(vecCol).as("va"))
      .withColumn("__band", explode(probeKeys))

    // No dedup needed: for a fixed pair exactly ONE probe offset tuple
    // can equal the build band tuple (o_k = bandOf(vb,k) − bandOf(va,k)
    // is unique per pivot), so the equi-join emits each qualifying pair
    // exactly once — a distinct() here would only buy a shuffle.
    l.join(r, "__band")
      .filter(col("a") =!= col("b"))
      .withColumn("dist", VectorFns.unitCosineDistance(col("va"), col("vb")))
      .filter(col("dist") <= eps)
      .select(col("a"), col("b"), col("dist"))
  }

  /** Exact pivot-band self ε-join (unique unordered pairs). */
  def bandExactSelf(df: DataFrame, keyCol: String, vecCol: String, eps: Double,
                    pivots: Int = 2): DataFrame =
    bandExact(df, df, keyCol, vecCol, eps, pivots).filter(col("a") < col("b"))
}
