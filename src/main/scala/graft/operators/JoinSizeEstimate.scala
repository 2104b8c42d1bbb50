package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight JOIN SIZE estimation: end-biased sampling (Estan &
  * Naughton 2006 "End-biased samples for join cardinality estimation")
  * over coordinated bottom-k sketches (Cohen & Kaplan 2007).
  *
  * The 100 TB pre-flight every shop wants: before committing a shuffle
  * join, estimate |A ⋈ B| from one cheap aggregate per side — and
  * CATCH the hot-key blowup, which is the whole reason to ask. Two
  * strata:
  *
  * - HEAVY keys (count ≥ `heavyThreshold` on either side) are counted
  *   EXACTLY: there are at most |A|/T of them, their (hash, count)
  *   rows are tiny, and their cA·cB products are precisely the
  *   quadratic terms a sampled estimator can miss (a key holding 10³
  *   rows per side is 10⁶ output pairs but lands in a uniform bottom-k
  *   sample with probability only k/U — the first cut of this operator
  *   missed a million-pair explosion exactly that way, caught by
  *   JoinSizeEstimateSpec's skew property).
  * - LIGHT keys are bottom-k sampled with a SHARED md5 key hash, so
  *   both sides sample the SAME keys; for the sampled set S with KMV
  *   union estimate U: light ≈ (U / |S|) · Σ_{S} cA·cB.
  *
  * est_pairs = heavy_pairs + light estimate. Each side contributes one
  * map-side-partial (hash, count) aggregate; the heavy and sampled
  * joins run on ≤ |A|/T and k rows. All md5 + integer arithmetic plus
  * exactly-rounded double ops — the oracle replays the estimate
  * bit-for-bit; the accuracy CLAIMS are property-tested separately.
  */
object JoinSizeEstimate {

  private def keyHash(c: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("jse:"), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** One row: (k_used, n_heavy, union_light_est, sampled_pairs,
    * heavy_pairs, est_pairs). The light stratum is exact when its
    * universe fits the sample (k_used < k); an empty side yields 0.
    */
  def estimate(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
               k: Int, heavyThreshold: Long = 1000L): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    require(heavyThreshold >= 2, s"need heavyThreshold >= 2, got $heavyThreshold")
    val ca = a.select(keyHash(col(aKey)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("ca"))
    val cb = b.select(keyHash(col(bKey)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("cb"))
    // heavy stratum: exact products
    val heavy = ca.filter(col("ca") >= heavyThreshold).select(col("h"))
      .unionByName(cb.filter(col("cb") >= heavyThreshold).select(col("h")))
      .distinct()
    val heavyAgg = heavy
      .join(ca, Seq("h"), "left_outer")
      .join(cb, Seq("h"), "left_outer")
      .agg(count(lit(1)).as("n_heavy"),
        coalesce(sum(coalesce(col("ca"), lit(0L)) * coalesce(col("cb"), lit(0L))),
          lit(0L)).as("heavy_pairs"))
    // light stratum: coordinated bottom-k over the remaining universe
    val caL = ca.join(heavy, Seq("h"), "left_anti")
    val cbL = cb.join(heavy, Seq("h"), "left_anti")
    val union = caL.select(col("h")).unionByName(cbL.select(col("h"))).distinct()
    val bottom = union.orderBy(col("h")).limit(k)
    val nU = bottom.agg(count(lit(1)).as("n_sample"), max(col("h")).as("hk"))
    val prod = bottom
      .join(caL, Seq("h"), "left_outer")
      .join(cbL, Seq("h"), "left_outer")
      .agg(coalesce(sum(coalesce(col("ca"), lit(0L)) * coalesce(col("cb"), lit(0L))),
        lit(0L)).as("sampled_pairs"))
    val kmv = round(lit((k - 1).toDouble * 1152921504606846976.0)
      / col("hk").cast("double"), 4)
    val lightEst =
      when(col("n_sample") === 0, lit(0.0))
        .when(col("n_sample") < k, col("sampled_pairs").cast("double"))
        .otherwise(round(kmv / col("n_sample") * col("sampled_pairs"), 4))
    prod.crossJoin(broadcast(nU)).crossJoin(broadcast(heavyAgg))
      .select(
        col("n_sample").cast("long").as("k_used"),
        col("n_heavy").cast("long").as("n_heavy"),
        when(col("n_sample") < k, col("n_sample").cast("double"))
          .otherwise(kmv).as("union_light_est"),
        col("sampled_pairs").cast("long").as("sampled_pairs"),
        col("heavy_pairs").cast("long").as("heavy_pairs"),
        round(col("heavy_pairs").cast("double") + lightEst, 4).as("est_pairs"))
  }
}
