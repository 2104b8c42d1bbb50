package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** IVF-style approximate nearest-neighbor search over `array<float>`
  * embedding columns — the scale path that brute-force kNN (s1_knn)
  * calibrates.
  *
  * Coarse quantizer: the signed dominant axis — `(argmax_k |v_k|,
  * sign(v_argmax))`, i.e. 2·dim fixed centroids that cost nothing to
  * "train" and are computed in one codegen'd pass per row (no ML fit, no
  * extra job). Every vector is ASSIGNED to exactly one bucket; a query
  * PROBES its `nprobe` best buckets (axes ranked by |v_k| desc, index
  * asc tie-break) — classic IVF multi-probe: recall climbs with nprobe
  * because near-boundary neighbors whose dominant axis is the query's
  * runner-up axis come back into the candidate set, while the scan stays
  * bucket-restricted (never the full corpus).
  *
  * At 100 TB: the corpus side is hash-partitioned by (bidx, bsign) once
  * and reused across query batches; the query side is micro-batch-sized
  * and broadcast, so a search shuffles nothing.
  */
object AnnSearch {

  /** Top-`nprobe` signed-axis buckets of `vec`, best first, as
    * `array<struct<bidx: long, bsign: int>>` (bidx is 1-based to match
    * SQL subscripts). Pure built-ins — stays inside whole-stage codegen.
    */
  def signedAxisProbes(vec: Column, nprobe: Int): Column = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    // One linear-size expression: sort (−|v|, idx) structs — struct order
    // is lexicographic, so this ranks axes by |v| desc with idx-asc
    // tie-break — and slice the top nprobe. (An iterated argmax+mask fold
    // here grows the expression tree EXPONENTIALLY in nprobe: each mask
    // re-embeds the previous argmax subtree; nprobe=32 OOMed the
    // analyzer. The sort form is O(dim log dim) per row and fixed-size.)
    val ranked = array_sort(zip_with(
      vec, sequence(lit(1), size(vec)),
      (x, i) => struct((-abs(x)).as("na"), i.as("idx"))))
    transform(slice(ranked, 1, nprobe), s => struct(
      s.getField("idx").cast("long").as("bidx"),
      signum(element_at(vec, s.getField("idx"))).cast("int").as("bsign")))
  }

  /** Corpus with its single assigned bucket: adds (bidx, bsign). */
  def assignBuckets(corpus: DataFrame, vecCol: String): DataFrame = {
    val probe = signedAxisProbes(col(vecCol), 1).getItem(0)
    corpus.withColumn("bidx", probe.getField("bidx"))
      .withColumn("bsign", probe.getField("bsign"))
  }

  /** Top-`k` neighbors per query by rounded cosine (4 dp, id-asc
    * tie-break so the cut is engine-stable), candidates restricted to the
    * query's `nprobe` probe buckets. Inputs are unit-norm vectors, so
    * dot product IS cosine similarity.
    *
    * Each corpus row is assigned to exactly ONE bucket and probe buckets
    * are distinct, so no candidate appears twice — no distinct() needed.
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, nprobe: Int): DataFrame = {
    val bucketed = assignBuckets(
      corpus.select(col(idCol), col(vecCol)), vecCol)
    // explode in a separate step: aliasing qv and exploding a probe
    // expression over it in ONE select trips lateral-column-alias
    // resolution (Generate may not carry an LCA reference)
    val probed = queries
      .select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .withColumn("probe", explode(signedAxisProbes(col("qv"), nprobe)))
      .select(col("qid"), col("qv"),
        col("probe.bidx").as("bidx"), col("probe.bsign").as("bsign"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col(idCol).asc)
    broadcast(probed).join(bucketed, Seq("bidx", "bsign"))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("sim", round(VectorFns.dotProduct(col("qv"), col(vecCol)), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col(idCol), col("sim"), col("rk"))
  }
}
