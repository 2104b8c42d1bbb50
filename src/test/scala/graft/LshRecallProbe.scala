package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashEmbed
import graft.operators.SimilarityJoin

/** Recall curve for the clusterer's extreme-scale LSH escape hatch
  * (VERDICT r10 #5): `SimilarityJoin.lsh` (the `Clustering.LshJoin`
  * strategy) vs the LOSSLESS BandJoin ground truth, on a 100 k pool ×
  * 1 000-article batch at the clusterer's eps = 0.10 — the exact call
  * shape `Clustering.step` makes.
  *
  * The batch plants true pairs ACROSS the distance band: 500 articles
  * are α-perturbed copies of pool vectors, v' = normalize(v + α·w) with
  * unit noise w, giving cosine distance 1 − 1/√(1+α²) — α chosen for
  * dist ≈ {0.02, 0.05, 0.08, 0.095}, i.e. including the near-boundary
  * pairs where LSH recall actually degrades; the other 500 are
  * unrelated (no pair). LSH output is a verified SUBSET of the truth
  * (approxSimilarityJoin re-checks the distance), so
  * recall = |lsh| / |band|; the curve sweeps numHashTables (Spark's
  * BRP-LSH OR-amplification knob).
  *
  * Run: `sbt "Test/runMain graft.LshRecallProbe"`; feeds PERF.md and
  * the SimilarityJoinSpec recall-floor pin.
  */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val poolN = 100000L
    val batchN = 1000L
    val eps = 0.10

    val pool = spark.range(1, poolN + 1).select(
      col("id").as("seq"),
      HashEmbed.embedColumn(concat(lit("pooldoc "), col("id").cast("string")))
        .as("centroid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pool.count()

    // normalize(v + α·w): unit v, unit w ⇒ cosine dist ≈ 1 − 1/√(1+α²)
    // (w near-orthogonal to v — HashEmbed vectors of distinct texts)
    def mixed(v: Column, w: Column, alpha: Column): Column = {
      val mix = zip_with(v, w, (a, b) => a + alpha.cast("float") * b)
      val norm = sqrt(aggregate(mix, lit(0.0d),
        (s, x) => s + x.cast("double") * x.cast("double")))
      transform(mix, x => (x.cast("double") / norm).cast("float"))
    }
    // α for target distances 0.02 / 0.05 / 0.08 / 0.095
    def alphaFor(d: Double): Double = math.sqrt(1.0 / math.pow(1.0 - d, 2) - 1.0)
    val alphas = Seq(0.02, 0.05, 0.08, 0.095).map(alphaFor)
    val alphaCol = element_at(
      array(alphas.map(a => lit(a)): _*), (col("id") % 4 + 1).cast("int"))

    val target = (col("id") * 97L) % poolN + 1L
    val batch = spark.range(0, batchN).select(
      (col("id") + 10000000L).as("seq"),
      when(col("id") % 2 === 0,
          mixed(
            HashEmbed.embedColumn(concat(lit("pooldoc "), target.cast("string"))),
            HashEmbed.embedColumn(concat(lit("noise "), col("id").cast("string"))),
            alphaCol))
        .otherwise(
          HashEmbed.embedColumn(concat(lit("batchdoc "), col("id").cast("string"))))
        .as("centroid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batch.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (truth, bandSec) = timed {
      SimilarityJoin.bandExact(batch, pool, "seq", "centroid", eps)
        .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(f"LSH_RECALL truth: ${truth.size} pairs via BandJoin in ${bandSec}%.1fs " +
      f"(pool=$poolN batch=$batchN eps=$eps)")

    for (tables <- Seq(1, 2, 4, 8, 12)) {
      val (got, sec) = timed {
        SimilarityJoin.lsh(batch, pool, "seq", "centroid", eps, tables)
          .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val hit = got.count(truth.contains)
      val recall = if (truth.isEmpty) -1.0 else hit.toDouble / truth.size
      assert(got.subsetOf(truth) || got.forall(truth.contains),
        "LSH emitted a pair outside the verified truth set")
      println(f"LSH_RECALL tables=$tables%-2d recall=$recall%.4f " +
        f"pairs=${got.size}/${truth.size} wall=${sec}%.1fs")
    }
    spark.stop()
  }
}
