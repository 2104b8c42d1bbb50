package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityJoin

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  // four unit vectors: a≈b (close), c≈d (close), a⊥c
  private def df4 = Seq(
    (1L, unit(1, 0, 0, 0)),
    (2L, unit(1, 0.1, 0, 0)),
    (3L, unit(0, 0, 1, 0)),
    (4L, unit(0, 0.1, 1, 0))).toDF("k", "v")

  test("exactSelf returns unique unordered close pairs") {
    val pairs = SimilarityJoin.exactSelf(df4, "k", "v", eps = 0.05)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("asymmetric exact keeps high-key-left vs low-key-right edges " +
    "(regression: new pool entries have the highest seq)") {
    val pool = Seq((1L, unit(1, 0, 0, 0))).toDF("k", "v")
    val newer = Seq((99L, unit(1, 0.05, 0, 0))).toDF("k", "v")
    val edges = SimilarityJoin.exact(newer, pool, "k", "v", eps = 0.05)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(edges == Set((99L, 1L))) // a<b filter would have dropped this
  }

  test("exact respects the eps boundary inclusively") {
    // dist(u, v) where dot = 0.9 → dist exactly 0.1 (float-rounded)
    val u = Seq((1L, Array(1f, 0f))).toDF("k", "v")
    val v = Seq((2L, Array(0.9f, math.sqrt(1 - 0.81).toFloat))).toDF("k", "v")
    val hits = SimilarityJoin.exact(u, v, "k", "v", eps = 0.1000001).count()
    assert(hits == 1)
    val miss = SimilarityJoin.exact(u, v, "k", "v", eps = 0.05).count()
    assert(miss == 0)
  }

  test("bandExact returns exactly the same pairs as the cross-join exact " +
    "(pivot bands are a lossless pre-filter) across random seeds") {
    import scala.util.Random
    for (seed <- Seq(3, 17)) {
      val rnd = new Random(seed)
      val vecs = (0 until 60).map { i =>
        val v = Array.fill(8)(rnd.nextGaussian())
        val n = math.sqrt(v.map(x => x * x).sum)
        (i.toLong, v.map(x => (x / n).toFloat))
      }
      val df = vecs.toDF("k", "v")
      for (eps <- Seq(0.05, 0.3, 0.8)) {
        val want = SimilarityJoin.exactSelf(df, "k", "v", eps)
          .select("a", "b").as[(Long, Long)].collect().toSet
        val got = SimilarityJoin.bandExactSelf(df, "k", "v", eps, pivots = 2)
          .select("a", "b").as[(Long, Long)].collect().toSet
        assert(got == want, s"seed=$seed eps=$eps")
      }
    }
  }

  test("bandExact matches exact on MIXED-dimension vectors " +
    "(missing pivot components band as zero, like the dot's zero-padding)") {
    val df = Seq(
      (1L, Array(1f)),                    // 1-dim
      (2L, unit(1, 0.05, 0, 0)),          // 4-dim, within 0.05 of #1
      (3L, unit(0, 1, 0, 0))).toDF("k", "v")
    for (eps <- Seq(0.05, 0.3)) {
      val want = SimilarityJoin.exactSelf(df, "k", "v", eps)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val got = SimilarityJoin.bandExactSelf(df, "k", "v", eps)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(got == want, s"eps=$eps")
    }
    // the short-vs-long pair really qualifies (non-vacuous regression)
    assert(SimilarityJoin.exactSelf(df, "k", "v", 0.05)
      .select("a", "b").as[(Long, Long)].collect().toSet == Set((1L, 2L)))
  }

  test("asymmetric lsh finds the same new-vs-pool edges as exact on separated data") {
    val pool = Seq(
      (1L, unit(1, 0, 0, 0)), (2L, unit(1, 0.05, 0, 0)),
      (3L, unit(0, 0, 1, 0))).toDF("k", "v")
    val fresh = Seq(
      (10L, unit(1, 0.02, 0, 0)), (11L, unit(0, 0.02, 1, 0))).toDF("k", "v")
    val exact = SimilarityJoin.exact(fresh, pool, "k", "v", 0.05)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = SimilarityJoin.lsh(fresh, pool, "k", "v", 0.05, numHashTables = 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("lsh recall floor at the clusterer's defaults (eps=0.10, 4 tables) " +
    "on a 20k pool with near-boundary planted pairs (VERDICT r10 #5)") {
    // scaled-down replica of LshRecallProbe (PERF.md carries the 100k
    // curve: tables 1/2/4 → recall 0.934/0.993/1.000): perturbed pool
    // copies at cosine distance ≈ {0.02, 0.05, 0.08, 0.095} — including
    // the band edge where LSH recall actually degrades. Deterministic:
    // HashEmbed vectors + the lsh model's fixed seed.
    import graft.functions.HashEmbed
    import org.apache.spark.sql.Column
    val poolN = 20000L
    val eps = 0.10
    val pool = spark.range(1, poolN + 1).select(
      col("id").as("k"),
      HashEmbed.embedColumn(concat(lit("pooldoc "), col("id").cast("string")))
        .as("v"))
    def mixed(v: Column, w: Column, alpha: Column): Column = {
      val mix = zip_with(v, w, (a, b) => a + alpha.cast("float") * b)
      val norm = sqrt(aggregate(mix, lit(0.0d),
        (s, x) => s + x.cast("double") * x.cast("double")))
      transform(mix, x => (x.cast("double") / norm).cast("float"))
    }
    def alphaFor(d: Double): Double =
      math.sqrt(1.0 / math.pow(1.0 - d, 2) - 1.0)
    val alphaCol = element_at(
      array(Seq(0.02, 0.05, 0.08, 0.095).map(d => lit(alphaFor(d))): _*),
      (col("id") % 4 + 1).cast("int"))
    val target = (col("id") * 97L) % poolN + 1L
    val batch = spark.range(0, 400).select(
      (col("id") + 10000000L).as("k"),
      mixed(
        HashEmbed.embedColumn(concat(lit("pooldoc "), target.cast("string"))),
        HashEmbed.embedColumn(concat(lit("noise "), col("id").cast("string"))),
        alphaCol).as("v"))
    val truth = SimilarityJoin.bandExact(batch, pool, "k", "v", eps)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(truth.size >= 400, s"planted pairs missing: ${truth.size}")
    val got = SimilarityJoin.lsh(batch, pool, "k", "v", eps, numHashTables = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(truth), "lsh emitted a pair the exact join rejects")
    val recall = got.size.toDouble / truth.size
    info(f"lsh recall at 4 tables on 20k pool: $recall%.4f (${got.size}/${truth.size})")
    assert(recall >= 0.98, f"recall $recall%.4f below the 0.98 floor")
  }
}
