package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

class EpsilonJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: (Long, Array[Float])*): DataFrame =
    ids.toSeq.toDF("vid", "vec")

  private def fixture: (DataFrame, DataFrame) = {
    val a = vecs(
      1L -> unit(1, 0, 0), 2L -> unit(0.99, 0.14, 0), 3L -> unit(0, 1, 0))
    val b = vecs(
      10L -> unit(1, 0.05, 0), 11L -> unit(0, 0.98, 0.2), 12L -> unit(0, 0, 1))
    (a, b)
  }

  private def crossQuery(a: DataFrame, b: DataFrame, eps: Double): DataFrame =
    a.crossJoin(b.select(col("vid").as("wid"), col("vec").as("w")))
      .filter(VectorFns.unitCosineDistance(col("vec"), col("w")) <= eps)
      .select(col("vid"), col("wid"))

  test("rewrites crossJoin + cosine filter into a band equi-join") {
    val (a, b) = fixture
    val q = crossQuery(a, b, 0.10)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("__graft_band"),
      s"expected band rewrite in:\n$optimized")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      s"expected no cartesian operator in:\n$physical")
  }

  test("rewritten results are identical to the cartesian plan") {
    val (a, b) = fixture
    val eps = 0.15
    val rewritten = crossQuery(a, b, eps).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = {
      spark.conf.set(graft.plans.EpsilonJoinRewrite.ConfKey, "false")
      try crossQuery(a, b, eps).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.unset(graft.plans.EpsilonJoinRewrite.ConfKey)
    }
    assert(rewritten == expected)
    assert(expected.nonEmpty) // non-vacuous: some pairs qualify
    assert(expected != Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (2L, 12L), (3L, 10L), (3L, 11L), (3L, 12L))) // ... and some don't
  }

  test("property: rewrite agrees with the cartesian plan on random vectors") {
    val rnd = new scala.util.Random(20260812L)
    def randUnit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    for (trial <- 0 until 5) {
      val dim = 8 + rnd.nextInt(24)
      val eps = 0.05 + rnd.nextDouble() * 0.9
      val a = vecs((0 until 30).map(i => (i.toLong, randUnit(dim))): _*)
      val b = vecs((0 until 30).map(i => (100L + i, randUnit(dim))): _*)
      val q = crossQuery(a, b, eps)
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_band"),
        s"trial $trial (eps=$eps): rewrite did not fire")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = {
        spark.conf.set(graft.plans.EpsilonJoinRewrite.ConfKey, "false")
        try crossQuery(a, b, eps).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        finally spark.conf.unset(graft.plans.EpsilonJoinRewrite.ConfKey)
      }
      assert(got == want, s"trial $trial (eps=$eps, dim=$dim): " +
        s"missing=${want -- got} extra=${got -- want}")
    }
  }

  private def roundedQuery(a: DataFrame, b: DataFrame, eps: Double, k: Int): DataFrame =
    a.crossJoin(b.select(col("vid").as("wid"), col("vec").as("w")))
      .withColumn("dist", round(VectorFns.unitCosineDistance(col("vec"), col("w")), k))
      .filter(col("dist") <= eps)
      .select(col("vid"), col("wid"), col("dist"))

  test("round(dist,k) <= eps fires the rewrite with the half-ulp widened bound") {
    val (a, b) = fixture
    val q = roundedQuery(a, b, 0.15, 4)
    assert(q.queryExecution.optimizedPlan.toString.contains("__graft_band"),
      s"round() wrapper blinded the rewrite:\n${q.queryExecution.optimizedPlan}")
    assert(!q.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = {
      spark.conf.set(graft.plans.EpsilonJoinRewrite.ConfKey, "false")
      try roundedQuery(a, b, 0.15, 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      finally spark.conf.unset(graft.plans.EpsilonJoinRewrite.ConfKey)
    }
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("round boundary: a distance that rounds DOWN onto eps is kept by the widened band") {
    // band bound must be eps + 0.5*10^-k, not eps: craft a pair whose true
    // distance is just above eps but rounds to exactly eps at k=2
    val theta = math.acos(1.0 - 0.154) // dist 0.154 → round(.,2) = 0.15
    val a = vecs(1L -> unit(1, 0, 0))
    val b = vecs(10L -> unit(math.cos(theta), math.sin(theta), 0))
    val q = roundedQuery(a, b, 0.15, 2)
    assert(q.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
  }

  test("no rewrite for eps > 1 or when disabled") {
    val (a, b) = fixture
    val wide = crossQuery(a, b, 1.5).queryExecution.optimizedPlan.toString
    assert(!wide.contains("__graft_band"))
    spark.conf.set(graft.plans.EpsilonJoinRewrite.ConfKey, "false")
    try {
      val off = crossQuery(a, b, 0.10).queryExecution.optimizedPlan.toString
      assert(!off.contains("__graft_band"))
    } finally spark.conf.unset(graft.plans.EpsilonJoinRewrite.ConfKey)
  }

  test("degenerate vectors (shorter than the pivot count) stay correct") {
    // dim-1 vectors: band expressions see out-of-bounds pivots — must
    // neither throw under ANSI nor emit duplicate pairs
    val a = vecs(1L -> Array(1f), 2L -> Array(-1f))
    val b = vecs(10L -> Array(1f), 11L -> Array(-1f))
    val q = crossQuery(a, b, 0.5)
    assert(q.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    val rows = q.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length, s"duplicate pairs: ${rows.toSeq}")
    assert(rows.toSet == Set((1L, 10L), (2L, 11L)))
  }

  test("MIXED-dimension pairs match the cartesian plan (zero-padded axis bands)") {
    // float_vector_dot runs over min(length) — zero-padding semantics —
    // so a 1-dim vector can sit within eps of a 4-dim one. The band for
    // the missing axis must be acos(0), NOT an acos(-1) clamp of the
    // null (greatest() skips nulls): the clamp banded short-vs-long
    // pairs >1 apart and silently dropped them (regression).
    val a = vecs(1L -> Array(1f)) // 1-dim
    val b = vecs(10L -> unit(1, 0.05, 0, 0), 11L -> unit(0, 1, 0, 0)) // 4-dim
    val eps = 0.05
    val got = crossQuery(a, b, eps)
    assert(got.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    val want = {
      spark.conf.set(graft.plans.EpsilonJoinRewrite.ConfKey, "false")
      try crossQuery(a, b, eps).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.unset(graft.plans.EpsilonJoinRewrite.ConfKey)
    }
    assert(want == Set((1L, 10L))) // the qualifying mixed-dim pair exists
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want)
  }

  test("an explicit broadcast hint opts out of the rewrite") {
    val (a, b) = fixture
    val q = broadcast(a)
      .crossJoin(b.select(col("vid").as("wid"), col("vec").as("w")))
      .filter(VectorFns.unitCosineDistance(col("vec"), col("w")) <= 0.1)
    assert(!q.queryExecution.optimizedPlan.toString.contains("__graft_band"))
  }

  test("equi-join conditions and other predicates are left untouched") {
    val (a, b) = fixture
    val q = a.join(b.select(col("vid").as("wid"), col("vec").as("w")),
        col("vid") === col("wid"))
      .filter(VectorFns.unitCosineDistance(col("vec"), col("w")) <= 0.1)
    assert(!q.queryExecution.optimizedPlan.toString.contains("__graft_band"))
  }
}
