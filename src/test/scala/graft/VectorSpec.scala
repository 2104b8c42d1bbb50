package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashEmbed, VectorFns, VectorMean}

class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("FloatVectorDot computes the double dot product (codegen path)") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .select(VectorFns.dotProduct(col("a"), col("b")).as("d"))
    assert(df.head().getDouble(0) == 32.0)
  }

  test("norm / l2Normalize / cosineDistance behave on non-unit vectors") {
    val df = Seq((Array(3f, 4f), Array(4f, 3f))).toDF("a", "b").select(
      VectorFns.norm(col("a")).as("n"),
      VectorFns.cosineDistance(col("a"), col("b")).as("d"),
      VectorFns.l2Normalize(col("a")).as("u"))
    val r = df.head()
    assert(r.getDouble(0) == 5.0)
    assert(math.abs(r.getDouble(1) - (1.0 - 24.0 / 25.0)) < 1e-9)
    val u = r.getSeq[Float](2)
    assert(math.abs(u(0) - 0.6f) < 1e-6 && math.abs(u(1) - 0.8f) < 1e-6)
  }

  test("unitCosineDistance clips to [0,1] (reference clip, clustering.py:62-66)") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),    // dist 0
      (Array(1f, 0f), Array(-1f, 0f))    // raw 2.0 → clipped 1.0
    ).toDF("a", "b")
      .select(VectorFns.unitCosineDistance(col("a"), col("b")).as("d"))
    val ds = df.collect().map(_.getDouble(0))
    assert(ds(0) == 0.0 && ds(1) == 1.0)
  }

  test("VectorMean aggregates element-wise mean, ignores nulls") {
    val df = Seq(
      ("g", Array(1f, 3f)),
      ("g", Array(3f, 5f)),
      ("g", null.asInstanceOf[Array[Float]])).toDF("k", "v")
      .groupBy("k").agg(VectorMean(col("v")).as("m"))
    val m = df.head().getSeq[Float](1)
    assert(m == Seq(2f, 4f))
  }

  test("SortedTermDot merges two sorted sparse vectors (skips, dups-free)") {
    val df = Seq((
      Array("alpha", "beta", "delta"), Array(1.0, 2.0, 3.0),
      Array("beta", "delta", "gamma"), Array(10.0, 100.0, 99.0)
    )).toDF("ka", "va", "kb", "vb")
      .select(VectorFns.sortedTermDot(
        col("ka"), col("va"), col("kb"), col("vb")).as("d"))
    // beta: 2*10 + delta: 3*100; gamma unmatched
    assert(df.head().getDouble(0) == 320.0)
  }

  test("SortedTermDot: empty and disjoint inputs give 0") {
    val df = Seq(
      (Array.empty[String], Array.empty[Double], Array("x"), Array(5.0)),
      (Array("a"), Array(1.0), Array("b"), Array(2.0))
    ).toDF("ka", "va", "kb", "vb")
      .select(VectorFns.sortedTermDot(
        col("ka"), col("va"), col("kb"), col("vb")).as("d"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 0.0))
  }

  test("SortedIntersectCount counts common elements of sorted arrays") {
    val df = Seq(
      (Array("a", "b", "d", "f"), Array("b", "c", "d", "e", "f")),
      (Array.empty[String], Array("x")),
      (Array("q"), Array("q"))
    ).toDF("x", "y")
      .select(VectorFns.sortedIntersectCount(col("x"), col("y")).as("c"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(3L, 0L, 1L))
  }

  test("HashEmbed: deterministic, unit-norm, vocabulary-sensitive") {
    val a = HashEmbed.embed("spark cluster news article", 64)
    val b = HashEmbed.embed("spark cluster news article", 64)
    val c = HashEmbed.embed("completely different words entirely", 64)
    assert(a.toSeq == b.toSeq)
    val n = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-6)
    def dot(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    assert(dot(a, c) < 0.5) // disjoint vocab → far apart
  }
}
