package graft

import org.apache.spark.sql.functions._

import graft.functions.ZInterleaveExpr

/** Z-order interleave: bit-exactness vs a naive reference, the tile
  * extent bound that makes z-layout prune-able, codegen participation,
  * and the loud-failure contract on negative input.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Naive bit-by-bit reference interleave. */
  private def refInterleave(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("matches the naive reference on deterministic pseudo-random inputs") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.tabulate(200)(_ =>
      (rnd.nextLong().abs & 0xFFFFFFFFL, rnd.nextLong().abs & 0xFFFFFFFFL))
    val got = pairs.toDF("a", "b")
      .select(ZInterleaveExpr(col("a"), col("b")).as("z"))
      .as[Long].collect()
    pairs.zip(got).foreach { case ((a, b), z) =>
      assert(z == refInterleave(a, b), s"($a, $b)")
    }
  }

  test("z div 2^(2k) tiles bound BOTH dimensions by 2^k") {
    // full 128x128 grid, k=5 tiles (z div 1024 => 32x32): every tile's
    // extent must stay within 32 in each dimension — the property that
    // turns per-file min/max stats into two-dimensional pruning
    val grid = for (x <- 0 until 128; y <- 0 until 128) yield (x.toLong, y.toLong)
    val tiles = grid.toDF("x", "y")
      .withColumn("z", ZInterleaveExpr(col("x"), col("y")))
      .withColumn("tile", expr("z div 1024"))
      .groupBy("tile")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(tiles.length == 16, "128x128 at 32x32 tiles = 16 tiles")
    tiles.foreach { case (t, x0, x1, y0, y1, n) =>
      assert(x1 - x0 < 32 && y1 - y0 < 32, s"tile $t extent too wide")
      assert(n == 1024, s"tile $t must hold exactly 32*32 points")
    }
  }

  test("round-trips: even/odd bit extraction recovers both inputs") {
    val rnd = new scala.util.Random(7)
    (0 until 100).foreach { _ =>
      val a = rnd.nextLong().abs & 0xFFFFFFFFL
      val b = rnd.nextLong().abs & 0xFFFFFFFFL
      val z = ZInterleaveExpr.interleave(a, b)
      def compact(v: Long): Long = {
        var x = v & 0x5555555555555555L
        x = (x | (x >> 1)) & 0x3333333333333333L
        x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
        x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
        x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
        x = (x | (x >> 16)) & 0xFFFFFFFFL
        x
      }
      assert(compact(z) == a && compact(z >> 1) == b)
    }
  }

  test("stays inside whole-stage codegen") {
    // spark.range (not a local Seq): ConvertToLocalRelation would fold
    // a literal-backed project away before any codegen happens
    val df = spark.range(16)
      .select(ZInterleaveExpr(col("id"), col("id") + 1).as("z"))
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("[codegen id :"), s"no codegen span:\n$p")
  }

  test("negative input fails loudly") {
    val ex = intercept[Exception] {
      Seq((-1L, 5L)).toDF("a", "b")
        .select(ZInterleaveExpr(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("input above 2^32 - 1 fails loudly instead of silently " +
    "truncating to the low 32 bits (ADVICE r10)") {
    // 2^32 and 0 share low-32 bits — silent truncation would z-collide
    // them and scramble the curve for large keys; both eval paths
    // (interpreted + codegen route through the same static method)
    val ex = intercept[Exception] {
      Seq((0x100000000L, 5L)).toDF("a", "b")
        .select(ZInterleaveExpr(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("4294967295") ||
      ex.getCause != null && ex.getCause.getMessage.contains("4294967295"))
    // the boundary itself is in-domain
    assert(ZInterleaveExpr.interleave(ZInterleaveExpr.MaxInput, 0L) ==
      ZInterleaveExpr.spread(ZInterleaveExpr.MaxInput))
  }

  test("SQL mask chain mirrors the JVM implementation") {
    // the oracle-side string builder must express the identical masks:
    // evaluate it through Spark SQL and compare against the expression
    val sql = ZInterleaveExpr.interleaveSql("a", "b")
    val df = Seq((1234567L, 89012345L)).toDF("a", "b")
    val viaSql = df.selectExpr(s"$sql AS z").as[Long].head()
    val viaExpr = df.select(ZInterleaveExpr(col("a"), col("b"))).as[Long].head()
    assert(viaSql == viaExpr)
  }
}
