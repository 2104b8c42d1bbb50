package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinSizeEstimate

/** Join-size pre-flight: exactness on the small-universe branch,
  * accuracy on uniform keys, the hot-key explosion catch (the heavy
  * stratum's reason to exist), the empty-side contract, and
  * partitioning independence.
  */
class JoinSizeEstimateSpec extends SparkSpec {
  import spark.implicits._

  private def est(a: Seq[Long], b: Seq[Long], k: Int,
                  t: Long = 1000L): (Long, Long, Double) = {
    val r = JoinSizeEstimate.estimate(
      a.toDF("ka"), "ka", b.toDF("kb"), "kb", k, t)
      .select(col("k_used"), col("n_heavy"), col("est_pairs"))
      .head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  private def trueSize(a: Seq[Long], b: Seq[Long]): Long = {
    val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    a.map(x => cb.getOrElse(x, 0L)).sum
  }

  test("small-universe branch is EXACT (sample = universe)") {
    val a = Seq(1L, 1L, 2L, 3L, 3L, 3L)
    val b = Seq(1L, 2L, 2L, 4L)
    val (kUsed, nHeavy, e) = est(a, b, k = 64)
    assert(kUsed == 4 && nHeavy == 0) // union universe {1,2,3,4}, no heavy
    assert(e == trueSize(a, b).toDouble, s"got $e")
  }

  test("empty side estimates zero pairs, not a zero-divide") {
    val (kUsed, nHeavy, e) = est(Seq(1L, 2L), Seq.empty[Long], k = 8)
    assert(kUsed == 2 && nHeavy == 0)
    assert(e == 0.0, s"empty side must estimate 0 matches, got $e")
  }

  test("uniform keys: estimate within 3/sqrt(k) of truth") {
    val a = (0 until 20000).map(i => (i % 2000).toLong)  // 10 each
    val b = (0 until 6000).map(i => (i % 2000).toLong)   // 3 each
    val t = trueSize(a, b).toDouble                       // 2000*30 = 60000
    val (_, nHeavy, e) = est(a, b, k = 256)
    assert(nHeavy == 0)
    val rel = math.abs(e - t) / t
    assert(rel < 3.0 / math.sqrt(256), f"uniform rel error $rel%.3f")
  }

  test("skewed keys: the hot key's quadratic blowup is caught exactly " +
    "by the heavy stratum") {
    // one key carries 1000 x 1000 pairs, the rest are 1:1 - a join
    // that looks tiny by distinct counts but explodes in output; a
    // pure uniform bottom-k sample misses the hot key with
    // probability 1 - k/U and estimated ~1e3 here before the heavy
    // stratum existed
    val a = Seq.fill(1000)(7L) ++ (100L until 1100L)
    val b = Seq.fill(1000)(7L) ++ (100L until 1100L)
    val t = trueSize(a, b).toDouble // 1,000,000 + 1,000
    val (_, nHeavy, e) = est(a, b, k = 256, t = 1000L)
    assert(nHeavy == 1, "the hot key must enter the heavy stratum")
    assert(e >= 1000000.0, s"heavy pairs must be counted exactly, got $e")
    assert(math.abs(e - t) / t < 0.25, s"skew estimate $e vs $t")
  }

  test("estimate is partitioning-independent") {
    val a = (0 until 5000).map(i => (i % 500).toLong)
    val b = (0 until 1500).map(i => (i % 500).toLong)
    def run(parts: Int): Double =
      JoinSizeEstimate.estimate(
        a.toDF("ka").repartition(parts), "ka",
        b.toDF("kb").repartition(parts), "kb", 128)
        .select(col("est_pairs")).head().getDouble(0)
    assert(run(1) == run(7))
  }
}
