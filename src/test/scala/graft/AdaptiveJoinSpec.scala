package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AdaptiveJoin

/** Pre-flight join-strategy selection: the census-driven ladder picks
  * broadcast / shuffle / salted, a planted-skew corpus FLIPS the
  * choice, and every chosen form returns the identical join result.
  */
class AdaptiveJoinSpec extends SparkSpec {
  import spark.implicits._

  // dim: 500 unique keys, one row each (too big to broadcast under the
  // test budget of 100 rows)
  private def dim(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, s"payload_$i")).toDF("k", "v")

  // uniform facts: every key appears 4 times (all under heavyThreshold)
  private def uniformFacts: DataFrame =
    (1 to 500).flatMap(i => Seq.fill(4)((i.toLong, i * 10)))
      .toDF("k", "x")

  // skewed facts: uniform plus 4000 extra rows on key 7 — the hot key
  // owns ~2/3 of the join output, far above the 1/4 fair share of the
  // 4-partition test session even under light-stratum estimator noise
  private def skewedFacts: DataFrame =
    uniformFacts.unionByName(
      Seq.fill(4000)((7L, 70)).toDF("k", "x"))

  private def counts(df: DataFrame): Map[(Long, Int, String), Long] =
    df.groupBy("k", "x", "v").count().collect()
      .map(r => ((r.getLong(0), r.getInt(1), r.getString(2)), r.getLong(3)))
      .toMap

  test("small dim → Broadcast, and the plan contains a broadcast join") {
    val (out, d) = AdaptiveJoin.join(uniformFacts, dim(50), "k",
      broadcastMaxRows = 100, skewFactor = 1.0, sampleK = 16,
      heavyThreshold = 50)
    assert(d.strategy == AdaptiveJoin.Broadcast)
    assert(d.dimRows == 50)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast in:\n$p")
    assert(counts(out) == counts(uniformFacts.join(dim(50), Seq("k"))))
  }

  test("large dim + uniform facts → Shuffle (no heavy key in the census)") {
    val d = AdaptiveJoin.decide(uniformFacts, "k", dim(500), "k",
      broadcastMaxRows = 100, skewFactor = 1.0, sampleK = 16,
      heavyThreshold = 50)
    assert(d.strategy == AdaptiveJoin.Shuffle)
    assert(d.maxKeyPairs == 0, "no key reaches the heavy census")
    assert(d.dimRows == 500)
  }

  test("large dim + planted hot key FLIPS the strategy to Salted, " +
    "and the salted result is identical to the plain join") {
    val (out, d) = AdaptiveJoin.join(skewedFacts, dim(500), "k",
      broadcastMaxRows = 100, skewFactor = 1.0, sampleK = 16,
      heavyThreshold = 50)
    d.strategy match {
      case AdaptiveJoin.Salted(n) =>
        assert(n >= 2 && n <= 64, s"salts out of band: $n")
      case other => fail(s"expected Salted, got $other " +
        s"(maxKeyPairs=${d.maxKeyPairs}, fairShare=${d.fairShare})")
    }
    assert(d.maxKeyPairs == 4004, "census must count the hot key exactly")
    // the composite (key, salt) join key is visible in the plan
    assert(out.queryExecution.executedPlan.toString.contains("__salt"))
    // oracle: the plain (unsalted) join — same discipline as j10
    assert(counts(out) == counts(skewedFacts.join(dim(500), Seq("k"))))
  }

  test("the estimate drives the fair share: est_pairs tracks the true " +
    "join size on both corpora") {
    val dU = AdaptiveJoin.decide(uniformFacts, "k", dim(500), "k",
      broadcastMaxRows = 100, skewFactor = 1.0, sampleK = 64,
      heavyThreshold = 50)
    val dS = AdaptiveJoin.decide(skewedFacts, "k", dim(500), "k",
      broadcastMaxRows = 100, skewFactor = 1.0, sampleK = 64,
      heavyThreshold = 50)
    assert(math.abs(dU.estPairs - 2000.0) / 2000.0 < 0.5,
      s"uniform est ${dU.estPairs} vs true 2000")
    assert(math.abs(dS.estPairs - 6004.0) / 6004.0 < 0.5,
      s"skewed est ${dS.estPairs} vs true 6004")
    assert(dS.nHeavy == 1, "exactly the hot key is heavy")
  }
}
