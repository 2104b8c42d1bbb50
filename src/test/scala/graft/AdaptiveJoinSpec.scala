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

  test("pipeline wiring (VERDICT r11 #6): a planted hot template in the " +
    "d18 incremental-dedup path flips the verify join to Salted, and the " +
    "adaptive result equals the plain crossPairs result") {
    import graft.operators.JaccardJoin
    // ref corpus: 200 near-identical copies of one template (the hot
    // pile a scraped corpus really contains) + 50 distinct docs
    val template = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val ref = ((1 to 200).map(i => (i.toLong, s"$template tail$i")) ++
      (1001 to 1050).map(i => (i.toLong, s"unique text number $i with words " +
        s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g")))
      .toDF("doc_id", "text")
    // delta: ONE probe doc matching the template → its candidate set is
    // all 200 copies, all hashing to one verify reducer unsalted
    val probe = Seq((9001L, s"$template tail0")).toDF("doc_id", "text")
    val (out, decisions) = JaccardJoin.crossPairsAdaptive(
      probe, ref, "doc_id", "text", t = 0.5,
      broadcastMaxRows = 0, skewFactor = 1.0, heavyThreshold = 10)
    decisions.head.strategy match {
      case AdaptiveJoin.Salted(n) => assert(n >= 2)
      case other => fail(s"a-side verify must salt the hot probe doc, " +
        s"got $other (maxKeyPairs=${decisions.head.maxKeyPairs}, " +
        s"fairShare=${decisions.head.fairShare})")
    }
    // b side: every ref doc appears once per candidate — uniform, so the
    // census must NOT salt it
    assert(decisions(1).strategy == AdaptiveJoin.Shuffle,
      s"b-side should stay a plain shuffle, got ${decisions(1)}")
    def rows(df: DataFrame) = df.select("a", "b", "common", "sza", "szb")
      .collect().map(_.toSeq).toSet
    val plain = JaccardJoin.crossPairs(probe, ref, "doc_id", "text",
      t = 0.5, verify = JaccardJoin.ShuffleDocs)
    assert(rows(out) == rows(plain),
      "adaptive verify must be physically-only: identical pairs")
    assert(rows(out).size >= 200, "the hot template's pairs must all verify")
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
