package graft

import org.apache.spark.sql.functions._

import graft.operators.SimHashJoin

class SimHashJoinSpec extends SparkSpec {
  import spark.implicits._

  private def sigsDf(rows: (Long, Long)*) = rows.toDF("id", "sig")

  test("pigeonhole banding is lossless: banded == all-pairs on random signatures") {
    val rnd = new scala.util.Random(20260812L)
    // clustered signatures: seeds plus noisy copies within/outside radius
    val seeds = Array.fill(20)(rnd.nextLong() & 0xffffffffL)
    val rows = (0 until 400).map { i =>
      val s = seeds(rnd.nextInt(seeds.length))
      val flips = rnd.nextInt(10) // 0..9 bit flips: some in, some out of <=6
      val sig = (0 until flips).foldLeft(s)((acc, _) => acc ^ (1L << rnd.nextInt(32)))
      (i.toLong, sig)
    }
    val df = sigsDf(rows: _*)
    def collect(st: SimHashJoin.Strategy) =
      SimHashJoin.selfPairs(df, "id", "sig", maxHamming = 6, bits = 32, strategy = st)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue)).toSet
    val ap = collect(SimHashJoin.AllPairs)
    val hb = collect(SimHashJoin.HammingBand)
    assert(ap == hb, s"missing=${ap -- hb} extra=${hb -- ap}")
    assert(ap.nonEmpty && ap.exists(_._3 > 0)) // non-vacuous incl. nonzero distances
  }

  test("band candidates verify: pairs just over the radius are rejected") {
    // ids 1,2 at hamming 7 (over); 1,3 at hamming 6 (in)
    val base = 0x5a5a5a5aL
    val over = base ^ 0x7fL          // 7 low bits flipped
    val in6 = base ^ 0x3fL           // 6 low bits flipped
    val out = SimHashJoin.selfPairs(
      sigsDf(1L -> base, 2L -> over, 3L -> in6), "id", "sig", 6,
      strategy = SimHashJoin.HammingBand)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 3L)) && !out.contains((1L, 2L)))
  }

  test("Auto gate: small input takes the all-pairs plan, large the banded plan") {
    val df = sigsDf((0L until 50L).map(i => (i, i)): _*)
    val small = SimHashJoin.selfPairs(df, "id", "sig", 6,
      strategy = SimHashJoin.Auto(threshold = 100))
    assert(!small.queryExecution.executedPlan.toString.contains("__bk"))
    val large = SimHashJoin.selfPairs(df, "id", "sig", 6,
      strategy = SimHashJoin.Auto(threshold = 10))
    assert(large.queryExecution.executedPlan.toString.contains("__bk"))
  }

  test("maxHamming=0 at bits=64 is served by a signature equi-join " +
    "(the band mask would wrap at 1L<<64)") {
    val df = sigsDf(1L -> Long.MinValue, 2L -> Long.MinValue, 3L -> 7L, 4L -> 7L, 5L -> 8L)
    val out = SimHashJoin.selfPairs(df, "id", "sig", maxHamming = 0, bits = 64,
      strategy = SimHashJoin.HammingBand)
    assert(out.select("a", "b").as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (3L, 4L)))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("__bk") && !p.contains("BroadcastNestedLoopJoin"),
      s"expected a plain signature equi-join:\n$p")
  }

  test("banded join is an equi-join on the band key — no cartesian operator") {
    val df = sigsDf((0L until 100L).map(i => (i, i * 7L & 0xffffffffL)): _*)
    val p = SimHashJoin.selfPairs(df, "id", "sig", 6,
      strategy = SimHashJoin.HammingBand).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"banded plan fell back to a cartesian operator:\n$p")
  }
}
