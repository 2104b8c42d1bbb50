package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.AsOf

/** The custom physical as-of operator: rewrite fires, plan shape is the
  * declared one (one exchange + sort per side, the exec node present,
  * no Join node left), and the merge semantics match a brute-force
  * oracle under ties, tolerance, nulls, inner/outer, and random data.
  */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def trades(rows: (Long, Long, Long)*): DataFrame = // (id, key, sec)
    rows.toSeq.map { case (i, k, t) => (i, k, ts(t)) }
      .toDF("trade_id", "t_key", "t_ts")

  private def quotes(rows: (Long, Long, Long, Double)*): DataFrame = // (id, key, sec, px)
    rows.toSeq.map { case (i, k, t, p) => (i, k, ts(t), p) }
      .toDF("quote_id", "q_key", "q_ts", "px")

  private def asof(l: DataFrame, r: DataFrame, tolMicros: Long = -1L,
                   outer: Boolean = true): DataFrame =
    AsOf.backward(l, r, l("t_key"), r("q_key"), l("t_ts"), r("q_ts"),
      r("quote_id"), tolMicros, outer)

  test("physical plan: AsOfJoinExec, one exchange+sort per side, no Join") {
    val q = asof(trades((1L, 1L, 10L)), quotes((1L, 1L, 5L, 1.0)))
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), phys)
    assert(!phys.contains("SortMergeJoin") && !phys.contains("BroadcastHashJoin") &&
      !phys.contains("BroadcastNestedLoop"), phys)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(phys).length
    assert(exchanges == 2, s"expected 2 exchanges:\n$phys")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("AsOfJoinNode") && !optimized.contains("asof_match"),
      optimized)
  }

  test("backward match, latest-at-or-before, per key") {
    val l = trades((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 10L), (4L, 3L, 10L))
    val r = quotes((10L, 1L, 5L, 1.0), (11L, 1L, 10L, 2.0), (12L, 1L, 15L, 3.0),
      (13L, 2L, 11L, 4.0))
    val got = asof(l, r).select($"trade_id", $"quote_id", $"px")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Some(11L), Some(2.0)),  // exact-timestamp match is inclusive
      (2L, Some(12L), Some(3.0)),  // latest ≤ 20 is 15
      (3L, None, None),            // key 2's only quote is later
      (4L, None, None)))           // no quotes for key 3
  }

  test("equal-time ties resolve to the greatest tie-break id") {
    val l = trades((1L, 1L, 10L))
    val r = quotes((10L, 1L, 10L, 1.0), (12L, 1L, 10L, 3.0), (11L, 1L, 10L, 2.0))
    val got = asof(l, r).select($"quote_id", $"px").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((12L, 3.0)))
  }

  test("tolerance excludes matches older than the window") {
    val l = trades((1L, 1L, 100L), (2L, 1L, 200L))
    val r = quotes((10L, 1L, 95L, 1.0), (11L, 1L, 150L, 2.0))
    // 10 s tolerance in micros
    val got = asof(l, r, tolMicros = 10L * 1000000L)
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, Some(10L)), (2L, None)))
  }

  test("inner drops unmatched; outer keeps them with null payload") {
    val l = trades((1L, 1L, 10L), (2L, 2L, 10L))
    val r = quotes((10L, 1L, 5L, 1.0))
    assert(asof(l, r, outer = false).count() == 1)
    val outerRows = asof(l, r).select($"trade_id", $"px")
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(outerRows.toSeq == Seq((1L, Some(1.0)), (2L, None)))
  }

  test("null keys and null times never match") {
    val l = Seq((1L, Some(1L), Some(ts(10L))), (2L, None, Some(ts(10L))),
        (3L, Some(1L), None))
      .toDF("trade_id", "t_key", "t_ts")
    val r = Seq((10L, Some(1L), Some(ts(5L)), 1.0), (11L, None, Some(ts(5L)), 9.0),
        (12L, Some(1L), None, 9.0))
      .toDF("quote_id", "q_key", "q_ts", "px")
    val got = asof(l, r).select($"trade_id", $"quote_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, Some(10L)), (2L, None), (3L, None)))
  }

  test("randomized cross-check vs brute force, with ties and skew") {
    val rnd = new scala.util.Random(4242)
    val lRows = (1L to 400L).map(i => (i, rnd.nextInt(8).toLong, rnd.nextInt(50).toLong))
    val rRows = (1L to 300L).map(i =>
      (i, rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, rnd.nextDouble()))
    val got = asof(trades(lRows: _*), quotes(rRows: _*))
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().toMap
    val expected = lRows.map { case (i, k, t) =>
      val cands = rRows.filter(q => q._2 == k && q._3 <= t)
      i -> (if (cands.isEmpty) None
            else Some(cands.maxBy(q => (q._3, q._1))._1))
    }.toMap
    assert(got == expected)
  }

  test("matches TemporalJoins.asofBackward on the same inputs") {
    val rnd = new scala.util.Random(7)
    val l = trades((1L to 200L).map(i =>
      (i, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong)): _*)
    val r = quotes((1L to 150L).map(i =>
      (i, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, rnd.nextDouble())): _*)
    val viaExec = asof(l, r).select($"trade_id", $"quote_id", $"px")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    val viaWindow = graft.operators.TemporalJoins.asofBackward(
        l, r.withColumnRenamed("q_key", "t_key").withColumnRenamed("q_ts", "t_ts"),
        keyCol = "t_key", tsCol = "t_ts",
        leftIdCol = "trade_id", rightIdCol = "quote_id",
        payloadCols = Seq("quote_id", "px"))
      .select($"trade_id", $"asof_quote_id", $"asof_px")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    assert(viaExec == viaWindow)
  }

  private def asofFwd(l: DataFrame, r: DataFrame, tolMicros: Long = -1L,
                      outer: Boolean = true): DataFrame =
    AsOf.forward(l, r, l("t_key"), r("q_key"), l("t_ts"), r("q_ts"),
      r("quote_id"), tolMicros, outer)

  test("forward: earliest at-or-after, greatest tie, tolerance") {
    val l = trades((1L, 1L, 10L), (2L, 1L, 16L), (3L, 2L, 10L))
    val r = quotes((10L, 1L, 10L, 1.0), (12L, 1L, 10L, 3.0), (11L, 1L, 15L, 2.0),
      (13L, 2L, 5L, 9.0))
    val got = asofFwd(l, r).select($"trade_id", $"quote_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Some(12L)), // at-or-after inclusive; tie at t=10 → greatest id
      (2L, None),      // nothing at or after 16 for key 1
      (3L, None)))     // key 2's only quote is earlier
    val tol = asofFwd(l, r, tolMicros = 3L * 1000000L)
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    assert(tol.toSeq == Seq((1L, Some(12L)), (2L, None), (3L, None)))
    val phys = asofFwd(l, r).queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin") && phys.contains("DESC"), phys)
  }

  test("forward randomized cross-check vs brute force and vs TemporalJoins") {
    val rnd = new scala.util.Random(99)
    val lRows = (1L to 300L).map(i => (i, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
    val rRows = (1L to 200L).map(i =>
      (i, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, rnd.nextDouble()))
    val l = trades(lRows: _*)
    val r = quotes(rRows: _*)
    val got = asofFwd(l, r).select($"trade_id", $"quote_id")
      .as[(Long, Option[Long])].collect().toMap
    val expected = lRows.map { case (i, k, t) =>
      val cands = rRows.filter(q => q._2 == k && q._3 >= t)
      i -> (if (cands.isEmpty) None
            else Some(cands.minBy(q => (q._3, -q._1))._1))
    }.toMap
    assert(got == expected)
    val viaWindow = graft.operators.TemporalJoins.asofForward(
        l, r.withColumnRenamed("q_key", "t_key").withColumnRenamed("q_ts", "t_ts"),
        keyCol = "t_key", tsCol = "t_ts",
        leftIdCol = "trade_id", rightIdCol = "quote_id",
        payloadCols = Seq("quote_id"))
      .select($"trade_id", $"asof_quote_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == viaWindow)
  }

  test("downstream same-key aggregate plans no extra exchange") {
    val l = trades((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 10L))
    val r = quotes((10L, 1L, 5L, 1.0))
    val agg = asof(l, r).groupBy($"t_key").agg(count(lit(1)).as("n"))
    val phys = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(phys).length
    assert(exchanges == 2, s"as-of's two side exchanges should be ALL of them:\n$phys")
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (2L, 1L)))
  }
}
