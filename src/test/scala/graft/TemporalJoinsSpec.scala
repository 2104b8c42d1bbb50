package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def trades = Seq(
    (10L, 1L, ts("2024-01-01 10:00:05")),
    (11L, 1L, ts("2024-01-01 10:00:30")),
    (12L, 2L, ts("2024-01-01 10:00:10")),
    (13L, 3L, ts("2024-01-01 09:00:00"))).toDF("trade_id", "sym", "ts")

  private def quotes = Seq(
    (100L, 1L, ts("2024-01-01 10:00:00"), 5.0),
    (101L, 1L, ts("2024-01-01 10:00:20"), 6.0),
    (102L, 2L, ts("2024-01-01 10:00:10"), 7.0), // same instant as trade 12
    (103L, 3L, ts("2024-01-01 12:00:00"), 8.0)).toDF("quote_id", "sym", "ts", "px")

  private def asof = TemporalJoins.asofBackward(trades, quotes,
    keyCol = "sym", tsCol = "ts", leftIdCol = "trade_id", rightIdCol = "quote_id",
    payloadCols = Seq("quote_id", "px"))
    .select(col("trade_id"), col("asof_quote_id"), col("asof_px"))
    .as[(Long, Option[Long], Option[Double])].collect()
    .map { case (k, a, b) => k -> ((a, b)) }.toMap

  test("asofBackward picks the latest right row at or before each left ts") {
    assert(asof(10L) == ((Some(100L), Some(5.0))))
    assert(asof(11L) == ((Some(101L), Some(6.0))))
  }

  test("asofBackward is inclusive: a right row at the exact left ts matches") {
    assert(asof(12L) == ((Some(102L), Some(7.0))))
  }

  test("asofBackward keeps unmatched left rows with null payloads") {
    assert(asof(13L) == ((None, None)))
  }

  test("asofBackward ties at equal right ts resolve to the highest right id") {
    val q2 = quotes.unionByName(
      Seq((999L, 1L, ts("2024-01-01 10:00:00"), 9.0)).toDF("quote_id", "sym", "ts", "px"))
    val got = TemporalJoins.asofBackward(trades.filter(col("trade_id") === 10),
      q2, "sym", "ts", "trade_id", "quote_id", Seq("quote_id"))
      .select(col("asof_quote_id")).as[Long].head()
    assert(got == 999L)
  }

  test("a latest right row with NULL payload fields is attached as-is, " +
    "not skipped for an older non-null row (row-consistent asof)") {
    // quote 105 is the latest before trade 10 but carries a null px; the
    // asof must attach (105, null) — per-column last(ignoreNulls) would
    // have mixed quote_id=105 with px=5.0 from quote 100
    val q2 = quotes.unionByName(
      Seq((105L, 1L, ts("2024-01-01 10:00:03"), Option.empty[Double]))
        .toDF("quote_id", "sym", "ts", "px"))
    val got = TemporalJoins.asofBackward(
      trades.filter(col("trade_id") === 10), q2,
      "sym", "ts", "trade_id", "quote_id", Seq("quote_id", "px"))
      .select(col("asof_quote_id"), col("asof_px"))
      .as[(Option[Long], Option[Double])].head()
    assert(got == ((Some(105L), None)))
  }

  test("asofBackward agrees with the naive range-join plan on random data") {
    val n = 400
    val left = spark.range(n).select(col("id").as("lid"), (col("id") % 7).as("k"),
      timestamp_micros(pmod(col("id") * 7919, lit(100000)) * 1000000).as("ts"))
    val right = spark.range(n).select(col("id").as("rid"), (col("id") % 7).as("k"),
      timestamp_micros(pmod(col("id") * 104729, lit(100000)) * 1000000).as("ts"),
      (col("id") * 2).as("pay"))
    val fast = TemporalJoins.asofBackward(left, right, "k", "ts", "lid", "rid", Seq("pay"))
      .select(col("lid"), col("asof_pay")).as[(Long, Option[Long])].collect().toMap
    // oracle: per left row, the right row maximizing (ts, rid) under ts ≤ left.ts
    val naive = left.as("l").join(right.as("r"),
      col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.lid"))
      .agg(max_by(col("r.pay"), struct(col("r.ts"), col("r.rid"))).as("pay"))
      .select(col("lid"), col("pay")).as[(Long, Option[Long])].collect().toMap
    assert(fast == naive)
  }

  test("asofForward picks the earliest right at/after each left ts; " +
    "inclusive boundary, max-id tie, null when nothing follows") {
    val q2 = Seq(
      (100L, 1L, ts("2024-01-01 10:00:05"), 5.0), // same instant as trade 10
      (104L, 1L, ts("2024-01-01 10:00:05"), 5.5), // tie at that instant
      (101L, 1L, ts("2024-01-01 10:00:20"), 6.0),
      (103L, 3L, ts("2024-01-01 12:00:00"), 8.0)).toDF("quote_id", "sym", "ts", "px")
    val out = TemporalJoins.asofForward(trades, q2,
      keyCol = "sym", tsCol = "ts", leftIdCol = "trade_id", rightIdCol = "quote_id",
      payloadCols = Seq("quote_id", "px"))
      .select(col("trade_id"), col("asof_quote_id"), col("asof_px"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(10L) == ((Some(104L), Some(5.5)))) // equal-ts inclusive, max id wins
    assert(out(11L) == ((None, None)))            // nothing follows 10:00:30 for sym 1
    assert(out(12L) == ((None, None)))            // sym 2 has no quotes at all
    assert(out(13L) == ((Some(103L), Some(8.0)))) // next quote hours later
  }

  test("asofForward agrees with the naive range-join plan on random data") {
    val n = 400
    val left = spark.range(n).select(col("id").as("lid"), (col("id") % 7).as("k"),
      timestamp_micros(pmod(col("id") * 7919, lit(100000)) * 1000000).as("ts"))
    val right = spark.range(n).select(col("id").as("rid"), (col("id") % 7).as("k"),
      timestamp_micros(pmod(col("id") * 104729, lit(100000)) * 1000000).as("ts"),
      (col("id") * 2).as("pay"))
    val fast = TemporalJoins.asofForward(left, right, "k", "ts", "lid", "rid", Seq("pay"))
      .select(col("lid"), col("asof_pay")).as[(Long, Option[Long])].collect().toMap
    // oracle: per left row, the right row minimizing ts (then max rid)
    // under ts ≥ left.ts — min_by on (ts asc, rid desc) via negated rid
    val naive = left.as("l").join(right.as("r"),
      col("l.k") === col("r.k") && col("r.ts") >= col("l.ts"), "left")
      .groupBy(col("l.lid"))
      .agg(min_by(col("r.pay"), struct(col("r.ts"), -col("r.rid"))).as("pay"))
      .select(col("lid"), col("pay")).as[(Long, Option[Long])].collect().toMap
    assert(fast == naive)
  }

  test("intervalJoin matches the naive inequality join, end-exclusive") {
    val iv = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      (2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:06:00"))).toDF("iid", "s", "e")
    val pts = Seq(
      (20L, ts("2024-01-01 10:00:00")), // at start of 1 → in
      (21L, ts("2024-01-01 10:05:30")), // inside both
      (22L, ts("2024-01-01 10:10:00")), // at end of 1 → out (exclusive)
      (23L, ts("2024-01-01 11:00:00"))).toDF("pid", "ts")
    val got = TemporalJoins.intervalJoin(iv, pts, "s", "e", "ts", slotWidthSec = 600L)
      .select(col("iid"), col("pid")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 20L), (1L, 21L), (2L, 21L)))
  }

  test("intervalJoin handles intervals longer than the slot width") {
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00"))).toDF("iid", "s", "e")
    val pts = Seq(
      (20L, ts("2024-01-01 00:30:00")),
      (21L, ts("2024-01-01 02:59:59")),
      (22L, ts("2024-01-01 03:00:01"))).toDF("pid", "ts")
    val got = TemporalJoins.intervalJoin(iv, pts, "s", "e", "ts", slotWidthSec = 600L)
      .select(col("pid")).as[Long].collect().toSet
    assert(got == Set(20L, 21L))
  }

  test("intervalJoin plans as an equi-join on the slot, not a nested loop") {
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"))).toDF("iid", "s", "e")
    val pts = Seq((20L, ts("2024-01-01 00:05:00"))).toDF("pid", "ts")
    val plan = TemporalJoins.intervalJoin(iv, pts, "s", "e", "ts", 600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
