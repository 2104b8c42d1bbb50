package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{Ev, FunnelOut}

/** Streaming funnel with event-time timeout: conversion, watermark-
  * decided abandonment at each step, attempt restart, out-of-order
  * arrival within the horizon, state eviction, and agreement with a
  * sequential reference under every batch split of the same events.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L
  private val T = 1800L // 30-minute per-step timeout

  /** Sequential reference: the exact machine from the operator's
    * doc comment, folded over all events in (ts, event_id) order with
    * an unbounded final watermark (every pending attempt times out).
    */
  private def reference(evs: Seq[Ev]): Set[FunnelOut] = {
    val tUs = T * 1000000L
    val out = Set.newBuilder[FunnelOut]
    evs.groupBy(_.user_id).foreach { case (u, es) =>
      var (st, vUs, cUs, att) = (0, 0L, 0L, 0L)
      def deadline = if (st == 1) vUs + tUs else cUs + tUs
      def abandonIfPast(now: Long): Unit =
        if (st > 0 && now > deadline) {
          out += FunnelOut(u, att, "abandoned", st, vUs, deadline)
          st = 0
        }
      es.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val t = e.ts.getTime * 1000L
        abandonIfPast(t)
        (st, e.event_type) match {
          case (0, "view") => att += 1; st = 1; vUs = t
          case (1, "click") if t > vUs => st = 2; cUs = t
          case (2, "purchase") if t > cUs =>
            out += FunnelOut(u, att, "converted", 3, vUs, t); st = 0
          case _ => ()
        }
      }
      abandonIfPast(Long.MaxValue)
    }
    out.result()
  }

  /** Run the stream over `batches` (one addData per batch) and return
    * everything emitted. The 4-hour watermark delay keeps every
    * cross-batch out-of-order delivery inside the lateness horizon
    * (the engine drops sub-watermark rows BEFORE the state function —
    * the delay is the operator's reordering budget); the fixture's
    * far-future pusher still drives the final watermark past every
    * deadline.
    */
  private def run(batches: Seq[Seq[Ev]], name: String,
                  delay: String = "4 hours"): Set[FunnelOut] = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = FunnelStream.funnel(in.toDS(), timeoutSec = T,
        watermarkDelay = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[FunnelOut].collect().toSet
    } finally q.stop()
  }

  // one user converting, one abandoning at the view, one at the click,
  // one converting twice (attempt restart), machine noise throughout
  private val evs = Seq(
    // u1: view -> click -> purchase, all in window => converted
    Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view"),
    Ev(1L, ts("2024-01-01 10:05:00"), 2L, "click"),
    Ev(1L, ts("2024-01-01 10:20:00"), 3L, "purchase"),
    // u2: view, then nothing => abandoned at step 1, end = 10:30
    Ev(2L, ts("2024-01-01 10:00:00"), 4L, "view"),
    // u3: view -> click, purchase 40 min after the click => abandoned
    // at step 2 (end = click + 30 min), purchase is machine noise
    Ev(3L, ts("2024-01-01 10:00:00"), 5L, "view"),
    Ev(3L, ts("2024-01-01 10:10:00"), 6L, "click"),
    Ev(3L, ts("2024-01-01 10:50:00"), 7L, "purchase"),
    // u4: two complete attempts, plus ignored noise between them
    Ev(4L, ts("2024-01-01 10:00:00"), 8L, "view"),
    Ev(4L, ts("2024-01-01 10:01:00"), 9L, "signup"),
    Ev(4L, ts("2024-01-01 10:02:00"), 10L, "click"),
    Ev(4L, ts("2024-01-01 10:03:00"), 11L, "purchase"),
    Ev(4L, ts("2024-01-01 12:00:00"), 12L, "view"),
    Ev(4L, ts("2024-01-01 12:04:00"), 13L, "click"),
    Ev(4L, ts("2024-01-01 12:10:00"), 14L, "purchase"),
    // watermark pusher: far-future noise on an unrelated key
    Ev(99L, ts("2024-01-02 00:00:00"), 99L, "error"))

  test("converted / abandoned-at-view / abandoned-at-click / restart, " +
    "matching the sequential reference") {
    val exp = reference(evs)
    assert(exp == Set(
      FunnelOut(1L, 1L, "converted", 3, us("2024-01-01 10:00:00"), us("2024-01-01 10:20:00")),
      FunnelOut(2L, 1L, "abandoned", 1, us("2024-01-01 10:00:00"), us("2024-01-01 10:30:00")),
      FunnelOut(3L, 1L, "abandoned", 2, us("2024-01-01 10:00:00"), us("2024-01-01 10:40:00")),
      FunnelOut(4L, 1L, "converted", 3, us("2024-01-01 10:00:00"), us("2024-01-01 10:03:00")),
      FunnelOut(4L, 2L, "converted", 3, us("2024-01-01 12:00:00"), us("2024-01-01 12:10:00"))),
      "the reference itself must match the hand-computed truth")
    assert(run(Seq(evs), "funnel_one") == exp)
  }

  test("every batch split produces the identical output (buffered " +
    "in-order fold), including out-of-order delivery within the horizon") {
    val exp = reference(evs)
    // time-ordered two-batch split
    val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
    assert(run(Seq(sorted.take(7), sorted.drop(7)), "funnel_two") == exp)
    // adversarial split: u4's SECOND attempt delivered before its
    // first (cross-batch out-of-order, beyond any in-batch sort)
    val late = evs.filter(e => e.user_id == 4L && e.event_id <= 11L)
    val early = evs.filterNot(e => e.user_id == 4L && e.event_id <= 11L)
    assert(run(Seq(early.filter(_.user_id == 4L), late,
      early.filterNot(_.user_id == 4L)), "funnel_ooo") == exp)
  }

  test("abandonment fires on WATERMARK advance with no same-key event, " +
    "and idle state is evicted from the store") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = FunnelStream.funnel(in.toDS(), timeoutSec = T,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("funnel_wm")
      .outputMode("append").start()
    try {
      in.addData(Seq(Ev(5L, ts("2024-01-01 10:00:00"), 1L, "view")))
      q.processAllAvailable()
      assert(spark.table("funnel_wm").isEmpty,
        "nothing may emit before the deadline's watermark")
      // an unrelated key pushes the watermark past 10:30
      in.addData(Seq(Ev(6L, ts("2024-01-01 11:00:00"), 2L, "error")))
      q.processAllAvailable()
      val got = spark.table("funnel_wm").as[FunnelOut].collect().toSet
      assert(got == Set(FunnelOut(5L, 1L, "abandoned", 1,
        us("2024-01-01 10:00:00"), us("2024-01-01 10:30:00"))))
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 0,
        s"finalized + idle keys must be evicted, store holds $stateRows")
    } finally q.stop()
  }
}
