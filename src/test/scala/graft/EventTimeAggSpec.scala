package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventTimeAgg

/** ST4 semantics for the generic event-time operator: closed windows
  * emit exactly once in append mode, rows behind the watermark are
  * dropped (not merged, not re-emitted), and what streams out equals
  * the batch form of the same aggregation over the on-time rows.
  */
class EventTimeAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ST4: watermarked hourly windows close once, late rows drop, " +
    "stream output equals the batch form") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDS().toDF("ts", "event_type", "value")
    val q = EventTimeAgg.hourlyStream(events, "2 hours")
      .writeStream.format("memory").queryName("w8_stream")
      .outputMode("append").start()
    try {
      val onTime = Seq(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:15:00"), "click", 2.0),
        (ts("2024-01-01 11:10:00"), "view", 5.0),
        (ts("2024-01-01 13:30:00"), "click", 1.5))
      in.addData(onTime)
      q.processAllAvailable()
      // watermark = 13:30 − 2 h = 11:30 → only the 10:00 window is closed
      def emitted(): Set[(String, String, Long, Double)] =
        spark.table("w8_stream")
          .as[(String, String, Long, Double)].collect().toSet
      assert(emitted() == Set(("2024-01-01 10:00:00", "click", 2L, 3.0)))

      // a row behind the watermark lands in an already-closed window:
      // dropped — the 10:00 aggregate must NOT change or re-emit
      in.addData(Seq((ts("2024-01-01 10:45:00"), "click", 100.0)))
      q.processAllAvailable()
      assert(emitted() == Set(("2024-01-01 10:00:00", "click", 2L, 3.0)))

      // advancing event time to 16:00 moves the watermark to 14:00 and
      // closes the 11:00 and 13:00 windows; 16:00's own window stays open
      in.addData(Seq((ts("2024-01-01 16:00:00"), "view", 1.0)))
      q.processAllAvailable()
      val streamed = emitted()
      assert(streamed == Set(
        ("2024-01-01 10:00:00", "click", 2L, 3.0),
        ("2024-01-01 11:00:00", "view", 1L, 5.0),
        ("2024-01-01 13:00:00", "click", 1L, 1.5)))

      // batch form over the on-time rows, restricted to closed windows,
      // agrees exactly (one definition, two execution modes)
      val batch = EventTimeAgg.hourly(
          (onTime :+ (ts("2024-01-01 16:00:00"), "view", 1.0))
            .toDF("ts", "event_type", "value"))
        .filter(col("win_start") <= "2024-01-01 13:00:00")
        .as[(String, String, Long, Double)].collect().toSet
      assert(batch == streamed)
    } finally q.stop()
  }

  test("streaming session_window: sessions merge across micro-batches in " +
    "state, emit once when the watermark passes their end, late rows drop") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val events = in.toDS().toDF("ts", "user_id", "value")
    // gap 1 hour, watermark delay 1 hour
    val q = EventTimeAgg.sessionsStream(events, gap = "1 hour", delay = "1 hour")
      .writeStream.format("memory").queryName("w12_stream")
      .outputMode("append").start()
    try {
      def emitted(): Set[(Long, Long, Long, Long, Double)] =
        spark.table("w12_stream")
          .as[(Long, Long, Long, Long, Double)].collect().toSet
      val us = 1000000L
      def t(sec: Long) = new Timestamp(sec * 1000)

      // batch 1: two events 30 min apart → one open session for user 7
      in.addData(Seq((t(1704067200), 7L, 1.0), (t(1704067200 + 1800), 7L, 2.0)))
      q.processAllAvailable()
      assert(emitted().isEmpty) // watermark has not passed the session end

      // batch 2: a third event 30 min later MERGES into the open session
      // (the cross-batch state-merge path); still nothing emits
      in.addData(Seq((t(1704067200 + 3600), 7L, 3.0)))
      q.processAllAvailable()
      assert(emitted().isEmpty)

      // batch 3: an event far ahead moves the watermark past the merged
      // session's end (last + gap) → it emits ONCE, fully merged
      in.addData(Seq((t(1704067200 + 6 * 3600), 7L, 9.0)))
      q.processAllAvailable()
      val start = 1704067200L * us
      val end = (1704067200L + 3600 + 3600) * us // last event + gap
      assert(emitted() == Set((7L, start, end, 3L, 6.0)))

      // a late row behind the watermark (inside the closed session)
      // drops — the emitted session must not duplicate or change
      in.addData(Seq((t(1704067200 + 900), 7L, 100.0)))
      q.processAllAvailable()
      assert(emitted() == Set((7L, start, end, 3L, 6.0)))

      // batch ≡ stream on the closed session: the batch form over the
      // on-time rows produces the same merged row
      val batch = EventTimeAgg.sessions(
          Seq((t(1704067200), 7L, 1.0), (t(1704067200 + 1800), 7L, 2.0),
            (t(1704067200 + 3600), 7L, 3.0))
            .toDF("ts", "user_id", "value"), gap = "1 hour")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(batch == Set((7L, start, end, 3L, 6.0)))
    } finally q.stop()
  }
}
