package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SessionStream
import graft.streaming.SessionStream.Ev

/** The custom-state streaming sessionizer: in-batch gap closes, event-
  * time timeout closes, cross-batch session-index continuity, and exact
  * agreement with the batch `Sessionize.stats` roll-up.
  */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ST2/ST4: stream sessions close on gap and on watermark timeout, " +
    "matching the batch operator") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = SessionStream.sessions(in.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      def emitted(): Set[(Long, Long, Long, Long, Long, Double)] =
        spark.table("sess_stream")
          .as[(Long, Long, Long, Long, Long, Double)].collect().toSet

      val u1 = Seq(
        Ev(1L, ts("2024-01-01 10:00:00"), 1L, 1.5),
        Ev(1L, ts("2024-01-01 10:10:00"), 2L, 2.25),
        Ev(1L, ts("2024-01-01 11:00:00"), 3L, 4.0))
      in.addData(u1)
      q.processAllAvailable()
      // the 11:00 event is 3000 s behind 10:10 — session 1 closes
      // IN-batch; session 2 stays open (watermark 11:00 < 11:00+gap)
      assert(emitted() == Set((1L, 1L, 2L, 1L, 2L, 3.75)))

      // a different key far in the future advances the watermark past
      // u1's gap horizon: u1's open session times out and emits with
      // the CONTINUED index; u2's own session stays open
      in.addData(Seq(Ev(2L, ts("2024-01-01 13:00:00"), 10L, 1.0)))
      q.processAllAvailable()
      val streamed = emitted()
      assert(streamed == Set(
        (1L, 1L, 2L, 1L, 2L, 3.75),
        (1L, 2L, 1L, 3L, 3L, 4.0)))

      // batch operator over u1's rows (its input simply ends where the
      // stream timed out) produces the identical roll-up
      val batch = graft.operators.Sessionize.stats(
          u1.toDF(), keyCol = "user_id", tsCol = "ts", idCol = "event_id",
          valueCol = "value", gapSec = 1800L)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      assert(batch == streamed.filter(_._1 == 1L))
    } finally q.stop()
  }

  test("session index continuity across many batches on one key") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = SessionStream.sessions(in.toDS(), gapSec = 60)
      .writeStream.format("memory").queryName("sess_multi")
      .outputMode("append").start()
    try {
      // three sessions, one event each, delivered one batch apiece;
      // each arrival closes the previous session in-batch (gap 60 s)
      in.addData(Seq(Ev(7L, ts("2024-01-01 00:00:00"), 1L, 1.0)))
      q.processAllAvailable()
      in.addData(Seq(Ev(7L, ts("2024-01-01 01:00:00"), 2L, 2.0)))
      q.processAllAvailable()
      in.addData(Seq(Ev(7L, ts("2024-01-01 02:00:00"), 3L, 3.0)))
      q.processAllAvailable()
      val got = spark.table("sess_multi")
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      assert(got == Set(
        (7L, 1L, 1L, 1L, 1L, 1.0),
        (7L, 2L, 1L, 2L, 2L, 2.0)))
    } finally q.stop()
  }
}
