package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.TopKStream
import graft.streaming.TopKStream.{Ev, TopOut}

/** Streaming windowed top-k: exactly-once emission at window close,
  * deterministic tie-break, cross-batch count accumulation, k cut,
  * and store eviction of closed windows.
  */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L
  private val W = us("2024-01-01 10:00:00")

  private def ev(t: String, cat: String) = Ev(W, cat, ts(t))

  test("counts accumulate across batches, the leaderboard emits once at " +
    "the watermark close with (n desc, category asc) ties, and the " +
    "closed window leaves the store") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = TopKStream.topK(in.toDS(), windowSec = 3600L, k = 3,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        ev("2024-01-01 10:01:00", "view"), ev("2024-01-01 10:02:00", "view"),
        ev("2024-01-01 10:03:00", "click")))
      q.processAllAvailable()
      assert(spark.table("topk_stream").isEmpty,
        "nothing may emit while the window is open")
      in.addData(Seq(
        ev("2024-01-01 10:10:00", "click"), ev("2024-01-01 10:11:00", "error"),
        ev("2024-01-01 10:12:00", "signup")))
      q.processAllAvailable()
      // push the watermark past the window end with a later window
      in.addData(Seq(Ev(us("2024-01-01 12:00:00"), "view",
        ts("2024-01-01 12:30:00"))))
      q.processAllAvailable()
      val got = spark.table("topk_stream").as[TopOut].collect().toSet
      assert(got == Set(
        TopOut(W, "click", 2L, 1), // 2-2 tie with view broken by name asc
        TopOut(W, "view", 2L, 2),
        TopOut(W, "error", 1L, 3)), // error beats signup alphabetically
        s"got $got")
      val rows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(rows == 1, s"only the 12:00 window may remain open, store=$rows")
    } finally q.stop()
  }
}
