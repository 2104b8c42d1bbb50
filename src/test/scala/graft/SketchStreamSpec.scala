package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SketchStream
import graft.streaming.SketchStream.{Ev, DistinctOut}

/** Streaming KMV distinct: cross-batch sketch accumulation equals the
  * batch aggregator, exact small-side read-off (n < k), close-once
  * emission, store eviction.
  */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val W = ts("2024-01-01 00:00:00").getTime * 1000L

  test("sketch folds across batches, emits once at close with the exact " +
    "n<k read-off, and the closed window leaves the store") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = SketchStream.kmvDistinct(in.toDS(), windowSec = 86400L, k = 32,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("append").start()
    try {
      // 5 distinct hashes, one duplicated, split across two batches
      in.addData(Seq(Ev(W, 100L, ts("2024-01-01 01:00:00")),
        Ev(W, 200L, ts("2024-01-01 02:00:00")),
        Ev(W, 100L, ts("2024-01-01 03:00:00"))))
      q.processAllAvailable()
      in.addData(Seq(Ev(W, 300L, ts("2024-01-01 04:00:00")),
        Ev(W, 400L, ts("2024-01-01 05:00:00")),
        Ev(W, 500L, ts("2024-01-01 06:00:00"))))
      q.processAllAvailable()
      assert(spark.table("kmv_stream").isEmpty, "no emission before close")
      in.addData(Seq(Ev(W + 86400000000L * 2, 9L,
        ts("2024-01-03 12:00:00")))) // watermark pusher
      q.processAllAvailable()
      val got = spark.table("kmv_stream").as[DistinctOut].collect().toSet
      assert(got == Set(DistinctOut(W, 5L, 5.0)),
        s"n<k must read off the exact distinct count, got $got")
      val rows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(rows == 1, s"only the pusher's window may remain, store=$rows")
    } finally q.stop()
  }
}
