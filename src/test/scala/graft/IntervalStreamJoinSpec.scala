package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins
import graft.streaming.IntervalStreamJoin

/** Stream-stream interval join: matches emit incrementally as both sides
  * arrive (inner join, append mode), late batches still match buffered
  * state, and the final output equals the batch intervalJoin over the
  * same rows.
  */
class IntervalStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("incremental emission across micro-batches, and stream ≡ batch") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val errIn = MemoryStream[(Long, Timestamp)]
    val clkIn = MemoryStream[(Long, Timestamp)]
    val incidents = errIn.toDS().toDF("error_id", "win_start")
      .withColumn("win_end", col("win_start") + expr("INTERVAL 10 MINUTES"))
    val clicks = clkIn.toDS().toDF("click_id", "ts")
    val q = IntervalStreamJoin.join(incidents, clicks,
        startCol = "win_start", endCol = "win_end", tsCol = "ts",
        slotWidthSec = 600L, maxLenSec = 600L, delay = "30 minutes")
      .select(col("error_id"), col("click_id"))
      .writeStream.format("memory").queryName("isj_out")
      .outputMode("append").start()
    try {
      def emitted(): Set[(Long, Long)] =
        spark.table("isj_out").as[(Long, Long)].collect().toSet

      // batch 1: an error window and one in-window click → first match
      errIn.addData(Seq((1L, ts("2024-01-01 10:00:00"))))
      clkIn.addData(Seq((100L, ts("2024-01-01 10:03:00")),
        (101L, ts("2024-01-01 10:59:00")))) // outside → no match
      q.processAllAvailable()
      assert(emitted() == Set((1L, 100L)))

      // batch 2: a LATER click lands in the buffered window (state held
      // across batches), plus a slot-boundary click (window spans two
      // slots: 10:00 window covers slots [10:00) and [10:10) — a click
      // at 10:09:59 is slot 1, in-window)
      clkIn.addData(Seq((102L, ts("2024-01-01 10:09:59"))))
      q.processAllAvailable()
      assert(emitted() == Set((1L, 100L), (1L, 102L)))

      // batch 3: a second error window arriving AFTER its clicks —
      // the click side is buffered symmetrically
      errIn.addData(Seq((2L, ts("2024-01-01 10:55:00"))))
      q.processAllAvailable()
      assert(emitted() == Set((1L, 100L), (1L, 102L), (2L, 101L)))

      // the whole stream equals the batch slot-join over the same rows
      val allErr = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:55:00")))
        .toDF("error_id", "win_start")
        .withColumn("win_end", col("win_start") + expr("INTERVAL 10 MINUTES"))
      val allClk = Seq((100L, ts("2024-01-01 10:03:00")),
          (101L, ts("2024-01-01 10:59:00")), (102L, ts("2024-01-01 10:09:59")))
        .toDF("click_id", "ts")
      val batch = TemporalJoins.intervalJoin(allErr, allClk,
          startCol = "win_start", endCol = "win_end", tsCol = "ts",
          slotWidthSec = 600L)
        .select(col("error_id"), col("click_id"))
        .as[(Long, Long)].collect().toSet
      assert(batch == emitted())
    } finally q.stop()
  }

  test("left-outer: an interval with no in-window points emits " +
    "null-padded once the watermark passes its match horizon") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val errIn = MemoryStream[(Long, Timestamp)]
    val clkIn = MemoryStream[(Long, Timestamp)]
    val incidents = errIn.toDS().toDF("error_id", "win_start")
      .withColumn("win_end", col("win_start") + expr("INTERVAL 10 MINUTES"))
    val clicks = clkIn.toDS().toDF("click_id", "ts")
    val q = IntervalStreamJoin.join(incidents, clicks,
        startCol = "win_start", endCol = "win_end", tsCol = "ts",
        slotWidthSec = 600L, maxLenSec = 600L, delay = "10 minutes",
        joinType = "left_outer")
      .select(col("error_id"), col("click_id"))
      .writeStream.format("memory").queryName("isj_outer")
      .outputMode("append").start()
    try {
      def emitted(): Set[(Long, Option[Long])] =
        spark.table("isj_outer").as[(Long, Option[Long])].collect().toSet

      // window 1 gets a match; window 2 gets nothing
      errIn.addData(Seq((1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:30:00"))))
      clkIn.addData(Seq((100L, ts("2024-01-01 10:03:00"))))
      q.processAllAvailable()
      val first = emitted()
      assert(first.contains((1L, Some(100L))))
      assert(!first.exists(_._2.isEmpty),
        "no null-padded row may emit while a match could still arrive")

      // advance BOTH watermarks far past window 2's horizon; the
      // unmatched interval must now emit exactly once, null-padded
      errIn.addData(Seq((9L, ts("2024-01-01 13:00:00"))))
      clkIn.addData(Seq((900L, ts("2024-01-01 13:00:00"))))
      q.processAllAvailable()
      // one more batch so the outer-row eviction pass runs after the
      // watermark update is in place
      errIn.addData(Seq((10L, ts("2024-01-01 13:30:00"))))
      clkIn.addData(Seq((901L, ts("2024-01-01 13:30:00"))))
      q.processAllAvailable()
      val outer = emitted().filter(_._2.isEmpty).map(_._1)
      assert(outer.contains(2L),
        s"unmatched window 2 must emit null-padded, got ${emitted()}")
      // the MATCHED slot-aligned window (len == slotWidth, end on a
      // slot boundary) must NOT emit a null row: the exclusive end
      // means no trailing never-matchable slot is exploded
      assert(!outer.contains(1L),
        s"matched window 1 must emit no null-padded row, got ${emitted()}")
    } finally q.stop()
  }
}
