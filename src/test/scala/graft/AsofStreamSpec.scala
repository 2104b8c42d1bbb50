package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.AsofStream
import graft.streaming.AsofStream.{Ev, AsofOut}

/** Streaming backward as-of join: watermark-gated emission, inclusive
  * same-timestamp match with right-before-left ordering, no-match
  * nulls, batch-split invariance under out-of-order arrival, agreement
  * with the batch operator, and state eviction for untouched keys.
  */
class AsofStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L

  private def run(batches: Seq[Seq[Ev]], name: String,
                  delay: String = "4 hours"): Set[AsofOut] = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = AsofStream.asof(in.toDS(), watermarkDelay = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[AsofOut].collect().toSet
    } finally q.stop()
  }

  // user 1: clicks at 10:00 (id 1, 1.5) and 10:20 (id 3, 2.5);
  //   purchases at 10:10 (id 2 -> click 1), 10:20 (id 4 -> click 3,
  //   the same-ts inclusive match with right folding first), and a
  //   purchase at 09:00 (id 0 -> no match, null payload)
  // user 2: purchase only, never any click -> null payload
  // pusher key 9 advances the watermark past everything
  private val evs = Seq(
    Ev(1L, ts("2024-01-01 09:00:00"), 0L, 1, 0.0),
    Ev(1L, ts("2024-01-01 10:00:00"), 1L, 0, 1.5),
    Ev(1L, ts("2024-01-01 10:10:00"), 2L, 1, 0.0),
    Ev(1L, ts("2024-01-01 10:20:00"), 3L, 0, 2.5),
    Ev(1L, ts("2024-01-01 10:20:00"), 4L, 1, 0.0),
    Ev(2L, ts("2024-01-01 10:05:00"), 5L, 1, 0.0),
    Ev(9L, ts("2024-01-02 00:00:00"), 99L, 0, 9.9))

  private val expected = Set(
    AsofOut(1L, 0L, us("2024-01-01 09:00:00"), None, None),
    AsofOut(1L, 2L, us("2024-01-01 10:10:00"), Some(1L), Some(1.5)),
    AsofOut(1L, 4L, us("2024-01-01 10:20:00"), Some(3L), Some(2.5)),
    AsofOut(2L, 5L, us("2024-01-01 10:05:00"), None, None))

  test("inclusive same-ts match, no-match nulls, single batch") {
    assert(run(Seq(evs), "asof_one") == expected)
  }

  test("every batch split (including right rows delivered AFTER the left " +
    "rows they serve) produces identical output") {
    val sorted = evs.sortBy(e => (e.ts.getTime, e.kind, e.event_id))
    assert(run(Seq(sorted.take(3), sorted.drop(3)), "asof_two") == expected)
    // adversarial: all user-1 clicks arrive a batch AFTER the purchases
    val clicks = evs.filter(e => e.user_id == 1L && e.kind == 0)
    val others = evs.filterNot(e => e.user_id == 1L && e.kind == 0)
    assert(run(Seq(others.filter(_.user_id == 1L), clicks,
      others.filterNot(_.user_id == 1L)), "asof_ooo") == expected)
  }

  test("agrees with the batch TemporalJoins.asofBackward on the same rows") {
    val data = evs.filter(_.user_id != 9L)
    val left = data.filter(_.kind == 1)
      .map(e => (e.event_id, e.user_id, e.ts)).toDF("left_id", "user_id", "ts")
    val right = data.filter(_.kind == 0)
      .map(e => (e.event_id, e.user_id, e.ts, e.value))
      .toDF("right_id", "user_id", "ts", "value")
    val batch = graft.operators.TemporalJoins.asofBackward(
        left, right, keyCol = "user_id", tsCol = "ts",
        leftIdCol = "left_id", rightIdCol = "right_id",
        payloadCols = Seq("right_id", "value"))
      .select(col("user_id"), col("left_id"),
        unix_micros(col("ts")).as("left_us"),
        col("asof_right_id").as("right_id"),
        col("asof_value").as("right_value"))
      .as[AsofOut].collect().toSet
    assert(batch == expected, "batch operator must agree on the fixture")
  }

  test("a key whose rows are all above the watermark stays buffered; a " +
    "left-only key evicts after emission") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = AsofStream.asof(in.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("asof_state")
      .outputMode("append").start()
    try {
      in.addData(Seq(Ev(5L, ts("2024-01-01 10:00:00"), 1L, 1, 0.0)))
      q.processAllAvailable()
      assert(spark.table("asof_state").isEmpty,
        "a left row may not emit before the watermark passes it")
      in.addData(Seq(Ev(6L, ts("2024-01-01 11:00:00"), 2L, 1, 0.0)))
      q.processAllAvailable()
      // key 5's left row (10:00 <= wm 11:00) emitted with null payload
      // and, having no retained right row, its state evicted; key 6's
      // row is still buffered (11:00 > wm)
      val got = spark.table("asof_state").as[AsofOut].collect().toSet
      assert(got == Set(AsofOut(5L, 1L, us("2024-01-01 10:00:00"), None, None)))
      val rows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(rows == 1, s"only key 6's buffer should remain, store holds $rows")
    } finally q.stop()
  }
}
