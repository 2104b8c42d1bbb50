package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Snapshots
import graft.streaming.RecordTracker

/** transformWithState record detection: event-time ordering inside a
  * batch regardless of arrival order, the running best carried ACROSS
  * micro-batches by the state store, and non-records suppressed.
  */
class RecordTrackerSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, tsSec: Long, v: Double) =
    (id, new Timestamp(tsSec * 1000), user, v)

  test("records across batch boundaries use the carried state") {
    val s = SparkHygiene.streamStateSession(spark, 4)
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    val t = SparkHygiene.scratchDir("rt_tbl")
    // batch 1: u1 posts 10 then (later ts, ARRIVES FIRST in the frame)
    // 8 — only 10 is a record and 8 must compare against 10, not 0.
    Snapshots.commit(s, t, Seq(
      ev(2, 1, 200, 8.0), ev(1, 1, 100, 10.0), ev(3, 2, 150, 5.0))
      .toDF("event_id", "ts", "user_id", "value"))
    // batch 2: u1 beats 10 (record, prev_best 10); u2 ties 5 (no record:
    // strictly greater); u3 first-ever (record, prev_best null)
    Snapshots.commit(s, t, Seq(
      ev(4, 1, 300, 11.0), ev(5, 2, 300, 5.0), ev(6, 3, 300, 1.0))
      .toDF("event_id", "ts", "user_id", "value"))
    val out = SparkHygiene.scratchDir("rt_out")
    val ck = SparkHygiene.scratchDir("rt_ck")
    RecordTracker.records(
      s.readStream.format("graft_snapshots").option("path", t)
        .option("maxVersionsPerTrigger", 1).load())
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
      .awaitTermination()
    val got = s.read.parquet(out)
      .select($"user_id", $"event_id", $"value", $"prev_best")
      .as[(Long, Long, Double, Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 1L, 10.0, None),          // first record; the later-arriving
                                     // earlier event sorted first
      (1L, 4L, 11.0, Some(10.0)),    // cross-batch: beats batch 1's best
      (2L, 3L, 5.0, None),
      (3L, 6L, 1.0, None)))          // tie (u2 id 5) suppressed
  }

  test("inactivity timers re-arm on new data and fire per quiet gap") {
    val s = SparkHygiene.streamStateSession(spark, 4)
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    val t = SparkHygiene.scratchDir("rt_to_tbl")
    // gap = 100 s, watermark delay = 10 s.
    // batch 1 ends at t=1000: u1 last 100 (goes quiet), u2 last 990
    Snapshots.commit(s, t, Seq(
      ev(1, 1, 100, 1.0), ev(2, 2, 500, 1.0), ev(3, 2, 990, 1.0),
      ev(4, 9, 1000, 1.0))
      .toDF("event_id", "ts", "user_id", "value"))
    // batch 2 (no u1 data): watermark 990 fires u1's timer at 200 —
    // the mid-stream alert; u2's batch-1 timer (1090) re-arms to 2095
    // BEFORE expiry runs (input precedes timers within a batch)
    Snapshots.commit(s, t, Seq(
      ev(5, 2, 1995, 1.0), ev(6, 9, 2000, 1.0))
      .toDF("event_id", "ts", "user_id", "value"))
    // batch 3: u1 RETURNS (second life) then the final watermark (2990)
    // fires its new timer (2600); u2 (2095 ≤ 2990) alerts too; u9's
    // last=3000 stays above the final watermark
    Snapshots.commit(s, t, Seq(
      ev(7, 1, 2500, 1.0), ev(8, 9, 3000, 1.0))
      .toDF("event_id", "ts", "user_id", "value"))
    val out = SparkHygiene.scratchDir("rt_to_out")
    val ck = SparkHygiene.scratchDir("rt_to_ck")
    RecordTracker.inactivity(
      s.readStream.format("graft_snapshots").option("path", t)
        .option("maxVersionsPerTrigger", 1).load(),
      gap = "100 seconds", watermarkDelay = "10 seconds")
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
      .awaitTermination()
    val got = s.read.parquet(out)
      .as[(Long, Timestamp)].collect()
      .map { case (u, ts) => (u, ts.getTime / 1000) }
      .sortBy(identity).toSeq
    // u1 alerts twice (one per quiet gap, state cleared between lives);
    // u2 alerts once (re-armed past batch 1, expired at the end); u9
    // never (last event inside the final watermark's gap)
    assert(got == Seq((1L, 100L), (1L, 2500L), (2L, 1995L)))
  }
}
