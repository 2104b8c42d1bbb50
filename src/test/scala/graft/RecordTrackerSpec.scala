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
}
