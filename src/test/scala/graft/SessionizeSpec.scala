package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long, Double)*) =
    rows.toDF("event_id", "tss", "user_id", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  test("a gap strictly greater than gapSec starts a new session; an exact gap does not") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 7L, 1.0),
      (2L, "2024-01-01 10:10:00", 7L, 2.0),  // 600s — exactly the gap: same session
      (3L, "2024-01-01 10:20:01", 7L, 3.0),  // 601s — new session
      (4L, "2024-01-01 09:00:00", 9L, 5.0))  // other key: own numbering
    val got = Sessionize(df, "user_id", "ts", "event_id", gapSec = 600L)
      .select("event_id", "user_id", "session_idx")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 7L, 1L), (2L, 7L, 1L), (3L, 7L, 2L), (4L, 9L, 1L)))
  }

  test("stats roll up per (key, session): counts, id range, value total") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 7L, 1.5),
      (2L, "2024-01-01 10:01:00", 7L, 2.5),
      (3L, "2024-01-01 12:00:00", 7L, 4.0))
    val got = Sessionize.stats(df, "user_id", "ts", "event_id", "value", gapSec = 1800L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set((7L, 1L, 2L, 1L, 2L, 4.0), (7L, 2L, 1L, 3L, 3L, 4.0)))
  }

  test("same-timestamp events break ties on the id — session ids are stable") {
    val df = ev(
      (5L, "2024-01-01 10:00:00", 7L, 1.0),
      (4L, "2024-01-01 10:00:00", 7L, 1.0),
      (6L, "2024-01-01 11:00:00", 7L, 1.0))
    val got = Sessionize(df, "user_id", "ts", "event_id", gapSec = 600L)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toSet
    assert(got == Set((4L, 1L), (5L, 1L), (6L, 2L)))
  }
}
