package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Boundary-convention pins for the w11 (time-RANGE frame) and w12
  * (native session_window) catalog queries. These conventions are what
  * the DuckDB oracles replay, so a Spark behavior change — or a wrong
  * oracle assumption — fails here before it fails the hash gate.
  */
class WindowFramesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("event_id", "user_id", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
      .withColumn("value", lit(1.0))

  test("w11 range frame: row exactly 24h back is IN the frame, 24h+1µs is OUT") {
    val df = ev(
      (1L, 7L, "2024-01-01 00:00:00"),
      (2L, 7L, "2024-01-02 00:00:00"),          // exactly 24h after #1
      (3L, 7L, "2024-01-03 00:00:00.000001"))   // 24h + 1µs after #2
    val w = Window.partitionBy(col("user_id")).orderBy(col("__us"))
      .rangeBetween(-86400000000L, Window.currentRow)
    val n = df.withColumn("__us", unix_micros(col("ts")))
      .select(col("event_id"), count(lit(1)).over(w).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(n(1L) == 1L)
    assert(n(2L) == 2L) // inclusive lower edge: #1 is exactly ts−24h
    assert(n(3L) == 1L) // #2 fell 1µs outside the frame
  }

  test("w12 session_window: gap-equal arrival MERGES; gap+1µs starts a new session") {
    // gap = 1 hour; #2 arrives exactly prev+gap → still the same
    // session (inclusive merge — the same > convention w6 uses);
    // #3 arrives gap+1µs after #2 → new session.
    val df = ev(
      (1L, 7L, "2024-01-01 00:00:00"),
      (2L, 7L, "2024-01-01 01:00:00"),
      (3L, 7L, "2024-01-01 02:00:00.000001"))
    val out = df
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("sw.start")).as("s"),
        unix_micros(col("sw.end")).as("e"), col("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 2)
    val hour = 3600000000L
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000L
    // merged session of #1,#2: start = #1's ts, end = #2's ts + gap
    assert(out(0) == ((t0, t0 + 2 * hour, 2L)))
    assert(out(1) == ((t0 + 2 * hour + 1, t0 + 3 * hour + 1, 1L)))
  }

  test("w12 oracle derivation (brk at diff > gap) replays session_window exactly") {
    // randomized arrivals incl. planted boundary-exact gaps; the lag/
    // running-sum derivation the DuckDB oracle uses must agree with the
    // native operator on every session's (start, end, n, sum)
    val rnd = new scala.util.Random(41)
    val gapUs = 3600000000L
    val rows = (0 until 4).flatMap { u =>
      var t = 1704067200000000L + u * 1000L
      (0 until 60).map { i =>
        // ~1/6 of steps are EXACTLY the gap — the boundary convention
        val step = if (i % 6 == 3) gapUs
                   else (rnd.nextDouble() * 2 * gapUs).toLong
        t += step
        (u * 1000L + i, u.toLong, t, rnd.nextInt(100) / 10.0)
      }
    }
    val df = rows.toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val native = df
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour").as("sw"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("tv"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("s"),
        unix_micros(col("sw.end")).as("e"), col("n"), col("tv"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val derived = df
      .withColumn("brk",
        when(lag(col("us"), 1).over(wOrd).isNull ||
          col("us") - lag(col("us"), 1).over(wOrd) > gapUs, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("s"), (max(col("us")) + gapUs).as("e"),
        count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("tv"))
      .select(col("user_id"), col("s"), col("e"), col("n"), col("tv"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(native == derived)
    assert(native.exists(_._4 > 1)) // merging actually exercised
  }
}
