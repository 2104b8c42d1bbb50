package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The watermark-vs-join-range boundary behind w29/w15 (VERDICT r13 #4,
  * ADVICE r12): those catalog queries run a stream-stream join whose
  * WATERMARK DELAY (30 min) is smaller than its JOIN RANGE (360 min).
  * Under the single-drain AvailableNow harness that is sound — one
  * batch, no cross-batch disorder — but a multi-batch source can
  * deliver a row whose event time is already behind the watermark, and
  * Spark drops late INPUT at the stateful operator: the match a batch
  * join would produce is silently lost.
  *
  * This spec MEASURES that boundary instead of leaving it as a comment:
  * the same two-file feed (file 2 carries rows 10 hours older than
  * file 1's maximum) through the same join shape as w29's join₁,
  * processed as two micro-batches (maxFilesPerTrigger=1):
  *
  *  - delay = 30 min (the catalog setting): the late pair is DROPPED —
  *    exactly one match survives, and the loss is exactly the late pair;
  *  - delay ≥ the source's disorder bound (720 min here): the same feed
  *    converges to the batch join exactly.
  *
  * The production contract follows: size the watermark delay to the
  * source's out-of-order bound, not to the join range — the range only
  * sizes STATE retention (Spark keeps a row's state until the other
  * side's watermark passes row_ts + range), while the delay alone
  * decides late-input drops.
  */
class WatermarkBoundarySpec extends SparkSpec {
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-03-01 $hhmm:00")

  /** Three micro-batches: batch 1 carries the u99 pair at 20:00 (and
    * advances both sides' watermarks there), batch 2 the in-order u98
    * pair at 20:10, batch 3 the u1 pair at 10:00 — 10 h out of order.
    * THREE batches because late-input filtering uses the PREVIOUS
    * batch's watermark (the late-events/eviction split of multi-
    * stateful-operator support): the watermark advanced by batch N
    * only drops late input from batch N+2 on. Returns the joined
    * rows. */
  private def runFeed(delay: String): Seq[(Long, Long, Long)] = {
    val dir = SparkHygiene.scratchDir("wmb_in")
    val out = SparkHygiene.scratchDir("wmb_out")
    val ck = SparkHygiene.scratchDir("wmb_ck")
    def write(name: String, rows: Seq[(Long, String, Long, Timestamp)],
              mtime: Long): Unit = {
      val f = new java.io.File(dir, name)
      val json = rows.map { case (u, et, id, t) =>
        s"""{"user_id":$u,"event_type":"$et","event_id":$id,""" +
          s""""ts":"${t.toInstant}"}"""
      }.mkString("\n")
      java.nio.file.Files.write(f.toPath,
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(f.setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    write("b1.json", Seq(
      (99L, "click", 1L, ts("20:00")),
      (99L, "error", 2L, ts("20:00"))), t0)
    write("b2.json", Seq(
      (98L, "click", 5L, ts("20:10")),
      (98L, "error", 6L, ts("20:10"))), t0 + 10000)
    write("b3.json", Seq(
      (1L, "click", 3L, ts("10:00")),
      (1L, "error", 4L, ts("10:05"))), t0 + 20000)
    val schema = "user_id LONG, event_type STRING, event_id LONG, ts TIMESTAMP"
    val ev = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("cts"))
      .withWatermark("cts", delay)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("event_id").as("error_id"),
        col("ts").as("ets"))
      .withWatermark("ets", delay)
    val joined = clicks.join(errors,
      col("user_id") === col("eu") &&
        col("ets") >= col("cts") &&
        col("ets") <= col("cts") + expr("INTERVAL 360 MINUTES"))
    val q = joined.select("user_id", "click_id", "error_id")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(out)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("delay < disorder bound: the late pair is dropped — the loss is " +
    "exactly the rows behind the watermark") {
    val got = runFeed("30 minutes")
    assert(got == Seq((98L, 5L, 6L), (99L, 1L, 2L)),
      s"expected only the in-order pairs to survive, got $got")
  }

  test("delay >= disorder bound: the same feed converges to the batch " +
    "join exactly") {
    val got = runFeed("720 minutes")
    assert(got == Seq((1L, 3L, 4L), (98L, 5L, 6L), (99L, 1L, 2L)),
      s"expected full batch-join parity, got $got")
  }
}
