package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The incremental claim behind w23_stream_scd2: the open-version
  * state must CARRY ACROSS micro-batches — a version whose opening
  * event arrives in batch i and whose closing event arrives in batch
  * j > i still emits exactly once, with the right interval. The
  * catalog entry drains one file in one batch, so this spec builds the
  * genuinely multi-batch regime: the event log split into time-ordered
  * chunk files, maxFilesPerTrigger=1 (the StreamScaleProbe corpus
  * discipline), then asserts the closed set equals the batch operator
  * row-for-row.
  */
class StreamScd2Spec extends SparkSpec {

  test("closed versions from a 4-micro-batch drain equal the batch recompute") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val dir = java.nio.file.Files.createTempDirectory("scd2stream").toString
    val b = ev.agg(min(col("ts")).cast("double").as("lo"),
      max(col("ts")).cast("double").as("hi")).head()
    val lo = b.getDouble(0); val hi = b.getDouble(1) + 1.0
    val n = 4
    for (i <- 0 until n) {
      val clo = lo + i * (hi - lo) / n
      val chi = lo + (i + 1) * (hi - lo) / n
      ev.filter(col("ts").cast("double") >= clo &&
          col("ts").cast("double") < chi)
        .coalesce(1).write.mode("append").parquet(dir)
    }

    val s = SparkHygiene.streamStateSession(spark, 8)
    import s.implicits._
    val stream = s.readStream.schema(s.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .as[graft.streaming.StreamScd2.Ev]
    val out = SparkHygiene.scratchDir("w23spec_out")
    val ck = SparkHygiene.scratchDir("w23spec_ck")
    val q = graft.streaming.StreamScd2.closedIntervals(stream).toDF()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) == n,
      "expected one data-bearing micro-batch per chunk file")

    val got = s.read.parquet(out)
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"))
      .orderBy(col("user_id"), col("valid_from")).collect().toSeq
    val want = graft.operators.Scd2
      .intervals(Tables.events(spark, sf),
        "user_id", "event_type", "ts", "event_id")
      .filter(col("valid_to").isNotNull)
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"))
      .orderBy(col("user_id"), col("valid_from")).collect().toSeq
    assert(got.size === want.size)
    assert(got === want)
  }
}
