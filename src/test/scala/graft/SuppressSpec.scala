package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Suppress

/** TTL-bounded suppression state ([[graft.streaming.Suppress]]):
  * first alert emits, in-window repeats are swallowed (within a batch,
  * across batches, and across keys independently), and after the
  * processing-time TTL lapses the key forgets and alerts again.
  */
class SuppressSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(3600000L + m * 60000L)

  private def withRocks[T](f: org.apache.spark.sql.SparkSession => T): T = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "2")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    f(s)
  }

  test("first alert per key emits; repeats suppress within and across " +
    "batches; keys are independent") {
    withRocks { s =>
      implicit val sq = s.sqlContext
      val in = MemoryStream[Suppress.Ev]
      val out = SparkHygiene.scratchDir("supp_out")
      val ck = SparkHygiene.scratchDir("supp_ck")
      val q = Suppress.firstPerKey(in.toDF(), java.time.Duration.ofHours(1))
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow())

      // batch 1: user 1 fires twice (later event first in arrival
      // order — "first" must be by event time), user 2 once
      in.addData(
        Suppress.Ev(1L, "error", 12L, ts(5)),
        Suppress.Ev(1L, "error", 11L, ts(1)),
        Suppress.Ev(2L, "error", 20L, ts(2)))
      q.start().awaitTermination()
      // batch 2 (fresh AvailableNow run, same checkpoint): repeats for
      // both + a new key/type pair
      in.addData(
        Suppress.Ev(1L, "error", 13L, ts(9)),
        Suppress.Ev(2L, "error", 21L, ts(9)),
        Suppress.Ev(1L, "warn", 14L, ts(9)))
      q.start().awaitTermination()

      val rows = s.read.parquet(out)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(rows == Set((1L, "error", 11L), (2L, "error", 20L),
        (1L, "warn", 14L)))
    }
  }

  test("after the TTL lapses the key forgets and alerts again") {
    withRocks { s =>
      implicit val sq = s.sqlContext
      val in = MemoryStream[Suppress.Ev]
      val out = SparkHygiene.scratchDir("supp_out2")
      val ck = SparkHygiene.scratchDir("supp_ck2")
      val q = Suppress.firstPerKey(in.toDF(),
          java.time.Duration.ofMillis(50))
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow())

      in.addData(Suppress.Ev(1L, "error", 11L, ts(1)))
      q.start().awaitTermination()
      Thread.sleep(3000) // far beyond the 50 ms TTL
      in.addData(Suppress.Ev(1L, "error", 12L, ts(2)))
      q.start().awaitTermination()

      val ids = s.read.parquet(out).select(col("event_id"))
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(11L, 12L),
        "the expired key must alert again after the TTL window")
    }
  }
}
