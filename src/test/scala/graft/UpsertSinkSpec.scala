package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Snapshots

/** The exactly-once streaming UPSERT sink
  * ([[graft.sources.v2.SnapshotUpsertStreamingWrite]],
  * `option("upsertKey", col)`): per-epoch key-upsert commits — appends
  * + deletion-vector suppressions in ONE manifest version, zero file
  * rewrites, replay-idempotent. */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def drain(src: String, dst: String, ck: String): Unit = {
    val q = spark.readStream.format("graft_snapshots")
      .option("path", src).option("maxVersionsPerTrigger", 1).load()
      .writeStream.format("graft_snapshots")
      .option("path", dst).option("upsertKey", "id")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("epochs upsert by key: later epochs win, untouched rows survive, " +
    "each epoch is ONE zero-rewrite commit; restart applies only new data") {
    val src = SparkHygiene.scratchDir("ups_src")
    val dst = SparkHygiene.scratchDir("ups_dst") + "/t"
    val ck = SparkHygiene.scratchDir("ups_ck")
    // three source commits = three micro-batches, overlapping keys
    Snapshots.commit(spark, src,
      spark.range(100).toDF("id").withColumn("v", lit("e1"))
        .repartitionByRange(4, $"id"))
    Snapshots.commit(spark, src,
      spark.range(50, 120).toDF("id").withColumn("v", lit("e2")))
    Snapshots.commit(spark, src,
      spark.range(80, 90).toDF("id").withColumn("v", lit("e3")))
    drain(src, dst, ck)
    val out = Snapshots.read(spark, dst).as[(Long, String)].collect().toMap
    assert(out.size == 120)
    assert((0L until 50L).forall(out(_) == "e1"))
    assert((50L until 80L).forall(out(_) == "e2"))
    assert((80L until 90L).forall(out(_) == "e3"))
    assert((90L until 120L).forall(out(_) == "e2"))
    // three epochs = three versions (bootstrap append + two upserts),
    // and the upsert epochs suppressed exactly the replaced rows
    assert(Snapshots.currentVersion(dst) == 3)
    assert(Snapshots.deletionVectors(dst, 3).values.map(_.length).sum
      == 50 + 10) // e2 replaced 50 of e1; e3 replaced 10 of e1/e2
    // zero rewrites: every version's entries are a superset of the last
    assert(Snapshots.manifestEntries(dst, 1).toSet
      .subsetOf(Snapshots.manifestEntries(dst, 3).toSet))
    // restart: a fourth source commit applies alone
    Snapshots.commit(spark, src,
      spark.range(118, 125).toDF("id").withColumn("v", lit("e4")))
    drain(src, dst, ck)
    val out2 = Snapshots.read(spark, dst).as[(Long, String)].collect().toMap
    assert(out2.size == 125)
    assert((118L until 125L).forall(out2(_) == "e4"))
    assert(out2(117L) == "e2" && out2(85L) == "e3")
  }

  test("epoch replay publishes nothing (exactly-once survives a " +
    "replayed commit call)") {
    val dst = SparkHygiene.scratchDir("ups_replay") + "/t"
    val conf = new graft.sources.v2.ParquetGroups.SerializableConf(
      spark.sparkContext.hadoopConfiguration)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType, nullable = false)))
    Snapshots.commit(spark, dst, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val idSchema = Snapshots.withFieldIds(dst, schema)
    val w = new graft.sources.v2.SnapshotUpsertStreamingWrite(
      dst, idSchema, conf, "q-ups", "id")
    // stage one epoch file (id-stamped, like a real task's output); a
    // REPLAYED epoch re-runs its tasks into a fresh staging dir, so
    // each commit call gets its own staged copy
    def stage(n: Int): String = {
      val stageDir = s"$dst/data/w-test$n"
      spark.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(2L, "B")), idSchema)
        .coalesce(1).write
        .option(org.apache.spark.sql.internal.SQLConf
          .PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
        .parquet(stageDir)
      new java.io.File(stageDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    w.commit(5L, Array(graft.sources.v2.FileCommit(stage(1), 1L)))
    assert(Snapshots.currentVersion(dst) == 2)
    assert(Snapshots.read(spark, dst).as[(Long, String)].collect().toSet
      == Set(1L -> "a", 2L -> "B"))
    // replay the SAME epoch (fresh task output): no new version, the
    // duplicate staged file is dropped
    w.commit(5L, Array(graft.sources.v2.FileCommit(stage(2), 1L)))
    assert(Snapshots.currentVersion(dst) == 2)
    assert(Snapshots.read(spark, dst).count() == 2)
  }

  test("UPDATE output mode composes: a streaming aggregation feeds the " +
    "upsert sink as a continuously-maintained aggregate table") {
    val src = SparkHygiene.scratchDir("ups_agg_src")
    val dst = SparkHygiene.scratchDir("ups_agg_dst") + "/t"
    val ck = SparkHygiene.scratchDir("ups_agg_ck")
    Snapshots.commit(spark, src,
      Seq((1L, 10.0), (2L, 20.0), (1L, 5.0)).toDF("k", "x"))
    Snapshots.commit(spark, src,
      Seq((1L, 1.0), (3L, 7.0)).toDF("k", "x"))
    def agg(): Unit = {
      val q = spark.readStream.format("graft_snapshots")
        .option("path", src).option("maxVersionsPerTrigger", 1).load()
        .groupBy($"k").agg(sum($"x").as("total"))
        .writeStream.format("graft_snapshots")
        .option("path", dst).option("upsertKey", "k")
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    agg()
    val out = Snapshots.read(spark, dst).as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 16.0, 2L -> 20.0, 3L -> 7.0))
    // the plain append sink still refuses update mode
    val ex = intercept[Exception] {
      spark.readStream.format("graft_snapshots").option("path", src).load()
        .groupBy($"k").agg(sum($"x").as("total"))
        .writeStream.format("graft_snapshots")
        .option("path", SparkHygiene.scratchDir("ups_no") + "/t")
        .option("checkpointLocation", SparkHygiene.scratchDir("ups_no_ck"))
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(ex.getMessage.toLowerCase.contains("update") ||
      Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("update")))
  }
}
