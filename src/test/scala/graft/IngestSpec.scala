package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Ingest

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("title", StringType)))

  test("S3+P10: base64 decode, parse, and split good vs malformed") {
    val df = Seq(
      """{"id":1,"title":"ok"}""",
      """{"id":2,"title"""", // truncated
      "not json at all").toDF("raw")
      .select(base64(col("raw").cast("binary")).as("env"))
      .select(Ingest.decodeBase64(col("env")).as("js"))
    val good = Ingest.parseJson(df, "js", schema)
    assert(good.select("id", "title").as[(Long, String)].collect().toSeq ==
      Seq((1L, "ok")))
    assert(Ingest.malformed(df, "js", schema).count() == 2)
  }

  test("P15 record size predicate enforces the 1 MB Kinesis limit") {
    val df = Seq("small", "x" * 2000000).toDF("payload")
    assert(df.filter(Ingest.recordSizeOk(col("payload"))).count() == 1)
  }

  test("ST6 rateChunks produces contiguous fixed-size batches in order") {
    val df = (0 until 10).map(i => (i, s"doc$i")).toDF("k", "v")
    val chunks = Ingest.rateChunks(df, perBatch = 3, orderCol = "k")
      .groupBy("batch").agg(count(lit(1)).as("n"), min("k").as("mn"), max("k").as("mx"))
      .orderBy("batch")
      .as[(Int, Long, Int, Int)].collect().toSeq
    assert(chunks == Seq((0, 3L, 0, 2), (1, 3L, 3, 5), (2, 3L, 6, 8), (3, 1L, 9, 9)))
  }
}
