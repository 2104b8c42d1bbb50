package graft

import org.apache.spark.sql.functions._

import graft.functions.NfcNormalizeExpr

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("composes decomposed sequences, leaves NFC input bit-identical, " +
    "passes null through") {
    val df = Seq(
      (1L, "José"),          // e + combining acute → é
      (2L, "José"),           // already composed
      (3L, "ṩ"),       // multi-combining → ṩ (U+1E69)
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String])).toDF("id", "s")
    val got = df.select(col("id"), NfcNormalizeExpr(col("s")).as("n"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got(0)._2 == "José")
    assert(got(1)._2 == "José")
    assert(got(2)._2 == "ṩ")
    assert(got(3)._2 == "plain ascii")
    assert(got(4)._2 == null)
  }

  test("registered as the nfc_normalize SQL function and runs inside " +
    "whole-stage codegen") {
    val df = Seq("José").toDF("s")
    df.createOrReplaceTempView("__nfc_t")
    val q = spark.sql("SELECT nfc_normalize(s) AS n FROM __nfc_t")
    assert(q.as[String].head() == "José")
    // a local relation constant-folds; drive codegen through a real scan
    val scan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(NfcNormalizeExpr(col("text")).as("n"))
    scan.write.format("noop").mode("overwrite").save()
    val p = scan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("[codegen id :"), s"no whole-stage codegen span:\n$p")
  }
}
