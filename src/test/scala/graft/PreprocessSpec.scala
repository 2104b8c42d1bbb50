package graft

import org.apache.spark.sql.functions._

import graft.operators.Preprocess

class PreprocessSpec extends SparkSpec {
  import spark.implicits._

  test("P1-P4 preprocess: drop-list, clean title, derive summary, trim date") {
    val raw = Seq(
      ("1", "<p>Body &amp; text!</p>", "Title® here", " 2024-01-01 10:00:00 ", "vendorx"))
      .toDF("id", "text", "title", "date", "vendor_data")
    val out = Preprocess.preprocess(raw)
    assert(!out.columns.contains("vendor_data"))
    assert(!out.columns.contains("date"))
    val r = out.head()
    assert(r.getAs[String]("title") == "Title here")     // ® stripped (P2)
    assert(r.getAs[String]("text") == "Body & text!")    // tags stripped (P3)
    // summary = cleanText of RAW text (pre_process_docs.py:114-116):
    // markup chars are stripped as characters, not parsed as tags
    assert(r.getAs[String]("summary") == "pBody amp textp")
    assert(r.getAs[String]("publication_date") == "2024-01-01 10:00:00")
  }

  test("P9 dedup keeps first occurrence in arrival order") {
    val df = Seq(
      ("a", "first", 10L), ("a", "second", 20L), ("b", "only", 30L))
      .toDF("id", "text", "arrival")
    val out = Preprocess.dedupById(df, "arrival")
      .select("id", "text").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "first", "b" -> "only"))
  }

  test("P8 size guard drops oversized serialized docs") {
    val big = "x" * 300000
    val df = Seq(("1", "small"), ("2", big)).toDF("id", "text")
    val out = Preprocess.sizeGuard(df).select("id").as[String].collect()
    assert(out.toSeq == Seq("1"))
  }

  test("P6+P7 embed attaches a unit-norm array<float> of the right width") {
    val df = Seq(("1", "some text", "title", "sum")).toDF("id", "text", "title", "summary")
    val out = Preprocess.embed(df, dim = 32)
    val v = out.select("concat_embedding").as[Array[Float]].head()
    assert(v.length == 32)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
  }
}
