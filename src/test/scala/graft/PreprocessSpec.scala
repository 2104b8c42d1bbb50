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

  test("P7 embedding is BATCHED: the model seam sees <=batchSize chunks, order preserved") {
    // the embedder closure is serialized to executor threads; the spy
    // records through a JVM-singleton object so the driver sees the adds
    EmbedSpy.seen.clear()
    val df = (1 to 10).map(i => (i.toString, s"text $i", s"t$i", s"s$i"))
      .toDF("id", "text", "title", "summary").repartition(1)
    val out = Preprocess.embed(df, dim = 16, batchSize = 3,
      embedder = EmbedSpy.spy).collect()
    assert(out.length == 10)
    val sizes = EmbedSpy.seen.toArray(Array.empty[Integer]).map(_.intValue).toSeq
    assert(sizes.sorted == Seq(1, 3, 3, 3), s"chunk sizes were $sizes") // 10 rows / 3
    // batched output identical to the scalar path, row by row
    val scalar = (1 to 10).map(i => graft.functions.HashEmbed.embed(
      s"t$i\ns$i\ntext $i", 16)) // concat_ws("\n", title, summary, text)
    val byId = out.map(r => r.getString(0) ->
      r.getSeq[Float](r.length - 1).toArray).toMap
    for (i <- 1 to 10)
      assert(byId(i.toString).sameElements(scalar(i - 1)), s"row $i diverged")
  }

  test("P7 embedBatch enforces the reference's 200-article endpoint cap") {
    intercept[IllegalArgumentException] {
      graft.functions.HashEmbed.embedBatch(Seq.fill(201)("x"), 16)
    }
  }
}

/** JVM-singleton spy for the batched-embedding seam: survives closure
  * serialization in local mode (the deserialized lambda resolves the
  * module, not a copied field).
  */
object EmbedSpy {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  val spy: (Seq[String], Int) => Seq[Array[Float]] = (texts, dim) => {
    seen.add(texts.size)
    graft.functions.HashEmbed.embedBatch(texts, dim)
  }
}
