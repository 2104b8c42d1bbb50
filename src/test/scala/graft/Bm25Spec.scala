package graft

import graft.operators.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana"),
    (2L, "apple apple banana"),
    (3L, "cherry"),
    (4L, "apple")).toDF("doc_id", "text")

  test("single-term ranking follows the hand-computed BM25 order " +
    "(tf up, dl down) with doc-id tie-break") {
    val q = Seq((1L, "apple")).toDF("qid", "qtext")
    // d4: tf=1, dl=1 → 2.2/1.75 = 1.2571…; d2: tf=2, dl=3 → 4.4/3.65 =
    // 1.2054…; d1: tf=1, dl=2 → below both. d3 never scores.
    val got = Bm25.topK(corpus, "doc_id", "text", q, "qid", "qtext", k = 10)
      .orderBy("rk").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(4L, 2L, 1L))
  }

  test("ln idf mode agrees with the rational mode on single-term " +
    "rankings (both monotone in df) and scores stay positive") {
    val q = Seq((1L, "apple"), (2L, "banana")).toDF("qid", "qtext")
    def ranking(mode: String) =
      Bm25.topK(corpus, "doc_id", "text", q, "qid", "qtext", k = 10,
          idfMode = mode)
        .orderBy("qid", "rk")
        .select("qid", "doc_id").as[(Long, Long)].collect().toSeq
    assert(ranking("rational") == ranking("ln"))
    val scores = Bm25.topK(corpus, "doc_id", "text", q, "qid", "qtext",
        k = 10, idfMode = "ln")
      .select("score").as[Double].collect()
    assert(scores.forall(_ > 0))
  }

  test("multi-term scores sum per (query, doc): a doc matching both " +
    "terms outranks one matching either alone at equal length") {
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple cherry"),
      (3L, "banana cherry"),
      (4L, "date fig")).toDF("doc_id", "text")
    val q = Seq((1L, "apple banana")).toDF("qid", "qtext")
    val top = Bm25.topK(docs, "doc_id", "text", q, "qid", "qtext", k = 10)
      .orderBy("rk").select("doc_id").as[Long].collect().toSeq
    assert(top.head == 1L)
    assert(top.toSet == Set(1L, 2L, 3L)) // no-match doc never appears
  }
}
