package graft

import graft.operators.SpanDedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], gramLen: Int, minSpan: Int,
                    maxGramDf: Option[Long] = None): Map[(Long, Long), Long] =
    SpanDedup.selfPairs(docs.toDF("id", "text"), "id", "text",
        gramLen, minSpan, maxGramDf)
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap

  test("a copied segment is reported at its exact token length, at any offset") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10 shared tokens
    val docs = Seq(
      1L -> s"$shared u1 u2 u3",
      2L -> s"w1 w2 w3 w4 w5 $shared") // different offset → one diagonal
    val got = spans(docs, gramLen = 3, minSpan = 3)
    assert(got == Map((1L, 2L) -> 10L))
  }

  test("disjoint shared islands report the LONGEST run, not the sum") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ")  // island 1: 8 tokens
    val b = (1 to 5).map(i => s"b$i").mkString(" ")  // island 2: 5 tokens
    val docs = Seq(
      1L -> s"$a x1 x2 $b",
      2L -> s"$a y1 y2 y3 $b") // different gap length → separate diagonals
    val got = spans(docs, gramLen = 3, minSpan = 3)
    assert(got == Map((1L, 2L) -> 8L))
  }

  test("pairs below minSpan are dropped; unrelated docs never pair") {
    val docs = Seq(
      1L -> "c1 c2 c3 c4 p1 p2 p3",
      2L -> "c1 c2 c3 c4 q1 q2 q3", // shared span 4
      3L -> "z1 z2 z3 z4 z5 z6 z7")
    assert(spans(docs, gramLen = 3, minSpan = 5) == Map.empty)
    assert(spans(docs, gramLen = 3, minSpan = 4) == Map((1L, 2L) -> 4L))
  }

  test("maxGramDf drops spans made only of boilerplate grams") {
    val boiler = (1 to 6).map(i => s"bp$i").mkString(" ")
    val docs = Seq( // the boilerplate line appears in ALL four docs
      1L -> s"$boiler m1 m2 m3",
      2L -> s"$boiler m4 m5 m6",
      3L -> s"$boiler m7 m8 m9",
      4L -> s"$boiler n1 n2 n3")
    val lossless = spans(docs, gramLen = 3, minSpan = 6)
    assert(lossless.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(lossless.values.forall(_ == 6L))
    // cap df at 3: every boilerplate gram has df 4 → no candidates left
    assert(spans(docs, gramLen = 3, minSpan = 6, maxGramDf = Some(3L)) == Map.empty)
  }

  test("short documents (fewer tokens than gramLen) fall back to whole-doc grams") {
    val docs = Seq(1L -> "tiny doc", 2L -> "tiny doc", 3L -> "other text")
    // one clamped gram each; identical docs match with run 1 → span = 1 + gramLen - 1
    val got = spans(docs, gramLen = 5, minSpan = 5)
    assert(got == Map((1L, 2L) -> 5L))
  }
}
