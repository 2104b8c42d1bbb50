package graft

import graft.operators.SegmentDedup

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  test("segments cut at fixed token boundaries and keep the partial tail") {
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
    val segs = SegmentDedup.segments(df, "id", "text", segLen = 2)
      .as[(Long, String)].collect().map(_._2).toSet
    assert(segs == Set("a b", "c d", "e"))
  }

  test("a segment repeated WITHIN one doc counts once toward df") {
    // "x y" appears twice in doc 1 but only doc 1 contains it → df = 1,
    // so it must NOT be boilerplate at minDf = 2
    val df = Seq(
      (1L, "x y x y"),
      (2L, "p q r s")).toDF("id", "text")
    val stats = SegmentDedup.stats(df, "id", "text", segLen = 2, minDf = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(stats == Map(1L -> ((1L, 0L, 0.0)), 2L -> ((2L, 0L, 0.0))))
  }

  test("segments shared across docs are flagged; ratio reflects the mix") {
    val df = Seq(
      (1L, "c c c c u u"), // shares "c c c c"→segments "c c","c c"→distinct "c c"
      (2L, "c c v v"),     // "c c" shared, "v v" unique
      (3L, "w w w w")).toDF("id", "text")
    val stats = SegmentDedup.stats(df, "id", "text", segLen = 2, minDf = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // doc 1: distinct segments {"c c", "u u"}; "c c" df=2 → 1 of 2
    assert(stats(1L) == ((2L, 1L, 0.5)))
    assert(stats(2L) == ((2L, 1L, 0.5)))
    assert(stats(3L) == ((1L, 0L, 0.0)))
  }

  test("digestKey exchanges md5 digests but the statistics are identical") {
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 20).map(i => s"t$i")
    val docs = (0L until 30L).map { i =>
      val shared = "b1 b2 b3 b4 b5" // planted boilerplate in every 3rd doc
      val own = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, if (i % 3 == 0) s"$shared $own" else own)
    }.toDF("id", "text")
    def rows(digest: Boolean) =
      SegmentDedup.stats(docs, "id", "text", segLen = 5, minDf = 2, digestKey = digest)
        .as[(Long, Long, Long, Double)].collect().toSet
    val raw = rows(digest = false)
    val dig = rows(digest = true)
    assert(dig == raw)
    assert(raw.exists(_._3 > 0)) // planted boilerplate makes it non-vacuous
  }

  test("strip removes shared segments and reassembles kept ones in order") {
    val df = Seq(
      (1L, "c c u u c c z z"), // "c c" at positions 0 AND 2 (within-doc repeat)
      (2L, "c c v v"),
      (3L, "w w q q")).toDF("id", "text")
    val out = SegmentDedup.strip(df, "id", "text", segLen = 2, maxDf = 1)
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // "c c" df=2 (docs 1,2) → dropped EVERYWHERE, incl. both copies in
    // doc 1; kept segments rejoin in original position order
    assert(out(1L) == (("u u z z", 2L, 4L)))
    assert(out(2L) == (("v v", 1L, 2L)))
    assert(out(3L) == (("w w q q", 2L, 2L)))
  }

  test("strip keeps a fully-boilerplate doc as an empty row") {
    val df = Seq(
      (1L, "c c"),
      (2L, "c c"),
      (3L, "a b")).toDF("id", "text")
    val out = SegmentDedup.strip(df, "id", "text", segLen = 2, maxDf = 1)
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // no doc silently dropped
    assert(out(1L) == (("", 0L, 1L)))
    assert(out(2L) == (("", 0L, 1L)))
  }

  test("strip digestKey path is result-identical to raw segment keys") {
    val docs = (0L until 20L).map { i =>
      val shared = "b1 b2 b3 b4"
      val own = (0 until 8).map(j => s"w${i}_$j").mkString(" ")
      (i, if (i % 2 == 0) s"$shared $own" else own)
    }.toDF("id", "text")
    def rows(digest: Boolean) =
      SegmentDedup.strip(docs, "id", "text", segLen = 4, maxDf = 1, digestKey = digest)
        .as[(Long, String, Long, Long)].collect().toSet
    assert(rows(digest = true) == rows(digest = false))
  }
}
