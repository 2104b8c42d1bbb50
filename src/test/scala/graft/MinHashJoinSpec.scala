package graft

import graft.operators.MinHashJoin

class MinHashJoinSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra"),
    (3L, "one two three four five six seven eight nine ten"))
    .toDF("doc_id", "text")

  test("banded candidates surface planted near-dups, not dissimilar docs") {
    val pairs = MinHashJoin.selfPairs(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("identical docs collide in every band (pair emitted exactly once)") {
    val dup = Seq((1L, "same words here"), (2L, "same words here"))
      .toDF("doc_id", "text")
    val rows = MinHashJoin.selfPairs(dup, "doc_id", "text")
      .as[(Long, Long)].collect()
    // the first-agreeing-band predicate collapses the 4 band hits
    // map-side — no distinct() exchange exists in the plan (PlanSpec)
    assert(rows.toSeq == Seq((1L, 2L)))
  }

  test("hashes must split evenly into bands") {
    intercept[IllegalArgumentException] {
      MinHashJoin.selfPairs(corpus, "doc_id", "text", hashes = 12, bands = 5)
    }
  }
}
