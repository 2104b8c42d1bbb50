package graft

import org.apache.spark.sql.functions._

import graft.operators.MergeInto

class MergeIntoSpec extends SparkSpec {

  import spark.implicits._

  private def target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "price")

  private def merge(delta: org.apache.spark.sql.DataFrame) =
    MergeInto(target, delta, key = "k",
      deleteWhen = col("op") === "D",
      updateCols = Seq("k" -> col("k"), "name" -> col("name"),
        "price" -> col("new_price")),
      insertCols = Seq("k" -> col("k"), "name" -> col("d_name"),
        "price" -> col("new_price")),
      tag = Some("action"))

  test("update rewrites matched, delete drops, insert adds unmatched") {
    val delta = Seq((2L, "B", "U", 21.0), (3L, "C", "D", 0.0),
      (9L, "z", "U", 99.0)).toDF("k", "d_name", "op", "new_price")
    val out = merge(delta).orderBy("k")
      .as[(Long, String, Double, String)].collect.toSeq
    assert(out === Seq(
      (1L, "a", 10.0, "kept"),      // untouched
      (2L, "b", 21.0, "updated"),   // target name wins, delta price wins
      (9L, "z", 99.0, "inserted"))) // k=3 deleted
  }

  test("empty delta is the identity; delete of an unmatched key is a no-op") {
    val empty = Seq.empty[(Long, String, String, Double)]
      .toDF("k", "d_name", "op", "new_price")
    assert(merge(empty).orderBy("k").drop("action").collect.toSeq ===
      target.orderBy("k").collect.toSeq)
    val ghostDelete = Seq((42L, "x", "D", 0.0))
      .toDF("k", "d_name", "op", "new_price")
    assert(merge(ghostDelete).count === 3)
  }

  test("a delta row whose key is missing inserts even when other rows match") {
    val delta = Seq((1L, "A", "U", 11.0), (7L, "n", "U", 70.0))
      .toDF("k", "d_name", "op", "new_price")
    val byAction = merge(delta).groupBy("action").count
      .as[(String, Long)].collect.toMap
    assert(byAction === Map("kept" -> 2L, "updated" -> 1L, "inserted" -> 1L))
  }
}
