package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located join technique the 100 TB plan leans on:
  * two fact tables bucketed (and sorted) by their join key join with
  * ZERO exchanges — the shuffle happened once at write time and is
  * amortized over every subsequent join/aggregate on that key. This
  * spec pins that the engine actually produces the exchange-free plan,
  * not just that bucketing is syntactically accepted.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("both sides bucketed by the join key → sort-merge join with zero " +
    "exchanges (only partition-local sorts); aggregate on the bucket " +
    "key also exchange-free") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // one file per bucket (repartition on the bucket key before the
      // write): with several files per bucket Spark cannot trust the
      // per-file sortBy order and re-inserts partition-local sorts
      (1L to 5000L).map(i => (i % 97, i)).toDF("k", "va")
        .repartition(8, col("k"))
        .write.format("parquet").bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_buck_a")
      (1L to 3000L).map(i => (i % 97, i * 10)).toDF("k", "vb")
        .repartition(8, col("k"))
        .write.format("parquet").bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_buck_b")

      val j = spark.table("graft_buck_a").join(spark.table("graft_buck_b"), "k")
      val pj = j.queryExecution.executedPlan.toString
      assert(pj.contains("SortMergeJoin"), s"expected SMJ:\n$pj")
      assert(countOf(pj, "Exchange") == 0,
        s"bucketed join must not shuffle:\n$pj")
      assert(pj.contains("Bucketed: true"), s"scan not bucket-aware:\n$pj")
      // Spark still inserts SMJ sorts, but they are partition-LOCAL
      // (`global=false` — no range exchange): the expensive half of a
      // sort-merge join (the shuffle) is gone; the local sorts are the
      // in-memory merge prep Spark keeps even over sortBy'd buckets
      assert(countOf(pj, "Sort [") == countOf(pj, "], false, 0"),
        s"a GLOBAL sort (range exchange) appeared:\n$pj")
      // result sanity: keys 1..96 + 0 present on both sides
      val expected = {
        val ca = (1L to 5000L).groupBy(_ % 97).view.mapValues(_.size)
        val cb = (1L to 3000L).groupBy(_ % 97).view.mapValues(_.size)
        ca.keys.filter(cb.keySet).map(k => ca(k).toLong * cb(k)).sum
      }
      assert(j.count() == expected)

      val agg = spark.table("graft_buck_a").groupBy("k").agg(sum("va"))
      val pa = agg.queryExecution.executedPlan.toString
      assert(countOf(pa, "Exchange") == 0,
        s"aggregate on the bucket key must not shuffle:\n$pa")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_buck_a")
      spark.sql("DROP TABLE IF EXISTS graft_buck_b")
    }
  }
}
