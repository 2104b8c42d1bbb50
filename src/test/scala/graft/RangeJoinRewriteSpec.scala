package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def intervals: DataFrame = Seq(
    (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
    (2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00")), // 2 h — longer than a slot
    (3L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:00:01"))).toDF("iid", "s", "e")

  private def points: DataFrame = Seq(
    (20L, ts("2024-01-01 10:00:00")),
    (21L, ts("2024-01-01 10:09:59")),
    (22L, ts("2024-01-01 10:10:00")), // end-exclusive miss
    (23L, ts("2024-01-01 12:30:00")),
    (24L, ts("2024-01-02 00:00:00")),
    (25L, ts("2024-01-03 00:00:00"))).toDF("pid", "ts")

  private def crossQuery(iv: DataFrame, pt: DataFrame): DataFrame =
    iv.crossJoin(pt)
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
      .select(col("iid"), col("pid"))

  private def withRuleOff[T](f: => T): T = {
    spark.conf.set(graft.plans.RangeJoinRewrite.ConfKey, "false")
    try f finally spark.conf.unset(graft.plans.RangeJoinRewrite.ConfKey)
  }

  test("rewrites crossJoin + range sandwich into a slot equi-join") {
    val q = crossQuery(intervals, points)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("__graft_slot"), s"expected slot rewrite in:\n$optimized")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      s"expected no cartesian operator in:\n$physical")
  }

  test("rewritten results equal the cartesian plan (incl. multi-slot intervals)") {
    val got = crossQuery(intervals, points).as[(Long, Long)].collect().toSet
    val want = withRuleOff(crossQuery(intervals, points).as[(Long, Long)].collect().toSet)
    assert(got == want)
    assert(got == Set((1L, 20L), (1L, 21L), (2L, 23L), (3L, 24L)))
  }

  test("each qualifying pair is emitted exactly once") {
    val rows = crossQuery(intervals, points).collect()
    assert(rows.length == rows.distinct.length)
  }

  test("property: agrees with the cartesian plan on random integral ranges") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 0 until 5) {
      val iv = (0 until 40).map { i =>
        val s = rnd.nextInt(100000).toLong
        (i.toLong, s, s + rnd.nextInt(20000).toLong)
      }.toDF("iid", "s", "e")
      val pt = (0 until 60).map(i => (100L + i, rnd.nextInt(120000).toLong)).toDF("pid", "p")
      def q = iv.crossJoin(pt).filter(col("p") >= col("s") && col("p") < col("e"))
        .select(col("iid"), col("pid"))
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_slot"),
        s"trial $trial: rewrite did not fire")
      val got = q.as[(Long, Long)].collect().toSet
      val want = withRuleOff(q.as[(Long, Long)].collect().toSet)
      assert(got == want, s"trial $trial: missing=${want -- got} extra=${got -- want}")
    }
  }

  test("no rewrite with an equi conjunct, an explicit hint, or when disabled") {
    val ivK = intervals.withColumn("k", col("iid") % 2)
    val ptK = points.withColumn("k", col("pid") % 2)
    val equi = ivK.join(ptK, Seq("k"))
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
    assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_slot"))

    val hinted = broadcast(intervals).crossJoin(points)
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
    assert(!hinted.queryExecution.optimizedPlan.toString.contains("__graft_slot"))

    withRuleOff {
      val off = crossQuery(intervals, points).queryExecution.optimizedPlan.toString
      assert(!off.contains("__graft_slot"))
    }
  }

  test("one-sided bounds are left untouched (no sandwich, no rewrite)") {
    val q = intervals.crossJoin(points).filter(col("ts") >= col("s"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("__graft_slot"))
  }

  test("null bounds and null points drop out exactly like the cartesian plan") {
    val iv = Seq((1L, Some(10L), Some(20L)), (2L, None, Some(30L)), (3L, Some(5L), None))
      .toDF("iid", "s", "e")
    val pt = Seq((20L, Some(15L)), (21L, None)).toDF("pid", "p")
    def q = iv.crossJoin(pt).filter(col("p") >= col("s") && col("p") < col("e"))
      .select(col("iid"), col("pid"))
    assert(q.queryExecution.optimizedPlan.toString.contains("__graft_slot"))
    val got = q.as[(Long, Long)].collect().toSet
    val want = withRuleOff(q.as[(Long, Long)].collect().toSet)
    assert(got == want && got == Set((1L, 20L)))
  }
}
