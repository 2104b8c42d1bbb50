package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EditDistanceJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def strs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "s")

  private def fixture: (DataFrame, DataFrame) = {
    val a = strs(1L -> "spark engine", 2L -> "spark enginx",
      3L -> "flink runner", 4L -> "short")
    val b = strs(10L -> "spark engine", 11L -> "spark-engine",
      12L -> "completely other", 13L -> "shirt")
    (a, b)
  }

  private def crossQuery(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.crossJoin(b.select(col("id").as("jd"), col("s").as("t")))
      .filter(levenshtein(col("s"), col("t")) <= k)
      .select(col("id"), col("jd"))

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def unRewritten[T](f: => T): T = {
    spark.conf.set(graft.plans.EditDistanceJoinRewrite.ConfKey, "false")
    try f
    finally spark.conf.unset(graft.plans.EditDistanceJoinRewrite.ConfKey)
  }

  test("rewrites crossJoin + levenshtein filter into the segment " +
    "equi-join (no cartesian operator survives)") {
    val (a, b) = fixture
    val q = crossQuery(a, b, 2)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("__graft_ed"),
      s"expected PassJoin rewrite in:\n$optimized")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      s"expected no cartesian operator in:\n$physical")
  }

  test("rewritten results are identical to the cartesian plan, " +
    "including pair MULTIPLICITY under duplicate input rows") {
    val (a, b) = fixture
    assert(pairs(crossQuery(a, b, 2)) == unRewritten(pairs(crossQuery(a, b, 2))))
    // duplicate input rows: the cartesian emits one row per row
    // INSTANCE pair; a multi-segment match must not add more, a
    // collapsed dedup must not emit fewer
    val aDup = a.unionByName(a.filter(col("id") === 1L))
    val got = crossQuery(aDup, b, 2).groupBy("id", "jd").count()
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val want = unRewritten(
      crossQuery(aDup, b, 2).groupBy("id", "jd").count()
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap)
    assert(got == want)
    assert(want(1L -> 10L) == 2L) // the duplicated row really doubles
  }

  test("swapped-side predicate and '< k+1' / 'k >=' spellings rewrite too") {
    val (a, b) = fixture
    val br = b.select(col("id").as("jd"), col("s").as("t"))
    val swapped = a.crossJoin(br)
      .filter(levenshtein(col("t"), col("s")) <= 2).select(col("id"), col("jd"))
    assert(swapped.queryExecution.optimizedPlan.toString.contains("__graft_ed"))
    val lt = a.crossJoin(br)
      .filter(levenshtein(col("s"), col("t")) < 3).select(col("id"), col("jd"))
    assert(lt.queryExecution.optimizedPlan.toString.contains("__graft_ed"))
    assert(pairs(swapped) == unRewritten(pairs(swapped)))
    assert(pairs(lt) == pairs(swapped))
  }

  test("out-of-range k and extra-conjunct predicates stay correct; " +
    "k > MaxK is left un-rewritten") {
    val (a, b) = fixture
    val big = crossQuery(a, b, 9)
    assert(!big.queryExecution.optimizedPlan.toString.contains("__graft_ed"),
      "k beyond MaxK must not rewrite")
    // extra conjunct rides along and still filters
    val br = b.select(col("id").as("jd"), col("s").as("t"))
    val q = a.crossJoin(br)
      .filter(levenshtein(col("s"), col("t")) <= 2 && col("jd") =!= 10L)
      .select(col("id"), col("jd"))
    assert(q.queryExecution.optimizedPlan.toString.contains("__graft_ed"))
    assert(pairs(q) == unRewritten(pairs(q)))
    assert(!pairs(q).exists(_._2 == 10L))
  }

  test("strings of length 0..k (incl. empty) are preserved — empty " +
    "segments are legitimate witness keys (ADVICE r10)") {
    // for |s| <= k the even partition has empty segments, and the
    // pigeonhole witness can be exactly an empty one; without the
    // residual branch every pair involving an empty string was lost
    // and e.g. ('xy','ab') <= 2 vanished under the default-on rewrite
    val pool = Seq("", "x", "xy", "ab", "xyz", "xyzw", "abcde", "abcdef",
      "qqqqqqqq")
    val a = strs(pool.zipWithIndex.map { case (s, i) => (i.toLong, s) }: _*)
    val b = strs(pool.zipWithIndex.map { case (s, i) => (i + 100L, s) }: _*)
    for (k <- 1 to 4) {
      val q = crossQuery(a, b, k)
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_ed"),
        s"k=$k must still rewrite")
      val got = pairs(q)
      val want = unRewritten(pairs(crossQuery(a, b, k)))
      assert(got == want,
        s"k=$k mismatch: missing=${want -- got} extra=${got -- want}")
      assert(want.contains(0L -> 100L), "'' vs '' must match at every k")
      assert(want.contains(0L -> 101L), "'' vs 'x' must match at every k")
      if (k >= 2) assert(got.contains(2L -> 103L), "'xy' vs 'ab' at k>=2")
    }
  }

  test("property: rewrite agrees with the cartesian plan on a " +
    "pseudo-random small-alphabet corpus, k = 1 and k = 3") {
    var x = 987654321L
    def nextInt(n: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % n).toInt + n) % n
    }
    val rows = (1L to 40L).map { i =>
      val len = 5 + nextInt(10)
      i -> (0 until len).map(_ => "abc"(nextInt(3))).mkString
    }
    val a = strs(rows: _*)
    val b = strs(rows.map { case (i, s) => (i + 100L, s) }: _*)
    for (k <- Seq(1, 3)) {
      val got = pairs(crossQuery(a, b, k))
      val want = unRewritten(pairs(crossQuery(a, b, k)))
      assert(got == want, s"k=$k mismatch")
      assert(want.nonEmpty)
    }
  }
}
