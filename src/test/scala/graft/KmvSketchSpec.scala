package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

/** KMV distinct-count sketch: bounded state, order/partitioning
  * independence, the exact (<k) branch, and estimator accuracy on a
  * cardinality far above k.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val TwoP60 = 1152921504606846976.0

  private def estimate(mins: Array[Long], k: Int): Double =
    if (mins.length < k) mins.length.toDouble
    else (k - 1).toDouble * TwoP60 / mins(k - 1).toDouble

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        .take(15), 16)

  test("sketch is sorted, distinct, capped at k, and partitioning-independent") {
    val k = 16
    val values = (1 to 5000).map(i => hash60(s"v$i"))
    def sketchOf(parts: Int): Array[Long] = {
      val df = spark.createDataset(values).repartition(parts).toDF("h")
      df.agg(KmvSketch(col("h"), k).as("m")).as[Array[Long]].head()
    }
    val s1 = sketchOf(1)
    val s7 = sketchOf(7)
    assert(s1.toSeq == s7.toSeq, "merge must be order/partitioning independent")
    assert(s1.length == k)
    assert(s1.toSeq == s1.toSeq.sorted && s1.distinct.length == s1.length)
    assert(s1.toSeq == values.distinct.sorted.take(k), "k smallest distinct hashes")
  }

  test("fewer than k distinct values: the sketch IS the exact set; " +
    "duplicates do not inflate it") {
    val k = 32
    val values = (1 to 10).flatMap(i => Seq.fill(20)(hash60(s"d$i")))
    val sk = spark.createDataset(values).toDF("h")
      .agg(KmvSketch(col("h"), k).as("m")).as[Array[Long]].head()
    assert(sk.length == 10)
    assert(estimate(sk, k) == 10.0)
  }

  test("estimator accuracy: within 3 standard errors at n >> k") {
    val k = 64
    val n = 20000
    val values = (1 to n).map(i => hash60(s"acc$i"))
    val sk = spark.createDataset(values).repartition(4).toDF("h")
      .agg(KmvSketch(col("h"), k).as("m")).as[Array[Long]].head()
    val est = estimate(sk, k)
    // KMV standard error ≈ n/sqrt(k−2); 3σ keeps the deterministic
    // fixture comfortably inside while still meaning something
    val sigma = n / math.sqrt(k - 2.0)
    assert(math.abs(est - n) < 3 * sigma,
      s"estimate $est vs true $n (3σ = ${3 * sigma})")
  }

  test("catalog t19 shape: per-group sketches agree with a driver-side replay") {
    val k = 8
    val rows = for {
      g <- Seq("a", "b"); i <- 1 to 200
    } yield (g, hash60(s"$g:$i"))
    val got = rows.toDF("g", "h").groupBy(col("g"))
      .agg(KmvSketch(col("h"), k).as("m"))
      .select(col("g"), col("m")).as[(String, Array[Long])]
      .collect().toMap
    for (g <- Seq("a", "b")) {
      val expect = rows.filter(_._1 == g).map(_._2).distinct.sorted.take(k)
      assert(got(g).toSeq == expect)
    }
  }
}
