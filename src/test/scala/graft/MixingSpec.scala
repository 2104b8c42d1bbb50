package graft

import org.apache.spark.sql.functions._

/** Semantics of t15_mixing: temperature-scaled domain mixing with
  * α = 0.5 — rare languages are up-sampled relative to dominant ones,
  * the rarest keeps everything, and the post-sample distribution is
  * strictly flatter than the input. The oracle gate proves the numbers
  * are engine-portable; this spec pins WHAT the numbers mean.
  */
class MixingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("t15 mixing: rarest lang keeps all docs, rates invert counts, " +
    "and the sampled distribution is flatter than the input") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val in = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = TrainingQueries.queries("t15_mixing")(spark, sfDir)
      .groupBy(col("lang")).agg(count(lit(1)).as("k"), first(col("rate")).as("rate"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val rarest = in.minBy(_._2)._1
    val rateOf = out.map(t => t._1 -> t._3).toMap
    assert(rateOf(rarest) == 10000L, s"rarest lang '$rarest' must keep all docs")
    assert(out.map(t => t._2.toDouble == in(t._1).toDouble)
      .count(identity) >= 1) // rarest fully kept
    // rates must be anti-monotone in corpus counts
    for (Array((l1, _, r1), (l2, _, r2)) <-
           out.sortBy(t => in(t._1)).sliding(2) if in(l1) < in(l2))
      assert(r1 >= r2, s"rate($l1)=$r1 < rate($l2)=$r2 despite fewer docs")
    // flatter: the dominant lang's share must strictly drop
    val domIn = in.maxBy(_._2)
    val shareIn = domIn._2.toDouble / in.values.sum
    val shareOut = out.find(_._1 == domIn._1).get._2.toDouble / out.map(_._2).sum
    info(f"dominant '${domIn._1}' share: in $shareIn%.3f -> out $shareOut%.3f")
    assert(shareOut < shareIn, "mixing must flatten the distribution")
  }
}
