package graft

import org.apache.spark.sql.functions._

/** d15 containment gram-length study (backs the PERF.md lesson and the
  * k=24 choice in Catalogs): winnowing selects MINIMUM hashes, so short
  * grams bias selections toward corpus-common text and the fp equi-join
  * goes hot — sum(df²) is the candidate-pair row count the join must
  * grind through. Run: sbt "Test/runMain graft.D15Probe".
  */
object D15Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").appName("d15probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val dups = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" qq zz near dup pad")).as("text"))
    val corpus = docs.unionByName(dups)

    for ((k, w) <- Seq((8, 4), (16, 8), (24, 8))) {
      val fps = graft.operators.Winnowing.fingerprints(corpus, "doc_id", "text", k, w)
        .select(col("doc_id"), col("fp")).distinct()
      fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .select(lit(k).as("k"), lit(w).as("w"), count(lit(1)).as("n_fps"),
          sum(col("df") * col("df")).as("sum_df2"), max(col("df")).as("max_df"))
        .show(false)
      val t0 = System.nanoTime()
      val pairs = graft.operators.Winnowing
        .containmentPairs(corpus, "doc_id", "text", k, w, tau = 0.5, maxDf = 1000L)
      val n = pairs.count()
      val planted = pairs.filter(col("b") === col("a") + 1000000L).count()
      println(f"k=$k%2d w=$w: $n%6d pairs ($planted/500 planted clone pairs) " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.2f s (two materializations)")
    }
    spark.stop()
  }
}
