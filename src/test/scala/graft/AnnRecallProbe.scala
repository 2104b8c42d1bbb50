package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.AnnSearch

/** Measurement harness: hyperplane ANN recall/candidate grid on the
  * sf0.001 fixture — reproduces the numbers behind AnnSearchSpec's
  * (tables=16, bits=7, flips=3) floor and PERF.md's round-6 ANN claim. */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    println(s"R6PROBE corpus=$n")
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val exact = broadcast(q).crossJoin(emb)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(VectorFns.dotProduct(col("qv"), col("embedding")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("vec_id"))
      .persist()
    val nExact = exact.count().toDouble

    for {
      (tables, bits, flips) <- Seq(
        (8, 6, 3), (8, 6, 4), (8, 6, 5), (10, 6, 3), (10, 6, 4),
        (12, 6, 3), (12, 7, 3), (12, 7, 4), (16, 7, 3), (16, 8, 4))
    } {
      val got = AnnSearch.hyperplaneTopK(emb, "vec_id", "embedding",
        q, "qid", "qv", k = 3, tables = tables, bits = bits, flips = flips)
      val hit = got.select(col("qid"), col("vec_id"))
        .join(exact, Seq("qid", "vec_id"), "left_semi").count()
      val recall = hit / nExact
      // DISTINCT candidates per query (what a scan would verify)
      val cand = AnnSearch.distinctCandidates(emb, "vec_id", "embedding",
        q, "qid", "qv", tables, bits, flips, 42L) / 20.0
      println(f"R6PROBE tables=$tables%2d bits=$bits flips=$flips " +
        f"recall=$recall%.3f cand/query=$cand%.1f of $n")
    }
    for {
      (kc, iters, nprobe) <- Seq(
        (16, 3, 2), (16, 3, 4), (32, 0, 4), (32, 3, 4), (32, 3, 8), (64, 3, 8))
    } {
      val got = AnnSearch.kmeansTopK(emb, "vec_id", "embedding",
        q, "qid", "qv", k = 3, nCentroids = kc, iters = iters, nprobe = nprobe)
      val hit = got.select(col("qid"), col("vec_id"))
        .join(exact, Seq("qid", "vec_id"), "left_semi").count()
      println(f"R6PROBE kmeans k=$kc%2d iters=$iters nprobe=$nprobe " +
        f"recall=${hit / nExact}%.3f scanfrac~${nprobe.toDouble / kc}%.2f")
    }
    exact.unpersist()
    spark.stop()
  }
}
