package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashEmbed
import graft.operators.Clustering

/** Clusterer scale probe (throwaway; backs PERF.md §scale — VERDICT r9
  * task #4): the one family the r9 ScaleProbe skipped. Runs ONE
  * `Clustering.step` micro-batch (1 000 articles, BandJoin) against pool
  * states of 10k / 50k / 100k entries and measures the per-batch wall.
  *
  * The design claim under test (`Clustering.scala` touched-pool split):
  * only edge-adjacent pool entries enter the component search and merge
  * regroup; the untouched pool streams through. Per-batch cost should
  * therefore be O(batch + neighbors) plus the irreducible O(pool)
  * stream-through of writing the next state — so the probe also times a
  * bare pool noop-write at each size to separate "step overhead" from
  * "state volume you'd pay just copying the state".
  *
  * Pool centroids and batch embeddings are HashEmbed vectors of distinct
  * synthetic texts (near-orthogonal — the common no-edge case); every
  * 10th batch article reuses a pool text spread across the whole pool,
  * so ~100 edges/merges per step keep the touched path non-vacuous.
  */
object ClustererScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val batchSize = 1000L

    def poolPath(n: Long) = s"/tmp/graft_cluster_pool_$n"
    def buildPool(n: Long): Unit = {
      if (new java.io.File(s"${poolPath(n)}/_SUCCESS").exists()) return
      spark.range(1, n + 1)
        .select(
          col("id").as("seq"),
          Clustering.clusterIdCol(concat(lit("p"), col("id").cast("string")))
            .as("cluster_id"),
          array(concat(lit("p"), col("id").cast("string"))).as("article_ids"),
          lit(1L).as("n_articles"),
          lit(false).as("is_cluster"),
          HashEmbed.embedColumn(concat(lit("pooldoc "), col("id").cast("string")))
            .as("centroid"))
        .write.mode("overwrite").parquet(poolPath(n))
    }

    def batchDf(poolN: Long): DataFrame = {
      // every 10th article duplicates a pool text (distance 0 ≤ eps →
      // guaranteed edge), targets spread across the full pool range
      val target = (col("id") * 97L) % poolN + 1L
      spark.range(0, batchSize).select(
        concat(lit("b"), col("id").cast("string")).as("id"),
        when(col("id") % 10 === 0,
            HashEmbed.embedColumn(concat(lit("pooldoc "), target.cast("string"))))
          .otherwise(
            HashEmbed.embedColumn(concat(lit("batchdoc "), col("id").cast("string"))))
          .as("concat_embedding"))
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // JVM warmup on a non-measured size
    buildPool(1000)
    val warmRes = Clustering.step(spark.read.parquet(poolPath(1000)),
      batchDf(1000), Clustering.Config(strategy = Clustering.BandJoin))
    warmRes.pool.write.format("noop").mode("overwrite").save()
    warmRes.assignments.count()
    SparkHygiene.dropAllPersisted(spark)

    for (n <- Seq(10000L, 50000L, 100000L)) {
      buildPool(n)
      val pool = spark.read.parquet(poolPath(n))
      // irreducible state-volume cost: stream the pool through unchanged
      val copySec = timed {
        pool.write.format("noop").mode("overwrite").save()
      }
      // two measured draws, min wins (±15-20% box noise, PERF.md)
      val draws = (1 to 2).map { _ =>
        var nMerged = -1L
        val sec = timed {
          val res = Clustering.step(pool, batchDf(n),
            Clustering.Config(strategy = Clustering.BandJoin))
          res.pool.write.format("noop").mode("overwrite").save()
          nMerged = res.assignments.filter(col("cluster_size") > 1).count()
        }
        SparkHygiene.dropAllPersisted(spark)
        (sec, nMerged)
      }
      val best = draws.map(_._1).min
      println(f"CLUSTER_SCALE pool=$n%6d batch=$batchSize " +
        f"step=${best}%.2fs (draws ${draws.map(d => f"${d._1}%.2f").mkString("/")}) " +
        f"pool_copy=${copySec}%.2fs merged_assignments=${draws.head._2}")
    }
    spark.stop()
  }
}
