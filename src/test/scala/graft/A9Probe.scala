package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Measurement harness (feeds PERF.md's a9 scheduling-floor claim):
  * job census of the a9 pipeline — count + wall per call site over one
  * NewsPipeline.run. Run: `sbt "Test/runMain graft.A9Probe"`.
  */
object A9Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val starts = mutable.Map[Int, (String, Long)]()
    val agg = mutable.Map[String, (Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != ':'))
          .getOrElse("?")
        starts(j.jobId) = (site, j.time)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (site, t0) =>
          val (n, ms) = agg.getOrElse(site, (0, 0L))
          agg(site) = (n + 1, ms + (j.time - t0))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    NewsPipeline.uiClusters(spark, "/root/testdata/sf0.01").collect()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // drain the listener bus
    spark.sparkContext.removeSparkListener(listener)
    val total = agg.values.map(_._2).sum
    println(f"WALL ${wall}%.1f s; ${agg.values.map(_._1).sum} jobs, ${total / 1e3}%.1f s job time")
    agg.toSeq.sortBy(-_._2._2).take(15).foreach { case (site, (n, ms)) =>
      println(f"  $site%-40s n=$n%-4d ${ms / 1e3}%.2f s")
    }
  }
}
