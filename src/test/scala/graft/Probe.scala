package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Temporary perf probe (verify-skill recipe): job census of the a9
  * pipeline at a given sf. Not part of the library.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    @volatile var jobs = 0
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val byDesc = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    var totalJobMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1; starts.put(js.jobId, js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.getOrDefault(je.jobId, je.time)
        totalJobMs += (je.time - s)
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b).getOrElse(0L)
        byDesc.merge(si.name.takeWhile(_ != '+').trim, (1, dur),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    })

    // warm
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    Thread.sleep(500); jobs = 0; totalJobMs = 0

    val t0 = System.nanoTime()
    val n = NewsPipeline.uiClusters(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"PROBE a9 rows=$n jobs=$jobs wall=$wall%.1fs jobtime=${totalJobMs / 1000.0}%.1fs avg=${totalJobMs / math.max(jobs, 1)}%dms")
    import scala.jdk.CollectionConverters._
    byDesc.asScala.toSeq.sortBy(-_._2._2).take(25).foreach { case (d, (c, ms)) =>
      println(f"PROBE   $c%4d jobs ${ms / 1000.0}%6.1fs  $d")
    }
    spark.stop()
  }
}
