package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level attribution for the a9 pipeline (guide §1.1 empirical
  * loop with the UI disabled): a listener records every job's wall
  * span and description; one warm a9 run prints jobs grouped by
  * description with count / total / max, plus the whole-run wall.
  * Answers "where do the ~18 s go" — planning-vs-jobs, which pipeline
  * stage, how many jobs per micro-batch.
  *
  *   sbt -batch "Test/runMain graft.A9JobProfile [sfDir]"
  */
object A9JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    final case class J(desc: String, start: Long, var end: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the first stage's name carries the call site (e.g.
        // "localCheckpoint at Clustering.scala:253") — the cheapest
        // attribution that survives spark.ui.enabled=false
        val d = e.stageInfos.headOption.map(_.name).getOrElse("?")
        jobs.put(e.jobId, J(d, e.time, -1L))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
    })

    def run(label: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("a9_ui_clusters")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      SparkHygiene.dropAllPersisted(spark)
      println(f"[a9profile] $label wall=$s%.2f s")
      s
    }
    run("cold")
    jobs.clear()
    val wall = run("warm")

    import scala.jdk.CollectionConverters._
    val done = jobs.values.asScala.filter(_.end > 0).toSeq
    val byDesc = done.groupBy(_.desc).map { case (d, js) =>
      (d, js.size, js.map(j => j.end - j.start).sum / 1e3,
        js.map(j => j.end - j.start).max / 1e3)
    }.toSeq.sortBy(-_._3)
    println(f"[a9profile] warm jobs=${done.size} " +
      f"job_wall_sum=${done.map(j => j.end - j.start).sum / 1e3}%.2f s " +
      f"(run wall $wall%.2f s; sum > wall means overlap)")
    byDesc.foreach { case (d, n, tot, mx) =>
      println(f"[a9profile]   n=$n%3d total=$tot%7.2f s max=$mx%6.2f s  $d")
    }
    spark.stop()
  }
}
