package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ClusterTable, Clustering, Preprocess}
import graft.schemas.Schemas

/** Per-PHASE job census for the a9 micro-batch loop (guide §1.1): the
  * exact NewsPipeline.runBatches dataflow with a thread-local job
  * description set per phase — broadcast-exchange futures capture the
  * submitting thread's local properties, so each of the ~108 broadcast
  * jobs is attributed to the pipeline phase that spawned it. Answers
  * which phase owns the broadcast-job floor before touching it
  * (VERDICT r14 next-round #3).
  *
  *   sbt -batch "Test/runMain graft.A9PhaseCensus [sfDir]"
  */
object A9PhaseCensus {
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
        val phase = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("?")
        // LAST stage = the result stage, whose name carries the action's
        // callsite (broadcast futures show the future frame instead)
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
          .replaceAll("\\$anonfun\\$withThreadLocalCaptured\\$2 at CompletableFuture.java:1768",
            "broadcast-future")
        jobs.put(e.jobId,
          J(s"$phase | stages=${e.stageInfos.size} | ${site.take(80)}", e.time, -1L))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
    })

    def desc(s: String): Unit = spark.sparkContext.setJobDescription(s)

    def run(label: String): Double = {
      val t0 = System.nanoTime()
      val arts = NewsPipeline.syntheticArticles(Tables.documents(spark, sfDir))
      var table = ClusterTable.emptyTable(spark)
      var pool = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], Schemas.pool)
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        for (b <- 0 until NewsPipeline.Batches) {
          val raw = arts.filter(col("batch") === b).drop("grp", "batch")
          desc("prep")
          val prepped = Preprocess(raw, NewsPipeline.EmbedDim)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          desc("step")
          val step = Clustering.step(
            pool, prepped.select(col("id"), col("concat_embedding")))
          SparkHygiene.freeCheckpoint(pool)
          pool = step.pool
          desc("upsert+merge")
          val ups = ClusterTable.upsertRows(table, step.assignments, prepped,
            NewsPipeline.Clock)
          val merged = ClusterTable.merge(table, ups).localCheckpoint(eager = true)
          SparkHygiene.freeCheckpoint(table)
          desc("summarize")
          val updated = step.assignments.select(col("cluster_id").as("PK")).distinct()
          table = ClusterTable.summarizePass(merged, updated, NewsPipeline.Threshold)
            .localCheckpoint(eager = true)
          SparkHygiene.freeCheckpoint(merged)
          SparkHygiene.freeCheckpoint(step.assignments)
          prepped.unpersist()
        }
        desc("ui_query")
        ClusterTable.uiClusterList(table)
          .write.format("noop").mode("overwrite").save()
      } finally {
        desc(null)
        spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
      val s = (System.nanoTime() - t0) / 1e9
      SparkHygiene.dropAllPersisted(spark)
      println(f"[a9census] $label wall=$s%.2f s")
      s
    }
    run("cold")
    jobs.clear()
    val wall = run("warm")

    import scala.jdk.CollectionConverters._
    val done = jobs.values.asScala.filter(_.end > 0).toSeq
    println(f"[a9census] warm jobs=${done.size} " +
      f"job_wall_sum=${done.map(j => j.end - j.start).sum / 1e3}%.2f s " +
      f"(run wall $wall%.2f s)")
    done.groupBy(_.desc).map { case (d, js) =>
      (d, js.size, js.map(j => j.end - j.start).sum / 1e3,
        js.map(j => j.end - j.start).max / 1e3)
    }.toSeq.sortBy(-_._3).foreach { case (d, n, tot, mx) =>
      println(f"[a9census]   n=$n%3d total=$tot%7.2f s max=$mx%6.2f s  $d")
    }
    spark.stop()
  }
}
