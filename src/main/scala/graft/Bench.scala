package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every catalog query is fully materialized
  * through the noop datasource sink (a bare `count()` lets Catalyst
  * prune the projections under test — VERDICT r1 finding #7), plus the
  * end-to-end pipeline throughput in articles/s against BASELINE.md's
  * ≈25 articles/s envelope.
  *
  * Each query is measured TWICE: the first (cold) run pays page-cache /
  * codegen-cache state, the second (warm) run measures the plan. The
  * warm time is the headline `queries` entry — VERDICT r5 #1: the
  * single-run gate recorded d3 at 18.4 s while three warm runs measured
  * 2.4-2.5 s, i.e. the old number graded cache state, not plans. Cold
  * times are published alongside in `queries_cold`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def materialize(name: String): Double = {
      val sec = timed {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      // start every measured run without leftover caches/checkpoint
      // blocks: state surviving a previous run would distort later
      // numbers under memory pressure (cleanup time is deliberately
      // OUTSIDE the measurement)
      SparkHygiene.dropAllPersisted(spark)
      sec
    }

    // warm the JVM/session once on the cheapest query so the first
    // cold number isn't startup-dominated
    materialize("q1_agg")

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val cold = try materialize(name) catch { case NonFatal(_) => -1.0 }
      val warm = if (cold < 0) -1.0
        else try materialize(name) catch { case NonFatal(_) => -1.0 }
      (name, cold, warm)
    }
    val warmByName = results.map { case (n, _, w) => n -> w }.toMap

    // pipeline throughput: a9_ui_clusters runs the full 5-micro-batch
    // news pipeline over one article per documents row
    val articles = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val pipelineSec = warmByName.getOrElse("a9_ui_clusters", -1.0)
    val aps = if (pipelineSec > 0) articles / pipelineSec else -1.0

    // second pipeline figure: the SAME articles through the actual
    // Structured Streaming wrapper — file-drop source, AvailableNow,
    // offset checkpointing + versioned state on disk — so the articles/s
    // claim covers the streaming machinery (offset log, state
    // read/write per batch), not just the a9 driver loop.
    val streamSec = try runStreaming(spark, sfDir)
      catch { case NonFatal(_) => -1.0 }
    val streamAps = if (streamSec > 0) articles / streamSec else -1.0

    def jsonMap(vals: Seq[(String, Double)]): String =
      vals.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val qs = jsonMap(results.map { case (n, _, w) => n -> w })
    val qsCold = jsonMap(results.map { case (n, c, _) => n -> c })
    val total = results.map(_._3).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        f""""queries_cold":$qsCold,""" +
        f""""pipeline":{"articles":$articles,"seconds":$pipelineSec%.3f,"articles_per_sec":$aps%.1f},""" +
        f""""pipeline_streaming":{"articles":$articles,"seconds":$streamSec%.3f,"articles_per_sec":$streamAps%.1f},""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }

  /** One AvailableNow pass of the streaming wrapper over the a9 article
    * corpus dropped as one JSON file per micro-batch. Returns the
    * measured span = stream start → termination (file writes excluded);
    * the temp corpus/state dirs are deleted before returning.
    */
  private def runStreaming(spark: SparkSession, sfDir: String): Double = {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("bench_stream")
    try {
      val inDir = s"$tmp/in"
      val arts = NewsPipeline.syntheticArticles(
        spark.read.parquet(s"$sfDir/documents.parquet"))
      for (b <- 0 until NewsPipeline.Batches)
        arts.filter(col("batch") === b).drop("grp", "batch")
          .coalesce(1).write.mode("append").json(inDir)
      val schema = arts.drop("grp", "batch").schema
      val t0 = System.nanoTime()
      streaming.StreamingPipeline.start(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").json(inDir),
        s"$tmp/state", s"$tmp/ck",
        streaming.StreamingPipeline.Config(
          threshold = NewsPipeline.Threshold,
          embedDim = NewsPipeline.EmbedDim,
          clock = NewsPipeline.Clock))
        .awaitTermination()
      (System.nanoTime() - t0) / 1e9
    } finally {
      // close the walk stream, and never let cleanup failure mask the
      // real streaming error (r6 review)
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try {
        val walk = Files.walk(tmp)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      } catch { case NonFatal(e) =>
        System.err.println(s"[bench] stream temp cleanup failed: $e")
      }
    }
  }
}
