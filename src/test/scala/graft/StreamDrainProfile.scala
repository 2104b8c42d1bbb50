package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-phase anatomy of ONE representative catalog streaming drain
  * (VERDICT r14 #7): the w22-shaped hopping-window drain — eventsStream
  * construct, query start, per-micro-batch durationMs breakdown from
  * QueryProgressEvents (offset log, planning, addBatch, commit, state
  * store), termination, sink read-back + presentation sort. Puts
  * numbers on the "irreducible Structured Streaming machinery" claim
  * instead of asserting it.
  *
  *   sbt -batch "Test/runMain graft.StreamDrainProfile [sfDir] [draws]"
  */
object StreamDrainProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val draws = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    def draw(label: String): Unit = {
      val tC0 = System.nanoTime()
      val s = SparkHygiene.streamStateSession(spark, 8)
      val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val dur = p.durationMs
          import scala.jdk.CollectionConverters._
          val durStr = dur.asScala.toSeq.sortBy(-_._2)
            .map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
          val state = Option(p.stateOperators).toSeq.flatten.map { so =>
            s"commit=${so.commitTimeMs}ms rows=${so.numRowsTotal}"
          }.mkString(" | ")
          progress.add(s"batch=${p.batchId} rows=${p.numInputRows} " +
            s"[$durStr] state($state)")
        }
      }
      s.streams.addListener(listener)
      try {
        val agg = Tables.eventsStream(s, sfDir)
          .withWatermark("ts", "30 minutes")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value").cast("decimal(18,6)")), 4)
              .cast("double").as("total_value"))
          .select(col("window.start").as("ws"), col("window.end").as("we"),
            col("event_type"), col("n"), col("total_value"))
        val out = SparkHygiene.scratchDir("wdp_out")
        val ck = SparkHygiene.scratchDir("wdp_ck")
        val constructSec = (System.nanoTime() - tC0) / 1e9

        val tS0 = System.nanoTime()
        val q = agg.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        val startedSec = (System.nanoTime() - tS0) / 1e9
        val tD0 = System.nanoTime()
        q.awaitTermination()
        val drainSec = (System.nanoTime() - tD0) / 1e9

        val tR0 = System.nanoTime()
        val cut = Tables.events(s, sfDir).agg(
          (max(col("ts")) - expr("INTERVAL 30 MINUTES")
            - expr("INTERVAL 10 SECONDS")).as("cut"))
        s.read.parquet(out)
          .crossJoin(broadcast(cut))
          .filter(col("we") < col("cut"))
          .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("win_start"), col("event_type"))
          .write.format("noop").mode("overwrite").save()
        val readbackSec = (System.nanoTime() - tR0) / 1e9

        println(f"[drainprof] $label construct=$constructSec%.2f " +
          f"start_call=$startedSec%.2f drain=$drainSec%.2f " +
          f"readback+sort=$readbackSec%.2f s " +
          f"total=${constructSec + startedSec + drainSec + readbackSec}%.2f s")
        progress.forEach(l => println(s"[drainprof]   $l"))
      } finally s.streams.removeListener(listener)
      SparkHygiene.dropAllPersisted(spark)
    }

    for (i <- 0 until draws) draw(s"draw$i")
    spark.stop()
  }
}
