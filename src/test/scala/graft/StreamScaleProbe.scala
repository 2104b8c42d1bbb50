package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale probe for the STREAMING family (VERDICT r10 #4 — the one
  * family ScaleProbe never touched): the five real-streaming shapes
  * (w9 inner / w15 full-outer interval joins, w18 left-semi, w20
  * session windows, w22 hopping windows) at 1× vs 10× event volume.
  *
  * The claim under test is the state-lifecycle design of
  * [[graft.streaming.IntervalStreamJoin]] / the watermarked aggs:
  * state is proportional to the WATERMARK HORIZON (events within
  * delay + match-interval of the frontier), never to stream length.
  * So the 10× corpus extends the TIME SPAN 10× at constant event rate
  * (ten copies of sf0.1's 30-day / 100 k-event table, each shifted by
  * c·span, ids offset — same per-hour density, same user population):
  *  - wall-clock should grow ≈ linearly (10× the micro-batches,
  *    same work per batch);
  *  - max state rows/bytes across all progress reports should stay
  *    ≈ FLAT — eviction keeps only the horizon in state.
  *
  * Both corpora are written as time-ordered chunk files (6 days per
  * file: 5 files at 1×, 50 at 10×) and read with maxFilesPerTrigger=1,
  * so the run IS the multi-micro-batch regime where the watermark
  * actually advances and evicts between batches — a single AvailableNow
  * batch would hold everything in state and prove nothing.
  *
  * Run: `sbt "Test/runMain graft.StreamScaleProbe"`; feeds PERF.md.
  */
object StreamScaleProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val base = "/tmp/graft_stream_scale"
    val chunks1x = 5
    val copies = 10
    buildCorpora(spark, base, chunks1x, copies)

    case class Res(wall: Double, batches: Int, rows: Long,
                   maxStateRows: Long, maxStateMb: Double)

    def run(name: String, dir: String)
           (mk: DataFrame => DataFrame): Res = {
      // same state sizing as the catalog entries
      val s = SparkHygiene.streamStateSession(spark, 8)
      val schema = s.read.parquet(dir).schema
      val ev = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val out = SparkHygiene.scratchDir(s"ssp_${name}_out")
      val ck = SparkHygiene.scratchDir(s"ssp_${name}_ck")
      val t0 = System.nanoTime()
      val q = mk(ev).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress.toSeq
      val maxRows =
        if (progs.isEmpty) 0L
        else progs.map(p => p.stateOperators.map(_.numRowsTotal).sum).max
      val maxMb =
        if (progs.isEmpty) 0.0
        else progs.map(p => p.stateOperators.map(_.memoryUsedBytes).sum).max / 1e6
      val rows = s.read.parquet(out).count()
      SparkHygiene.dropAllPersisted(spark)
      Res(wall, progs.length, rows, maxRows, maxMb)
    }

    def incidents(ev: DataFrame): DataFrame =
      ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("win_end"))
    def clicks(ev: DataFrame): DataFrame =
      ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts"))

    // the five catalog shapes, verbatim parameters
    val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "w9_interval_inner" -> (ev =>
        graft.streaming.IntervalStreamJoin.join(incidents(ev), clicks(ev),
          startCol = "win_start", endCol = "win_end", tsCol = "ts",
          slotWidthSec = 600L, maxLenSec = 600L, delay = "30 minutes")
          .select(col("error_id"), col("click_id"))),
      "w15_interval_full" -> (ev =>
        graft.streaming.IntervalStreamJoin.join(incidents(ev), clicks(ev),
          startCol = "win_start", endCol = "win_end", tsCol = "ts",
          slotWidthSec = 600L, maxLenSec = 600L, delay = "30 minutes",
          joinType = "full_outer")
          .select(col("error_id"), col("click_id"))),
      "w18_semi" -> { ev =>
        val errs = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("error_id"), col("ts"))
          .withWatermark("ts", "30 minutes")
        val cl = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("ts").as("cts"))
          .withWatermark("cts", "30 minutes")
        errs.join(cl,
          col("user_id") === col("cu") &&
            col("cts") > col("ts") &&
            col("cts") <= col("ts") + expr("INTERVAL 10 MINUTES"),
          "left_semi")
          .select(col("user_id"), col("error_id"))
      },
      "w20_session" -> (ev =>
        ev.withWatermark("ts", "30 minutes")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("sw.start").as("ss"), col("n_events"))),
      "w22_hopping" -> (ev =>
        ev.withWatermark("ts", "30 minutes")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("ws"), col("event_type"), col("n"))),
      // round-11 custom-state machines: state should stay flat too —
      // funnel state = open attempts + horizon buffer; as-of state =
      // one retained right row per key + horizon buffer (user
      // population is constant across copies here, so retained rows
      // must NOT grow with stream length)
      "w25_funnel" -> (ev =>
        graft.streaming.FunnelStream.funnel(
          ev.select(col("user_id"), col("ts"), col("event_id"),
              col("event_type"))
            .as(org.apache.spark.sql.Encoders.product[
              graft.streaming.FunnelStream.Ev]),
          timeoutSec = 1800L, watermarkDelay = "30 minutes").toDF),
      // round-12 3-way chained stream join: TWO state stores, each
      // horizon-bounded — the state-ratio claim must hold for the
      // chained multi-stateful pipeline, not just single joins
      "w29_3way" -> { ev =>
        val cl = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("cts"))
          .withWatermark("cts", "30 minutes")
        val er = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("eu"), col("event_id").as("error_id"),
            col("ts").as("ets"))
          .withWatermark("ets", "30 minutes")
        val pu = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
            col("ts").as("pts"))
          .withWatermark("pts", "30 minutes")
        cl.join(er,
            col("user_id") === col("eu") &&
              col("ets") > col("cts") &&
              col("ets") <= col("cts") + expr("INTERVAL 360 MINUTES"))
          // one event-time column per stream side (see w29's entry)
          .select(col("user_id"), col("click_id"), col("error_id"),
            col("ets"))
          .join(pu,
            col("user_id") === col("pu") &&
              col("pts") > col("ets") &&
              col("pts") <= col("ets") + expr("INTERVAL 360 MINUTES"))
          .select(col("click_id"), col("error_id"), col("purchase_id"))
      },
      // round-13 left-outer hop into a second stateful operator: the
      // join's state is horizon-bounded exactly as the inner form, and
      // the downstream windowed agg's state is window-count-bounded —
      // neither may grow with stream length
      "w30_outer_agg" -> { ev =>
        val cl = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("cts"))
          .withWatermark("cts", "30 minutes")
        val er = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("eu"), col("event_id").as("error_id"),
            col("ts").as("ets"))
          .withWatermark("ets", "30 minutes")
        cl.join(er,
            col("user_id") === col("eu") &&
              col("ets") > col("cts") &&
              col("ets") <= col("cts") + expr("INTERVAL 360 MINUTES"),
            "left_outer")
          .select(col("cts"), col("error_id"))
          .groupBy(window(col("cts"), "1 hour"),
            col("error_id").isNotNull.cast("int").as("has_error"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("ws"), col("has_error"), col("n"))
      },
      // round-13 agg→agg cascade: open hourly + open daily windows,
      // both watermark-bounded — the rollup chain must not accumulate
      // closed windows
      "w31_agg_chain" -> (ev =>
        ev.withWatermark("ts", "30 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_h"))
          .groupBy(window(window_time(col("window")), "1 day"),
            col("event_type"))
          .agg(sum(col("n_h")).as("n"))
          .select(col("window.start").as("ws"), col("event_type"), col("n"))),
      // round-13 THREE-operator chain: dedup-under-2×-delivery state
      // (ids within the watermark horizon) + open hourly + open daily
      // windows — the deepest chain must stay event-time bounded too
      "w32_dedup_rollup" -> { ev =>
        val once = ev.select(col("event_id"), col("ts"), col("event_type"))
        once.unionByName(once)
          .withWatermark("ts", "30 minutes")
          .dropDuplicatesWithinWatermark("event_id", "event_type")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_h"))
          .groupBy(window(window_time(col("window")), "1 day"),
            col("event_type"))
          .agg(sum(col("n_h")).as("n"))
          .select(col("window.start").as("ws"), col("event_type"), col("n"))
      },
      "w26_asof" -> (ev =>
        graft.streaming.AsofStream.asof(
          ev.filter(col("event_type").isin("click", "purchase"))
            .select(col("user_id"), col("ts"), col("event_id"),
              when(col("event_type") === "purchase", 1).otherwise(0)
                .as("kind"),
              when(col("event_type") === "click", col("value"))
                .otherwise(lit(0.0)).as("value"))
            .as(org.apache.spark.sql.Encoders.product[
              graft.streaming.AsofStream.Ev]),
          watermarkDelay = "30 minutes").toDF),

      // the transformWithState pair: state must be KEY-bounded (one
      // double / one timestamp+timer per user), so a 10× LONGER stream
      // over the same key population must hold state rows flat
      "w38_tws_records" -> { ev =>
        ev.sparkSession.conf.set(
          "spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        graft.streaming.RecordTracker.records(
          ev.select(col("event_id"), col("ts"), col("user_id"),
            col("value"))).toDF
      },
      "w39_tws_timeout" -> { ev =>
        ev.sparkSession.conf.set(
          "spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        graft.streaming.RecordTracker.inactivity(
          ev.select(col("event_id"), col("ts"), col("user_id"),
            col("value")),
          gap = "7 days", watermarkDelay = "30 minutes").toDF
      },
      // suppression state = one timestamp per DISTINCT (user, type)
      // key: the 10× corpus repeats the same key population over 10×
      // the span, so state rows must stay exactly flat (and the TTL —
      // far above the run — keeps all repeats suppressed)
      "w40_suppress" -> { ev =>
        ev.sparkSession.conf.set(
          "spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        graft.streaming.Suppress.firstPerKey(
          ev.select(col("event_id"), col("ts"), col("user_id"),
            col("event_type")),
          java.time.Duration.ofHours(6)).toDF
      })

    // SSP_ONLY=name1,name2 runs a subset (new-shape probes without
    // re-measuring the full committed table)
    val only = sys.env.get("SSP_ONLY").map(_.split(",").toSet)

    for ((name, mk) <- shapes if only.forall(_.contains(name))) {
      val r1 = run(name, s"$base/ev1x")(mk)
      val r10 = run(name, s"$base/ev10x")(mk)
      println(f"STREAMSCALE $name%-18s " +
        f"1x: wall=${r1.wall}%.1fs batches=${r1.batches} rows=${r1.rows} " +
        f"stateRows=${r1.maxStateRows} stateMB=${r1.maxStateMb}%.1f | " +
        f"10x: wall=${r10.wall}%.1fs batches=${r10.batches} rows=${r10.rows} " +
        f"stateRows=${r10.maxStateRows} stateMB=${r10.maxStateMb}%.1f | " +
        f"wall_ratio=${r10.wall / r1.wall}%.1f " +
        f"state_ratio=${
          if (r1.maxStateRows > 0) r10.maxStateRows.toDouble / r1.maxStateRows
          else -1.0}%.2f")
    }
    spark.stop()
  }

  /** Time-ordered chunked corpora: 1× = sf0.1 events in `chunks1x`
    * files; 10× = `copies` copies shifted by c·span (constant rate,
    * 10× span), 10× the files. Sequential chunk writes give the
    * FileStreamSource its arrival order.
    */
  private def buildCorpora(spark: SparkSession, base: String,
                           chunks1x: Int, copies: Int): Unit = {
    val dir1 = s"$base/ev1x"
    val dir10 = s"$base/ev10x"
    if (new java.io.File(s"$dir10/_done").exists()) return
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
    val b = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val lo = b.getTimestamp(0).getTime
    val hi = b.getTimestamp(1).getTime
    val spanMs = hi - lo + 1000L

    def writeChunks(dir: String, copyIdx: Int): Unit = {
      val shifted = ev
        .withColumn("event_id", col("event_id") + lit(copyIdx * 10000000L))
        .withColumn("ts",
          (col("ts").cast("double") + lit(copyIdx * (spanMs / 1000.0))).cast("timestamp"))
      for (i <- 0 until chunks1x) {
        val clo = lo / 1000.0 + copyIdx * (spanMs / 1000.0) + i * (spanMs / 1000.0 / chunks1x)
        val chi = clo + spanMs / 1000.0 / chunks1x
        shifted.filter(col("ts").cast("double") >= clo &&
            (col("ts").cast("double") < chi || lit(i == chunks1x - 1)))
          .coalesce(1).write.mode("append").parquet(dir)
      }
    }
    writeChunks(dir1, 0)
    for (c <- 0 until copies) writeChunks(dir10, c)
    new java.io.File(s"$dir10/_done").createNewFile()
    ()
  }
}
