package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure-first probe for a g6_hits candidate (guide §1.2): HITS
  * currently eagerly localCheckpoints BOTH frames of every round — 2
  * driver actions per round. Candidate: checkpoint only `hub` per round
  * and let the round's `auth` subtree stay lazy inside it (plan depth
  * still O(1) in rounds: each hub nests ONE un-checkpointed auth over
  * the PREVIOUS checkpointed hub). Risk, and why this must be measured
  * rather than assumed: normalize() references its input twice (raw +
  * the total aggregate) and the final output joins hub with auth, so an
  * un-checkpointed auth is recomputed per consumer — the d2/r14 lesson
  * says exchange reuse dedups only the shuffle WRITE.
  *
  * Interleaved A/B draws on one JVM, g6's exact edge set and rounds;
  * rows asserted identical between variants every draw.
  *
  *   sbt -batch "Test/runMain graft.HitsFuseProbe [sfDir] [draws]"
  */
object HitsFuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val draws = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    def edges: DataFrame = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("src"),
        (col("l_suppkey") + lit(1000000000L)).as("dst"))

    val scale = 1000000000L
    val rounds = 2

    // variant: Hits.runWithRelease body with the per-round auth
    // checkpoint removed (hub still checkpoints — lineage stays bounded)
    def fused(): DataFrame = {
      val e = edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .distinct()
        .repartition(col("src"))
        .persist()
      e.count()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .persist()
      nodes.count()
      def normalize(raw: DataFrame, valCol: String): DataFrame = {
        val total = raw.agg(sum(col(valCol)).as("__tot"))
        raw.crossJoin(broadcast(total))
          .select(col("node"),
            expr(s"$valCol div greatest(__tot div $scale, 1)").as(valCol))
      }
      def full(scores: DataFrame, valCol: String): DataFrame =
        nodes.join(scores, Seq("node"), "left_outer")
          .select(col("node"), coalesce(col(valCol), lit(0L)).as(valCol))
      var hub = nodes.select(col("node"), lit(scale).as("hub"))
      var auth = nodes.select(col("node"), lit(0L).as("auth"))
      for (r <- 1 to rounds) {
        val prevHub = hub
        auth = full(normalize(
          e.join(hub, col("src") === col("node"))
            .groupBy(col("dst")).agg(sum(col("hub")).as("auth"))
            .withColumnRenamed("dst", "node"), "auth"), "auth")
        hub = full(normalize(
          e.join(auth, col("dst") === col("node"))
            .groupBy(col("src")).agg(sum(col("auth")).as("hub"))
            .withColumnRenamed("src", "node"), "hub"), "hub")
          .localCheckpoint(true)
        // the LAZY final auth still references the last round's prevHub
        // checkpoint — a real fusion must keep it alive until the output
        // is consumed (an extra round of pinned blocks, a cost the
        // current design does not pay)
        if (r < rounds) graft.SparkHygiene.freeCheckpoint(prevHub)
      }
      hub.join(auth, Seq("node"))
        .select(col("node"), col("hub"), col("auth"))
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    var curRows: Long = -1
    var fusedRows: Long = -1
    def drawA(): Unit = {
      jobs.set(0)
      val s = timed {
        val df = graft.operators.Hits.run(edges, "src", "dst", rounds)
          .orderBy(col("node"))
        curRows = df.count()
        df.write.format("noop").mode("overwrite").save()
      }
      SparkHygiene.dropAllPersisted(spark)
      println(f"[hitsfuse]   current wall=$s%6.2f s jobs=${jobs.get()} rows=$curRows")
    }
    def drawB(): Unit = {
      jobs.set(0)
      val s = timed {
        val df = fused().orderBy(col("node"))
        fusedRows = df.count()
        df.write.format("noop").mode("overwrite").save()
      }
      SparkHygiene.dropAllPersisted(spark)
      println(f"[hitsfuse]     fused wall=$s%6.2f s jobs=${jobs.get()} rows=$fusedRows")
    }

    // parity once, eagerly (sorted collect compare)
    val a = graft.operators.Hits.run(edges, "src", "dst", rounds)
      .orderBy(col("node")).collect().toSeq
    SparkHygiene.dropAllPersisted(spark)
    val b = fused().orderBy(col("node")).collect().toSeq
    SparkHygiene.dropAllPersisted(spark)
    require(a == b, s"fused HITS diverged: ${a.size} vs ${b.size} rows")
    println(s"[hitsfuse] parity OK over ${a.size} rows")

    drawA(); drawB() // warmup pair
    for (_ <- 0 until draws) { drawA(); drawB() }
    spark.stop()
  }
}
