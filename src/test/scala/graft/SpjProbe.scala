package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B: the storage-partitioned join (co-bucket-clustered snapshot
  * tables through [[graft.sources.v2.SnapshotCatalog]], zero exchanges)
  * vs the ordinary shuffle join over the SAME snapshot tables read
  * path-based — the j23 shape (orders ⋈ lineitem → priority rollup) at
  * the bench SF. Bench-condition session, noop sink, N warm draws each,
  * sentinel bracketed; broadcast disabled on both arms so the only
  * difference is who moves the data. Layout build time is reported
  * separately — SPJ's premise is that clustering amortizes across every
  * downstream join.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "Test/runMain graft.SpjProbe 4 8"
  */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val draws = args.headOption.map(_.toInt).getOrElse(4)
    val buckets = if (args.length > 1) args(1).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft_spj",
        classOf[graft.sources.v2.SnapshotCatalog].getName)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def sentinel(): Double = timed {
      var x = 88172645463325252L; var acc = 0L; var i = 0
      while (i < 400000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1
      }
      if (acc == 42L) System.err.println("sentinel: improbable accumulator")
    }

    println(f"[spjprobe] sentinel_start=${sentinel()}%.2f s sf=$sfDir " +
      s"cpus=$cpus buckets=$buckets")

    val ta = SparkHygiene.scratchDir("spjprobe_orders")
    val tb = SparkHygiene.scratchDir("spjprobe_lineitem")
    graft.sources.Snapshots.commit(spark, ta,
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority")))
    graft.sources.Snapshots.commit(spark, tb,
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity")))
    val layoutSec = timed {
      graft.operators.Optimize.clusterByBuckets(
        spark, ta, "o_orderkey", buckets)
      graft.operators.Optimize.clusterByBuckets(
        spark, tb, "l_orderkey", buckets)
    }
    println(f"[spjprobe] layout_build_sec=$layoutSec%.2f (one-time, amortized)")

    def rollup(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("qty"))

    def spjForm(): DataFrame = rollup(
      spark.table(s"graft_spj.snap.`$ta`"),
      spark.table(s"graft_spj.snap.`$tb`"))
    // same committed bytes, same connector — but path-based, so no
    // function catalog, no KeyGroupedPartitioning, a full shuffle join
    def shuffleForm(): DataFrame = rollup(
      spark.read.format("graft_snapshots").option("path", ta).load(),
      spark.read.format("graft_snapshots").option("path", tb).load())

    def digest(df: DataFrame): Long = df
      .agg(expr("bit_xor(xxhash64(o_orderpriority, n, qty))").as("h"))
      .head().getLong(0)
    val d1 = digest(spjForm())
    val d2 = digest(shuffleForm())
    println(s"[spjprobe] parity=${d1 == d2} digest=$d1")
    val helper =
      new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    def exchangeCount(df: DataFrame): Int = {
      df.write.format("noop").mode("overwrite").save()
      helper.collectWithSubqueries(df.queryExecution.executedPlan) {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
      }.size
    }
    println(s"[spjprobe] exchanges spj=${exchangeCount(spjForm())} " +
      s"shuffle=${exchangeCount(shuffleForm())}")

    Seq("spj" -> (() => spjForm()), "shuffle" -> (() => shuffleForm()))
      .foreach { case (label, form) =>
        val secs = (1 to draws).map { _ =>
          val s = timed {
            form().write.format("noop").mode("overwrite").save()
          }
          SparkHygiene.dropAllPersisted(spark)
          s
        }
        println(s"[spjprobe] $label draws_sec=" +
          secs.map(s => f"$s%.2f").mkString("[", ",", "]"))
      }
    println(f"[spjprobe] sentinel_end=${sentinel()}%.2f s")
    spark.stop()
  }
}
