package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the round-11 maintenance operators: MergeInto and
  * Scd2 at 1× vs 10× of their BIG side, with the small side constant.
  *
  * MergeInto's design claim: the target is scanned, never shuffled, so
  * a constant delta against a 10× target costs ≈10× the scan and the
  * SAME broadcast work — against the naive FULL OUTER merge, which
  * pays a 10× SHUFFLE of the target (the copy-on-write-vs-rewrite gap
  * that decides merge feasibility at 100 TB). Both are timed here.
  *
  * Scd2's claim: the history build is one key exchange + per-key
  * sorted scan, so 10× the events (10× the key population, same
  * per-key density) costs ≈linear wall.
  *
  * Corpora are materialized to parquet first so generation never
  * pollutes timings; each figure is the second (warm) run.
  *
  * Run: `sbt "Test/runMain graft.MergeScaleProbe"`; feeds PERF.md.
  */
object MergeScaleProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = "/tmp/graft_merge_scale"
    val sf = "/root/testdata/sf0.1"

    def materialize(path: String, copies: Int, df: => DataFrame): String = {
      if (!new java.io.File(s"$path/_SUCCESS").exists())
        df.write.mode("overwrite").parquet(path)
      path
    }

    // --- MergeInto: target replicated with offset keys, delta constant ---
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").as("price"))
    def replicated(copies: Int): DataFrame =
      orders.crossJoin(broadcast(spark.range(copies).toDF("c")))
        .select((col("o_orderkey") + col("c") * 1000000000L).as("o_orderkey"),
          col("o_custkey"), col("price"))
    val t1 = materialize(s"$base/target1", 10, replicated(10))   // 1.5 M rows
    val t10 = materialize(s"$base/target10", 100, replicated(100)) // 15 M rows
    // constant delta: ~21 k changes in copy-0 key space, every 3rd a delete
    val delta = orders.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_custkey").as("d_custkey"),
        when(col("o_orderkey") % 21 === 0, lit("D")).otherwise(lit("U")).as("op"),
        (col("o_orderkey") % 100000).cast("double").as("new_price"))
      .localCheckpoint(true)
    println(s"delta rows = ${delta.count()}")

    def timed(f: => Long): (Double, Long) = {
      f // warm-up run
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    def mergeBroadcast(path: String): Long =
      graft.operators.MergeInto(
        spark.read.parquet(path), delta, key = "o_orderkey",
        deleteWhen = col("op") === "D",
        updateCols = Seq("o_orderkey" -> col("o_orderkey"),
          "o_custkey" -> col("o_custkey"), "price" -> col("new_price")),
        insertCols = Seq("o_orderkey" -> col("o_orderkey"),
          "o_custkey" -> col("d_custkey"), "price" -> col("new_price")))
        .count()

    def mergeFullOuter(path: String): Long = {
      val t = spark.read.parquet(path)
      val d = delta.withColumnRenamed("o_orderkey", "d_key")
      t.join(d.hint("shuffle_hash"), col("o_orderkey") === col("d_key"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D" || col("o_orderkey").isNull)
        .select(coalesce(col("o_orderkey"), col("d_key")).as("k"),
          coalesce(col("new_price"), col("price")).as("p"))
        .filter(col("p").isNotNull)
        .count()
    }

    val (bw1, bn1) = timed(mergeBroadcast(t1))
    val (bw10, bn10) = timed(mergeBroadcast(t10))
    val (fw1, fn1) = timed(mergeFullOuter(t1))
    val (fw10, fn10) = timed(mergeFullOuter(t10))

    // --- Scd2: events replicated across 10× the key population ---
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    def evReplicated(copies: Int): DataFrame =
      events.crossJoin(broadcast(spark.range(copies).toDF("c")))
        .select((col("user_id") + col("c") * 1000000L).as("user_id"),
          col("event_type"), col("ts"),
          (col("event_id") + col("c") * 1000000000L).as("event_id"))
    val e1 = materialize(s"$base/ev1", 1, evReplicated(1))    // 100 k
    val e10 = materialize(s"$base/ev10", 10, evReplicated(10)) // 1 M

    def scd2(path: String): Long =
      graft.operators.Scd2.intervals(spark.read.parquet(path),
        "user_id", "event_type", "ts", "event_id").count()

    val (sw1, sn1) = timed(scd2(e1))
    val (sw10, sn10) = timed(scd2(e10))

    println("| op | 1x wall | 10x wall | ratio | 1x rows | 10x rows |")
    println("|---|---|---|---|---|---|")
    println(f"| MergeInto (broadcast CoW) | $bw1%.2f s | $bw10%.2f s | ${bw10 / bw1}%.1fx | $bn1 | $bn10 |")
    println(f"| merge via FULL OUTER shuffle | $fw1%.2f s | $fw10%.2f s | ${fw10 / fw1}%.1fx | $fn1 | $fn10 |")
    println(f"| Scd2.intervals | $sw1%.2f s | $sw10%.2f s | ${sw10 / sw1}%.1fx | $sn1 | $sn10 |")
    spark.stop()
  }
}
