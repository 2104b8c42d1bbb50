package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B: the physical as-of operator ([[graft.plans.AsOfJoinExec]])
  * vs the union+running-last window composition
  * ([[graft.operators.TemporalJoins.asofBackward]]) on identical
  * inputs — the j20 shape (purchases ← latest prior view) at the bench
  * SF. Bench-condition session, noop sink, N warm draws each, sentinel
  * bracketed.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "Test/runMain graft.AsOfProbe 4"
  */
object AsOfProbe {
  def main(args: Array[String]): Unit = {
    val draws = args.headOption.map(_.toInt).getOrElse(4)
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
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def sentinel(): Double = timed {
      var x = 88172645463325252L; var acc = 0L; var i = 0
      while (i < 400000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1
      }
      if (acc == 42L) System.err.println("sentinel: improbable accumulator")
    }

    val amp = if (args.length > 1) args(1).toInt else 1
    def inputs(): (DataFrame, DataFrame) = {
      // optional amplification: `amp` key-disjoint copies (same per-key
      // density, amp x rows) to probe the forms past the scan floor
      val ev0 = Tables.events(spark, sfDir)
      val ev = if (amp <= 1) ev0 else (0 until amp).map(i =>
        ev0.withColumn("user_id", col("user_id") + lit(i * 1000000L))
          .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _)
      val views = ev.filter(col("event_type") === "view")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("ts"))
            .orderBy(col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      (purchases, views)
    }

    def execForm(): DataFrame = {
      val (p, v) = inputs()
      graft.plans.AsOf.backward(p, v, p("user_id"), v("v_user"),
          p("ts"), v("v_ts"), v("view_id"))
        .select(col("purchase_id"), col("view_id"), col("view_value"))
    }
    def windowForm(): DataFrame = {
      val (p, v0) = inputs()
      val v = v0.withColumnRenamed("v_user", "user_id")
        .withColumnRenamed("v_ts", "ts")
      graft.operators.TemporalJoins.asofBackward(p, v,
          keyCol = "user_id", tsCol = "ts",
          leftIdCol = "purchase_id", rightIdCol = "view_id",
          payloadCols = Seq("view_id", "view_value"))
        .select(col("purchase_id"),
          col("asof_view_id").as("view_id"),
          col("asof_view_value").as("view_value"))
    }

    println(f"[asofprobe] sentinel_start=${sentinel()}%.2f s sf=$sfDir cpus=$cpus amp=$amp")
    // parity first: identical results (sorted digest), then timing
    def digest(df: DataFrame): Long = df
      .agg(expr("bit_xor(xxhash64(purchase_id, view_id, view_value))").as("h"))
      .head().getLong(0)
    val d1 = digest(execForm())
    val d2 = digest(windowForm())
    println(s"[asofprobe] parity=${d1 == d2} digest=$d1")
    Seq("exec" -> (() => execForm()), "window" -> (() => windowForm()))
      .foreach { case (label, form) =>
        val secs = (1 to draws).map { _ =>
          val s = timed {
            form().write.format("noop").mode("overwrite").save()
          }
          SparkHygiene.dropAllPersisted(spark)
          s
        }
        println(s"[asofprobe] $label draws_sec=" +
          secs.map(s => f"$s%.2f").mkString("[", ",", "]"))
      }
    println(f"[asofprobe] sentinel_end=${sentinel()}%.2f s")
    spark.stop()
  }
}
