package graft

import org.apache.spark.sql.SparkSession

/** Isolated A/B timing probe for individual catalog queries (VERDICT
  * r11 #2): fresh bench-condition session, N warm draws per named
  * query through the noop sink, every draw printed. Used to reproduce
  * -or-clear official-artifact regressions on code `git log` proves
  * unchanged (r12: w9_stream_join_outer 3.1 s → 18.9 s, t4_repetition
  * 1.0 s → 2.2 s in BENCH_r11 on a box whose own draws spread 3.3×).
  *
  *   sbt -batch "Test/runMain graft.ABProbe w9_stream_join_outer,t4_repetition 4"
  */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .getOrElse("w9_stream_join_outer,t4_repetition").split(",").toSeq
    val draws = if (args.length > 1) args(1).toInt else 4
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
    // same box probe as Bench.sentinelSec — printed so the draws carry
    // their own contention context
    def sentinel(): Double = timed {
      var x = 88172645463325252L; var acc = 0L; var i = 0
      while (i < 400000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1
      }
      if (acc == 42L) System.err.println("sentinel: improbable accumulator")
    }
    println(f"[abprobe] sentinel_start=${sentinel()}%.2f s  sf=$sfDir cpus=$cpus")
    names.foreach { name =>
      val secs = (1 to draws).map { _ =>
        val s = timed {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        SparkHygiene.dropAllPersisted(spark)
        s
      }
      println(s"[abprobe] $name draws_sec=" +
        secs.map(s => f"$s%.2f").mkString("[", ",", "]"))
    }
    println(f"[abprobe] sentinel_end=${sentinel()}%.2f s")
    spark.stop()
  }
}
