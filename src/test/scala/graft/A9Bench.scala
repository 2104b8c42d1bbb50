package graft

import org.apache.spark.sql.SparkSession

/** Bench-condition timing for a9_ui_clusters alone (local[32], noop
  * sink, warm repeats) — the measurement harness behind the VERDICT r10
  * #3 scheduling-floor shave. Run: `sbt "Test/runMain graft.A9Bench"`.
  */
object A9Bench {
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
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("a9_ui_clusters")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"a9 run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      SparkHygiene.dropAllPersisted(spark)
    }
    spark.stop()
  }
}
