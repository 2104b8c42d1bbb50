package graft

import org.apache.spark.sql.SparkSession

/** Temporary cold/warm timing probe for selected catalog queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("t12_bigram_lm", "t5_gopher", "d2_jaccard_pairs",
        "d16_jaccard_estimate", "d15_containment", "a12_eps_sweep")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // same JVM/session warmup Bench runs before its cold measurements
    timed {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    }
    SparkHygiene.dropAllPersisted(spark)
    for (n <- names) {
      val cold = timed {
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      SparkHygiene.dropAllPersisted(spark)
      val warm = timed {
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      SparkHygiene.dropAllPersisted(spark)
      println(f"PROBE $n cold=$cold%.2f warm=$warm%.2f")
    }
    spark.stop()
  }
}
