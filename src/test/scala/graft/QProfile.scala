package graft

import org.apache.spark.sql.SparkSession

/** Phase breakdown for catalog queries (guide §1): per draw, time
  * (a) DataFrame construction (catalog closure), (b) planning
  * (executedPlan force), (c) execution through the noop sink.
  *
  *   sbt -batch "Test/runMain graft.QProfile q1_agg,t1_token_stats 4"
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_agg").split(",").toSeq
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

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // JVM/session warmup on a non-catalog job
    t { spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save() }
    SparkHygiene.dropAllPersisted(spark)

    names.foreach { name =>
      (1 to draws).foreach { i =>
        var df: org.apache.spark.sql.DataFrame = null
        val c = t { df = SparkEntry.queries(name)(spark, sfDir) }
        val p = t { df.queryExecution.executedPlan }
        val e = t { df.write.format("noop").mode("overwrite").save() }
        SparkHygiene.dropAllPersisted(spark)
        println(f"[qprofile] $name draw=$i construct=$c%.3f plan=$p%.3f exec=$e%.3f total=${c + p + e}%.3f")
      }
    }
    spark.stop()
  }
}
