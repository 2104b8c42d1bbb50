package graft

import org.apache.spark.sql.SparkSession

/** Post-execution (AQE-final) plan census for named catalog queries:
  * run through the noop sink, then print the final adaptive plan's
  * Exchange / ReusedExchange / ReusedSubquery counts plus the plan tree
  * node list — verifies whether claimed stage reuse actually fires at
  * bench conditions (local[32], partitions=32).
  *
  *   sbt -batch "Test/runMain graft.ReuseProbe d2_jaccard_pairs"
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("d2_jaccard_pairs").split(",").toSeq
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
    val lastPlan = new java.util.concurrent.atomic.AtomicReference[String]("")
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        lastPlan.set(qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(500) // listener fires async on the listener bus
      val s = lastPlan.get()
      def c(tok: String) = tok.r.findAllIn(s).size
      println(s"[reuseprobe] $name exchanges=${c("Exchange (hash|range|Single)")} " +
        s"reusedExchange=${c("ReusedExchange")} shuffleReads=${c("AQEShuffleRead")} " +
        s"broadcasts=${c("BroadcastExchange")} bhj=${c("BroadcastHashJoin")} " +
        s"smj=${c("SortMergeJoin")} isFinal=${s.contains("isFinalPlan=true")}")
      // the tree skeleton, one node per line, for eyeballing
      s.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join")
        || l.contains("HashAggregate") || l.contains("Window")
        || l.contains("Generate") || l.contains("Scan "))
        .take(60).foreach(l => println("[reuseprobe]   " + l.take(140)))
      SparkHygiene.dropAllPersisted(spark)
    }
    spark.stop()
  }
}
