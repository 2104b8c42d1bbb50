package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object D18Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val dir = "/root/testdata/sf0.1"
    def inputs(s: SparkSession) = {
      val ref = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val probe = ref.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" qq zz near dup pad")).as("text"))
      (probe, ref)
    }
    def timed(tag: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); f
        println(f"$tag run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s")
        SparkHygiene.dropAllPersisted(spark)
      }
    }
    val (p, r) = inputs(spark)
    timed("plain") {
      graft.operators.JaccardJoin.crossPairs(p, r, "doc_id", "text", t = 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    // shared epoch dir across draws — the d18 cadence: run 1 pays the
    // per-epoch snapshot build, runs 2-3 measure the per-delta path
    val epoch = SparkHygiene.scratchDir("d18probe_epoch")
    timed("adaptive") {
      graft.operators.JaccardJoin.crossPairsAdaptive(p, r, "doc_id", "text",
          t = 0.5, epochIndexDir = Some(epoch))._1
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
