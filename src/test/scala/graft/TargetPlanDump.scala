package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` for named catalog queries into
  * `plans/<round>/<name>_<suffix>.txt` — the per-change before/after
  * plan evidence an optimization round commits. Round dir defaults to
  * r15; override with SPARK_GRAFT_PLANS_DIR.
  *
  *   sbt -batch "Test/runMain graft.TargetPlanDump before t24_repeat_strip,d6_dup_groups"
  */
object TargetPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TargetPlanDump <suffix> <q1,q2,...>")
    val suffix = args(0)
    val names = args(1).split(",").toSeq
    val plansDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r15")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(plansDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$plansDir/${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $plansDir/${name}_$suffix.txt")
      SparkHygiene.dropAllPersisted(spark)
    }
    spark.stop()
  }
}
