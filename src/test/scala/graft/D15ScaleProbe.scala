package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prove-or-drop probe for d15's kept-fingerprint persist (VERDICT r14
  * #4 / guide §1.1+§5): the r14 round persisted the winnowing `kept`
  * frame (3 consumers) but measured it NEUTRAL at sf0.1 (4.09 → 4.37 s)
  * and kept it on at-scale reasoning. This probe settles it at 10× the
  * corpus: the d15 corpus replicated with disjoint doc_id ranges, the
  * containment pipeline run WITH the eager persist vs WITHOUT
  * (recompute per consumer), interleaved draws, identical row counts
  * asserted. Keep the persist iff the win is ≥ ~1.3× at scale.
  *
  *   sbt -batch "Test/runMain graft.D15ScaleProbe [sfDir] [replicas] [draws]"
  */
object D15ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args(1).toInt else 10
    val draws = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    // the d15 corpus (docs + planted near-dups), replicated with
    // disjoint id ranges so pair structure scales linearly
    def corpus: DataFrame = {
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val dups = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" qq zz near dup pad")).as("text"))
      val one = docs.unionByName(dups)
      (0 until replicas).map(r =>
        one.select((col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
          col("text")))
        .reduce(_ unionByName _)
    }

    // containmentPairs body, persist toggled (k/w/tau/maxDf = d15's)
    def pipeline(persistKept: Boolean): (Long, () => Unit) = {
      val k = 24; val w = 8; val tau = 0.5; val maxDf = 1000L
      val fps = graft.operators.Winnowing
        .fingerprints(corpus, "doc_id", "text", k, w)
        .select(col("doc_id").as("__id"), col("fp")).distinct()
      val keptPlan = fps
        .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .filter(col("__df") <= maxDf)
        .select(col("__id"), col("fp"))
      val kept =
        if (persistKept) {
          val kp = keptPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          kp.count()
          kp
        } else keptPlan
      val sizes = kept.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
      val shared = kept.select(col("__id").as("a"), col("fp"))
        .join(kept.select(col("__id").as("b"), col("fp")), "fp")
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
      val out = shared
        .join(sizes.select(col("__id").as("a"), col("__n").as("fpa")), "a")
        .join(sizes.select(col("__id").as("b"), col("__n").as("fpb")), "b")
        .withColumn("containment",
          round(col("shared") * lit(1.0) / least(col("fpa"), col("fpb")), 6))
        .filter(col("containment") >= tau)
      (out.count(), () => { if (persistKept) { kept.unpersist(); () } })
    }

    def draw(label: String, persistKept: Boolean): Unit = {
      val t0 = System.nanoTime()
      val (n, release) = pipeline(persistKept)
      val sec = (System.nanoTime() - t0) / 1e9
      release()
      SparkHygiene.dropAllPersisted(spark)
      println(f"[d15scale] $label%9s replicas=$replicas wall=$sec%7.2f s pairs=$n")
    }

    draw("warmup", persistKept = true)
    for (_ <- 0 until draws) {
      draw("persist", persistKept = true)
      draw("recompute", persistKept = false)
    }
    spark.stop()
  }
}
