package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** A/B probe for [[graft.plans.DeltaDmlRuntimeFiltering]] — the
  * WriteDelta runtime group filter (VERDICT r13 follow-on, round 14
  * session 5). Shape: a range-clustered 32-file snapshot table at
  * sf0.1, a 200-key adjacent-range MERGE source, `dmlMode
  * 'merge-on-read'`. Arms: the rule ON (default) vs OFF (the same
  * `spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled`
  * flag Spark's group-based rule honors). Each draw uses a FRESH table
  * (a MERGE mutates); build time is outside the clock. Prints the
  * runtime-skip census per draw plus sentinel timings.
  *
  * Run: `sbt -batch "Test/runMain graft.DeltaDppProbe [sfDir]"`,
  * capture → artifacts/DELTADPP_r{N}.txt.
  */
object DeltaDppProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def sentinel(): Double =
      timed(spark.range(200000000L).select(sum(col("id"))).collect())._2
    val base = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_returnflag"))
    def mk(tag: String): (String, String) = {
      val t = SparkHygiene.scratchDir(s"ddpp_$tag")
      Snapshots.commit(spark, t, base.repartitionByRange(32, col("l_orderkey")))
      val tab = s"ddpp_${tag}_${math.abs(t.hashCode)}"
      spark.sql(s"CREATE TABLE $tab (l_orderkey BIGINT, l_partkey BIGINT, " +
        "l_quantity DOUBLE, l_returnflag STRING) USING graft_snapshots " +
        s"OPTIONS (path '$t', dmlMode 'merge-on-read')")
      (t, tab)
    }
    val lo = 1000L
    // one source row per key (a target row matching several source rows
    // is a MERGE cardinality violation); one source key still matches
    // MANY target lines — the realistic upsert shape
    base.filter(col("l_orderkey") >= lo && col("l_orderkey") < lo + 200)
      .dropDuplicates("l_orderkey")
      .withColumn("l_returnflag", lit("reloaded"))
      .localCheckpoint(true)
      .createOrReplaceTempView("ddpp_src")
    val flag =
      "spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled"
    println(s"[deltadpp] sentinel_start=${f(sentinel())} s sf=$dir " +
      s"cpus=${Runtime.getRuntime.availableProcessors()} draws=3/arm")
    // the size gate would skip this table (it IS the sub-crossover
    // measurement) — drop it so the arms compare the filter itself
    spark.conf.set("spark.graft.delta.runtimeGroupFilter.minBytes", "0")
    for (arm <- Seq("on", "off"); draw <- 1 to 3) {
      spark.conf.set(flag, arm == "on")
      val (t, tab) = mk(s"${arm}_$draw")
      try {
        graft.sources.v2.SnapshotsDataSource.runtimeSkipCensus.remove(t)
        val (_, sec) = timed(spark.sql(
          s"""MERGE INTO $tab x USING ddpp_src s
             ON x.l_orderkey = s.l_orderkey
             WHEN MATCHED THEN UPDATE SET l_returnflag = s.l_returnflag
             WHEN NOT MATCHED THEN INSERT * """))
        val census = Option(graft.sources.v2.SnapshotsDataSource
          .runtimeSkipCensus.get(t)).map { case (k, s) => s"$k-kept/$s-skipped" }
          .getOrElse("none")
        val rows = spark.table(tab)
          .filter(col("l_returnflag") === "reloaded").count()
        println(s"[deltadpp] arm=$arm draw=$draw merge_sec=${f(sec)} " +
          s"census=$census reloaded_rows=$rows")
      } finally spark.sql(s"DROP TABLE $tab")
    }
    spark.conf.set(flag, true)
    spark.conf.unset("spark.graft.delta.runtimeGroupFilter.minBytes")
    println(s"[deltadpp] sentinel_end=${f(sentinel())} s")
  }
  private def f(d: Double): String = f"$d%.2f"
}
