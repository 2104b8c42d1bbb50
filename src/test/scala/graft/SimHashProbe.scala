package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.SimHashJoin

/** Throwaway measurement harness: all-pairs vs Hamming-band d4 scan. */
object SimHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("simhash-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val mult = sys.env.getOrElse("PROBE_MULT", "1").toInt
    for (dir <- args) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val dups = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" qq zz near dup pad")).as("text"))
      val base = docs.unionByName(dups)
      // scale-up probe: replicate with per-copy salt tokens so copies get
      // distinct (but corpus-typical, still correlated) signatures
      val corpus = (0 until mult).map { m =>
        if (m == 0) base
        else base.select((col("doc_id") + m * 10000000L).as("doc_id"),
          concat(col("text"), lit(s" salt$m v${m}x y${m}z w${m}q r${m}t")).as("text"))
      }.reduce(_ unionByName _)
      val bits = sys.env.getOrElse("PROBE_BITS", "32").toInt
      val ham = sys.env.getOrElse("PROBE_HAM", "6").toInt
      val sigs = corpus
        .withColumn("__toks", split(lower(trim(col("text"))), "\\s+"))
        .select(col("doc_id"), TextFns.simHash(col("__toks"), bits).as("sim"))
        .persist()
      val n = sigs.count()
      if (sys.env.contains("PROBE_HIST")) {
        println(s"HIST planted-pair hamming (bits=$bits):")
        sigs.as("x").join(sigs.as("y"),
            col("x.doc_id") + 1000000L === col("y.doc_id"))
          .select(bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("h"))
          .groupBy("h").count().orderBy("h").collect()
          .foreach(r => println(s"HIST planted h=${r.get(0)} n=${r.get(1)}"))
        val all = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
          .select(bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("h"))
          .filter(col("h") <= ham + 4).groupBy("h").count().orderBy("h").collect()
        all.foreach(r => println(s"HIST all h=${r.get(0)} n=${r.get(1)}"))
      }
      for (st <- Seq("allpairs", "banded"); rep <- 1 to 2) {
        val strat = if (st == "allpairs") SimHashJoin.AllPairs else SimHashJoin.HammingBand
        val t0 = System.nanoTime()
        val c = SimHashJoin.selfPairs(sigs, "doc_id", "sim", ham, bits, strat).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE dir=$dir n=$n strat=$st bits=$bits ham=$ham rep=$rep pairs=$c sec=$sec%.2f")
      }
      sigs.unpersist(blocking = true)
    }
    spark.stop()
  }
}
