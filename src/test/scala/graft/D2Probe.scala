package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{TextFns, VectorFns}

/** Phase-level timing for d2_jaccard_pairs at sf0.1 (throwaway probe). */
object D2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val sf = "/root/testdata/sf0.1"
    spark.read.parquet(s"$sf/documents.parquet").count()

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"D2PROBE $tag=${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }

    val runVariantB = sys.env.get("D2PROBE_B").contains("1")
    for (i <- 0 until 2) {
      println(s"D2PROBE --- iteration $i ---")
      val t = 0.5
      val docs0 = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val corpus = docs0.unionByName(docs0.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" qq zz near dup pad")).as("text")))
      val sh = corpus
        .withColumn("__toks", TextFns.repetitionTokens(col("text")))
        .select(col("doc_id"),
          explode(TextFns.wordShinglesTokens(col("__toks"), 3)).as("sh"))
      timed("explode_only")(sh.write.format("noop").mode("overwrite").save())
      val dfw = Window.partitionBy(col("sh"))
      val base = sh
        .withColumn("df", count(lit(1)).over(dfw))
        .groupBy(col("doc_id"))
        .agg(
          transform(array_sort(collect_list(struct(col("df"), col("sh")))),
            x => x.getField("sh")).as("ord"),
          count(lit(1)).as("sz"))
        .select(col("doc_id"), col("sz"),
          array_sort(col("ord")).as("shs"),
          slice(col("ord"), lit(1),
            (col("sz") - ceil(col("sz") * t) + 1).cast("int")).as("pref"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("base_materialize")(base.count())
      val docs = base.select(col("doc_id"), col("shs"), col("sz"))
      val psh = base.select(col("doc_id"), col("sz"), explode(col("pref")).as("sh"))
      val cand = psh.as("x").join(psh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id") &&
          col("y.sz") * t <= col("x.sz") && col("x.sz") * t <= col("y.sz"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      val nCandA = timed("cand")(cand.count())
      println(s"D2PROBE cand_rows=$nCandA")
      val full = cand
        .join(broadcast(docs.select(col("doc_id").as("a"), col("shs").as("sha"), col("sz").as("sza"))), "a")
        .join(broadcast(docs.select(col("doc_id").as("b"), col("shs").as("shb"), col("sz").as("szb"))), "b")
        .withColumn("common", VectorFns.sortedIntersectCount(col("sha"), col("shb")))
        .withColumn("jaccard",
          round(col("common") * lit(1.0) / (col("sza") + col("szb") - col("common")), 6))
        .filter(col("jaccard") >= 0.5)
        .select(col("a"), col("b"), col("jaccard")).orderBy(col("a"), col("b"))
      timed("verify_tail")(full.write.format("noop").mode("overwrite").save())
      base.unpersist(blocking = true)
      SparkHygiene.dropAllPersisted(spark)

      // Variant B (measured WORSE — kept behind D2PROBE_B=1 for the
      // record): hash-order prefix — no df window, no explode/regroup;
      // per-doc arrays built narrowly, first shuffle is the index join.
      // Loses twice: CollapseProject inlines the shingle build into the
      // per-element struct transform (11 s warm just to materialize),
      // and a random global order indexes hot shingles → 594,814
      // candidates vs 364,077 under rarest-first df order.
      if (!runVariantB) { println("D2PROBE variant B skipped (D2PROBE_B!=1)") }
      else {
      println(s"D2PROBE --- variant B iteration $i ---")
      val baseB = corpus
        .withColumn("shr", TextFns.wordShinglesTokens(TextFns.repetitionTokens(col("text")), 3))
        .select(col("doc_id"),
          size(col("shr")).as("sz"),
          array_sort(col("shr")).as("shs"),
          transform(
            array_sort(transform(col("shr"), x => struct(xxhash64(x).as("h"), x.as("sh")))),
            x => x.getField("sh")).as("ordh"))
        .withColumn("pref", slice(col("ordh"), lit(1),
          (col("sz") - ceil(col("sz") * t) + 1).cast("int")))
        .drop("ordh")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("B_base_materialize")(baseB.count())
      val docsB = baseB.select(col("doc_id"), col("shs"), col("sz"))
      val pshB = baseB.select(col("doc_id"), col("sz"), explode(col("pref")).as("sh"))
      val candB = pshB.as("x").join(pshB.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id") &&
          col("y.sz") * t <= col("x.sz") && col("x.sz") * t <= col("y.sz"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      val nCand = timed("B_cand")(candB.count())
      println(s"D2PROBE B_cand_rows=$nCand")
      val fullB = candB
        .join(broadcast(docsB.select(col("doc_id").as("a"), col("shs").as("sha"), col("sz").as("sza"))), "a")
        .join(broadcast(docsB.select(col("doc_id").as("b"), col("shs").as("shb"), col("sz").as("szb"))), "b")
        .withColumn("common", VectorFns.sortedIntersectCount(col("sha"), col("shb")))
        .withColumn("jaccard",
          round(col("common") * lit(1.0) / (col("sza") + col("szb") - col("common")), 6))
        .filter(col("jaccard") >= 0.5)
        .select(col("a"), col("b"), col("jaccard")).orderBy(col("a"), col("b"))
      val nB = timed("B_verify_tail")(fullB.count())
      println(s"D2PROBE B_result_rows=$nB")
      baseB.unpersist(blocking = true)
      SparkHygiene.dropAllPersisted(spark)
      }
    }
    spark.stop()
  }
}
