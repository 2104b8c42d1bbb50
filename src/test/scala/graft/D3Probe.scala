package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Throwaway A/B: d3 first-agreeing-band vs the old distinct() dedup. */
object D3Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val sf = "/root/testdata/sf0.1"
    spark.read.parquet(s"$sf/documents.parquet").count()

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"D3PROBE $tag=${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    def corpus = {
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      docs.unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" qq zz near dup pad")).as("text")))
    }
    // old shape: explode(bidx, bh) only + distinct()
    def oldPairs = {
      val rows = 3; val bands = 4
      val sigs = corpus
        .withColumn("__toks", TextFns.repetitionTokens(col("text")))
        .select(col("doc_id").as("__id"),
          TextFns.minHashShingles(col("__toks"), 3, 12).as("mhs"))
      val bandCols = (0 until bands).map(bi => struct(
        lit(bi).as("bidx"),
        md5(concat_ws(",",
          (0 until rows).map(r => element_at(col("mhs"), bi * rows + r + 1)): _*)).as("bh")))
      val banded = sigs
        .select(col("__id"), explode(array(bandCols: _*)).as("band"))
        .select(col("__id"), col("band.bidx").as("bidx"), col("band.bh").as("bh"))
      banded.as("x").join(banded.as("y"),
        col("x.bidx") === col("y.bidx") && col("x.bh") === col("y.bh"))
        .filter(col("x.__id") < col("y.__id"))
        .select(col("x.__id").as("a"), col("y.__id").as("b"))
        .distinct()
    }
    def newPairs = graft.operators.MinHashJoin
      .selfPairs(corpus, "doc_id", "text", 3, 12, 4)

    // payload strings + distinct (isolates the ride-along cost)
    def v3 = {
      val rows = 3; val bands = 4
      val sigs = corpus
        .withColumn("__toks", TextFns.repetitionTokens(col("text")))
        .select(col("doc_id").as("__id"),
          TextFns.minHashShingles(col("__toks"), 3, 12).as("mhs"))
      val bandHashes = array((0 until bands).map(bi =>
        md5(concat_ws(",",
          (0 until rows).map(r => element_at(col("mhs"), bi * rows + r + 1)): _*))): _*)
      val banded = sigs
        .select(col("__id"), bandHashes.as("__bhs"))
        .select(col("__id"), col("__bhs"),
          posexplode(col("__bhs")).as(Seq("__bk", "__bh")))
      banded.as("x").join(banded.as("y"),
          col("x.__bk") === col("y.__bk") && col("x.__bh") === col("y.__bh") &&
            col("x.__id") < col("y.__id"))
        .select(col("x.__id").as("a"), col("y.__id").as("b"))
        .distinct()
    }
    // long fingerprints payload, first-band predicate on longs
    def v4 = {
      val rows = 3; val bands = 4
      val sigs = corpus
        .withColumn("__toks", TextFns.repetitionTokens(col("text")))
        .select(col("doc_id").as("__id"),
          TextFns.minHashShingles(col("__toks"), 3, 12).as("mhs"))
      val bandHashes = array((0 until bands).map(bi =>
        xxhash64(md5(concat_ws(",",
          (0 until rows).map(r => element_at(col("mhs"), bi * rows + r + 1)): _*)))): _*)
      val banded = sigs
        .select(col("__id"), bandHashes.as("__bhs"))
        .select(col("__id"), col("__bhs"),
          posexplode(col("__bhs")).as(Seq("__bk", "__bh")))
      val firstAgreeingBand = (0 until bands).foldRight(lit(-1)) { (k, rest) =>
        when(element_at(col("x.__bhs"), k + 1) === element_at(col("y.__bhs"), k + 1),
          lit(k)).otherwise(rest)
      }
      banded.as("x").join(banded.as("y"),
          col("x.__bk") === col("y.__bk") && col("x.__bh") === col("y.__bh") &&
            col("x.__id") < col("y.__id"))
        .filter(col("x.__bk") === firstAgreeingBand)
        .select(col("x.__id").as("a"), col("y.__id").as("b"))
    }

    // flat string columns instead of the array — accurate size stats
    def v5 = {
      val rows = 3; val bands = 4
      val sigs = corpus
        .withColumn("__toks", TextFns.repetitionTokens(col("text")))
        .select(col("doc_id").as("__id"),
          TextFns.minHashShingles(col("__toks"), 3, 12).as("mhs"))
      val bandCols = (0 until bands).map(bi =>
        md5(concat_ws(",",
          (0 until rows).map(r => element_at(col("mhs"), bi * rows + r + 1)): _*)).as(s"__b$bi"))
      val withBands = sigs.select(col("__id") +: bandCols: _*)
      val cols: Seq[org.apache.spark.sql.Column] =
        col("__id") +: (0 until bands).map(bi => col(s"__b$bi")) :+
          posexplode(array((0 until bands).map(bi => col(s"__b$bi")): _*))
            .as(Seq("__bk", "__bh"))
      val banded = withBands.select(cols: _*)
      val firstAgreeingBand = (0 until bands).foldRight(lit(-1)) { (k, rest) =>
        when(col(s"x.__b$k") === col(s"y.__b$k"), lit(k)).otherwise(rest)
      }
      banded.as("x").join(banded.as("y"),
          col("x.__bk") === col("y.__bk") && col("x.__bh") === col("y.__bh") &&
            col("x.__id") < col("y.__id"))
        .filter(col("x.__bk") === firstAgreeingBand)
        .select(col("x.__id").as("a"), col("y.__id").as("b"))
    }

    def joinType(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
      Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        .filter(p.contains).mkString(",")
    }
    println("D3PROBE joins old=" + joinType(oldPairs) + " new=" + joinType(newPairs) +
      " v5=" + joinType(v5))
    for (i <- 0 until 3) {
      timed(s"old_run$i")(oldPairs.write.format("noop").mode("overwrite").save())
      timed(s"new_run$i")(newPairs.write.format("noop").mode("overwrite").save())
      timed(s"v3_run$i")(v3.write.format("noop").mode("overwrite").save())
      timed(s"v4_run$i")(v4.write.format("noop").mode("overwrite").save())
      timed(s"v5_run$i")(v5.write.format("noop").mode("overwrite").save())
    }
    println("D3PROBE counts old=" + oldPairs.count() + " new=" + newPairs.count() +
      " v3=" + v3.count() + " v4=" + v4.count() + " v5=" + v5.count())
    spark.stop()
  }
}
