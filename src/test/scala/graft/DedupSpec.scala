package graft

import org.apache.spark.sql.functions._

/** Drives the dedup catalog queries on tiny planted corpora (the oracle
  * checks them at sf scale; these pin the semantics on readable input).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("J5 semantics: within-cluster TF-IDF cosine > 0.9 drops the later member") {
    // doc 1 and 2 share a cluster and are duplicates; doc 3 differs;
    // doc 4 duplicates doc 1 but sits in ANOTHER cluster (must not pair)
    val corpus = Seq(
      (1L, 0, "storm hits the northern coast tonight heavy rain"),
      (2L, 0, "storm hits the northern coast tonight heavy rain"),
      (3L, 0, "parliament votes on the new budget proposal today"),
      (4L, 1, "storm hits the northern coast tonight heavy rain")) // other cluster
      .toDF("doc_id", "cluster", "text")
    val toks = corpus.select(col("cluster"), col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
    val tf = toks.groupBy("cluster", "doc_id", "t").agg(count(lit(1)).as("tf"))
    val n = corpus.agg(countDistinct("doc_id").as("nd"))
    val dfreq = tf.groupBy("t").agg(countDistinct("doc_id").as("df"))
    val w = tf.join(dfreq, "t").crossJoin(broadcast(n))
      .withColumn("w", col("tf") * log(col("nd") / col("df")))
    val norms = w.groupBy("doc_id").agg(sum(col("w") * col("w")).as("nrm"))
    val dots = w.as("x").join(w.as("y"),
      col("x.t") === col("y.t") && col("x.cluster") === col("y.cluster"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(sum(col("x.w") * col("y.w")).as("dot"))
    val pairs = dots
      .join(norms.select(col("doc_id").as("a"), col("nrm").as("na")), "a")
      .join(norms.select(col("doc_id").as("b"), col("nrm").as("nb")), "b")
      .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
      .filter(col("cos") > 0.9)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    // only the in-cluster near-dup pair fires; (1,4) is cross-cluster,
    // (1,3) is dissimilar
    assert(pairs == Set((1L, 2L)))
  }

  test("MinHash banding surfaces planted near-dups (query shape on tiny data)") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base),
      (2L, base + " extra"),  // near-dup of 1
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val sh = corpus.select(col("doc_id"),
      explode(graft.functions.TextFns.wordShingles(col("text"), 3)).as("sh"))
    val sigCols = (0 until 12).map(i =>
      min(md5(concat(lit(i.toString), lit(":"), col("sh")))).as(s"mh$i"))
    val sigs = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until 4).map(bi => struct(
      lit(bi).as("bidx"),
      md5(concat_ws(",",
        col(s"mh${3 * bi}"), col(s"mh${3 * bi + 1}"), col(s"mh${3 * bi + 2}"))).as("bh")))
    val banded = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.bidx").as("bidx"), col("band.bh").as("bh"))
    val cand = banded.as("x").join(banded.as("y"),
      col("x.bidx") === col("y.bidx") && col("x.bh") === col("y.bh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)))
    assert(!cand.contains((1L, 3L)) && !cand.contains((2L, 3L)))
  }
}
