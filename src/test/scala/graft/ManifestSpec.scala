package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction
import graft.sources.Manifest

class ManifestSpec extends SparkSpec {

  private def clustered(): (String, Int) = {
    val in = SparkHygiene.scratchDir("man_in")
    val out = SparkHygiene.scratchDir("man_out")
    Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"), col("lang"))
      .repartition(16).write.mode("overwrite").parquet(in)
    val rep = Compaction.compact(spark, in, out, "doc_id",
      targetBytes = 64L << 10)
    (out, rep.outFiles)
  }

  test("footer stats agree with a full scan, file by file") {
    val (dir, nFiles) = clustered()
    val stats = Manifest.stats(spark, dir, "doc_id")
    assert(stats.length == nFiles)
    val truth = spark.read.parquet(dir)
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
      .collect()
      .map(r => (r.getAs[String]("path"), (r.getAs[Long]("rows"),
        r.getAs[Long]("lo"), r.getAs[Long]("hi")))).toMap
    stats.foreach { f =>
      // input_file_name returns a URI; match on suffix
      val t = truth.collectFirst {
        case (p, v) if p.endsWith(f.path.split('/').last) => v
      }.get
      assert(t == ((f.rows, f.lo, f.hi)), s"stats mismatch for ${f.path}")
    }
  }

  test("a point read plans exactly one file of a range-clustered table " +
    "and returns the same rows as the full scan") {
    val (dir, nFiles) = clustered()
    assert(nFiles > 1, "need several files for pruning to be non-vacuous")
    val key = 123L
    val pruned = Manifest.prunedRead(spark, dir, "doc_id", key, key)
    assert(pruned.inputFiles.length == 1,
      s"point read should plan 1 of $nFiles files, planned ${pruned.inputFiles.length}")
    val full = spark.read.parquet(dir).filter(col("doc_id") === key)
    assert(pruned.select(col("doc_id"), col("lang")).collect().toSeq ==
      full.select(col("doc_id"), col("lang")).collect().toSeq)
  }

  test("a range straddling two files plans two; an out-of-range read plans " +
    "zero rows") {
    val (dir, _) = clustered()
    val stats = Manifest.stats(spark, dir, "doc_id")
    val cut = stats.head.hi // straddle the first file boundary
    val straddle = Manifest.prunedRead(spark, dir, "doc_id", cut, cut + 1)
    assert(straddle.inputFiles.length == 2)
    assert(straddle.count() == 2)
    assert(Manifest.prunedRead(spark, dir, "doc_id", -100L, -1L).count() == 0)
  }
}
