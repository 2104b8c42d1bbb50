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

  // ---- Bloom manifest: the hash-distributed layout where min/max
  // pruning is provably useless --------------------------------------

  private def hashDistributed(): (String, Int) = {
    val out = SparkHygiene.scratchDir("man_bloom")
    Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"), col("lang"))
      .repartition(16, col("doc_id"))
      .write.mode("overwrite").parquet(out)
    (out, 16)
  }

  test("bloom pruning: min/max can't prune the hash layout, the bloom " +
    "manifest can, and false negatives are impossible") {
    val (dir, nFiles) = hashDistributed()
    // min/max pruning is structurally dead here: every file's [lo, hi]
    // covers the probe key, so a range read plans ALL files
    val ranges = Manifest.stats(spark, dir, "doc_id")
    val key = 123L
    assert(ranges.count(f => f.lo <= key && f.hi >= key) == nFiles,
      "fixture must make range stats useless (every file straddles the key)")

    val filters = Manifest.bloomStats(spark, dir, "doc_id")
    assert(filters.length == nFiles)
    // zero false negatives: every present key's home file is a candidate
    val homes = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("doc_id"))
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    val pos = Manifest.bloomPositions(spark, homes.keys.toSeq, 1 << 15, 5)
    homes.foreach { case (k, home) =>
      val cand = filters.filter(_.mightContain(pos(k))).map(_.path)
      assert(cand.exists(p => home.endsWith(p.split('/').last)),
        s"false negative: key $k home file not a candidate")
    }

    // the point is pruning: a single key's candidate set must be far
    // below the file count (with 500 keys over 16 files × 2^15 bits the
    // per-file fp rate is ~0 — candidates = the 1 home file)
    val cand123 = filters.filter(_.mightContain(pos(key))).map(_.path)
    assert(cand123.length < nFiles / 2,
      s"bloom pruned nothing: ${cand123.length} of $nFiles files")

    val pruned = Manifest.bloomPrunedRead(spark, dir, "doc_id", Seq(key))
    assert(pruned.inputFiles.length == cand123.length)
    val full = spark.read.parquet(dir).filter(col("doc_id") === key)
    assert(pruned.select(col("doc_id"), col("lang")).collect().toSeq ==
      full.select(col("doc_id"), col("lang")).collect().toSeq)
  }

  test("bloom pruning: an absent key plans (almost) nothing; a key set " +
    "plans the union of candidates; results equal the full-scan filter") {
    val (dir, nFiles) = hashDistributed()
    val missing = Seq(999999L, -5L)
    val present = Seq(3L, 57L, 444L)
    val prunedMiss = Manifest.bloomPrunedRead(spark, dir, "doc_id", missing)
    assert(prunedMiss.inputFiles.length < nFiles / 2,
      s"absent keys should prune most files, planned ${prunedMiss.inputFiles.length}")
    assert(prunedMiss.count() == 0)

    val pruned = Manifest.bloomPrunedRead(spark, dir, "doc_id",
      present ++ missing)
    assert(pruned.inputFiles.length < nFiles,
      "a 3-key lookup must still prune on a 16-file layout")
    val full = spark.read.parquet(dir)
      .filter(col("doc_id").isin((present ++ missing): _*))
    assert(pruned.select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq ==
      full.select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq)
  }
}
