package graft

import org.apache.spark.sql.functions._

import graft.operators.ChangeFeed
import graft.sources.Snapshots

/** Version-diff change feed: only the manifest diff is scanned
  * (unchanged files provably never read), copy-on-write survivors
  * cancel by full-row hash, and same-key content changes emit the
  * update pre/post image pair.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("id", "v", "_change_type")
    .as[(Long, String, String)].collect().toSet

  test("append commit diffs as pure inserts, and the UNCHANGED files " +
    "are never scanned (inputFiles ⊆ manifest diff)") {
    val t = SparkHygiene.scratchDir("cdf_append")
    Snapshots.commit(spark, t,
      (0L until 100L).map(i => (i, s"p_$i")).toDF("id", "v").coalesce(2))
    Snapshots.commit(spark, t,
      (100L until 110L).map(i => (i, s"p_$i")).toDF("id", "v").coalesce(1))
    val cf = ChangeFeed.changes(spark, t, 1, 2, "id")
    assert(rows(cf) ==
      (100L until 110L).map(i => (i, s"p_$i", "insert")).toSet)
    // the fast path: version-1 files (common to both manifests) are
    // not part of the scan
    val scanned = cf.inputFiles.map(f =>
      new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
    assert(scanned.forall(_.contains("/data/v2-")),
      s"only the appended directory may be read, got $scanned")
  }

  test("copy-on-write surgery diffs as exactly the erased rows: " +
    "survivors cancel by full-row hash") {
    val t = SparkHygiene.scratchDir("cdf_cow")
    Snapshots.commit(spark, t,
      (0L until 400L).map(i => (i, s"p_$i")).toDF("id", "v")
        .repartitionByRange(4, col("id")))
    graft.operators.DeleteRows.deleteRange(spark, t, "id", 50L, 149L)
    val cf = ChangeFeed.changes(spark, t, 1, 2, "id")
    assert(rows(cf) ==
      (50L until 150L).map(i => (i, s"p_$i", "delete")).toSet)
  }

  test("a rewrite that CHANGES a row emits the update pre/post pair; " +
    "dropped and added rows in the same rewrite classify correctly") {
    val t = SparkHygiene.scratchDir("cdf_upd")
    // v1: two files, A (ids 0-9) and B (ids 10-19)
    Snapshots.commit(spark, t,
      (0L until 10L).map(i => (i, s"p_$i")).toDF("id", "v").coalesce(1))
    val v2 = Snapshots.commit(spark, t,
      (10L until 20L).map(i => (i, s"p_$i")).toDF("id", "v").coalesce(1))
    assert(v2 == 2)
    // v3: keep file A by reference; replace B with B' = B where id 10
    // is MODIFIED, id 11 is dropped, id 99 is new
    val aEntries = Snapshots.manifestEntries(t, 1)
    val bPrime = Snapshots.versionDataDir(t, 3)
    ((Seq((10L, "CHANGED")) ++
      (12L until 20L).map(i => (i, s"p_$i")) :+ ((99L, "p_99")))
      .toDF("id", "v").coalesce(1))
      .write.parquet(bPrime)
    Snapshots.commitManifest(t, aEntries :+ bPrime)
    val cf = ChangeFeed.changes(spark, t, 2, 3, "id")
    assert(rows(cf) == Set(
      (10L, "p_10", "update_preimage"),
      (10L, "CHANGED", "update_postimage"),
      (11L, "p_11", "delete"),
      (99L, "p_99", "insert")))
    // file A untouched → never scanned
    val aFiles = aEntries.map(e =>
      new org.apache.hadoop.fs.Path(e).toUri.getPath)
    val scanned = cf.inputFiles.map(f =>
      new org.apache.hadoop.fs.Path(f).toUri.getPath)
    assert(!scanned.exists(s => aFiles.exists(a => s.startsWith(a))),
      "the by-reference file must stay out of the diff scan")
  }
}
