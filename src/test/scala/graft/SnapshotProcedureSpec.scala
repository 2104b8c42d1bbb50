package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** SQL `CALL` maintenance surface (`SnapshotProcedures` through
  * `SnapshotCatalog`'s ProcedureCatalog face) + the merge-on-read SQL
  * DELETE mode (`dmlMode 'merge-on-read'`).
  *
  * Pinned contracts:
  *  - `CALL system.delete_keys` records deletion vectors and rewrites
  *    ZERO data files; `CALL system.compact` reconciles them away and
  *    restores the vectorized layout — the full merge-on-read
  *    lifecycle driven from SQL alone;
  *  - named arguments and declared defaults work (the operational
  *    surface people actually type);
  *  - `CALL system.restore` rolls back with zero data movement and
  *    reports both versions;
  *  - `CALL system.vacuum` drops out-of-retention manifests and
  *    unreferenced files, reported in the result row;
  *  - `CALL system.cluster_by` leaves the table bucket-clustered (the
  *    storage-partitioned-join layout) with identical content;
  *  - an unknown procedure fails with the available list;
  *  - a table opened with `dmlMode 'merge-on-read'` routes SQL
  *    `DELETE FROM` onto the DV path (zero files rewritten), while the
  *    default stays copy-on-write.
  */
class SnapshotProcedureSpec extends SparkSpec {
  import spark.implicits._

  private val cat = "graft_proc"
  spark.conf.set(s"spark.sql.catalog.$cat",
    classOf[graft.sources.v2.SnapshotCatalog].getName)

  private def mkTable(n: Int = 100, files: Int = 4): String = {
    val t = SparkHygiene.scratchDir("proctbl")
    Snapshots.commit(spark, t,
      spark.range(n).toDF("id").withColumn("v", col("id") * 10)
        .repartition(files, col("id")))
    t
  }

  private def dataFiles(t: String, v: Int): Set[String] =
    Snapshots.manifestEntries(t, v).flatMap { e =>
      val f = new java.io.File(e)
      if (f.isDirectory)
        f.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath)
      else Seq(f.getAbsolutePath)
    }.toSet

  test("CALL delete_keys records DVs (zero rewrites); CALL compact " +
    "reconciles them away — the merge-on-read lifecycle from SQL") {
    val t = mkTable()
    val del = spark.sql(
      s"CALL $cat.system.delete_keys('$t', 'id', '7, 42')")
    assert(del.columns.toSeq ==
      Seq("version", "files_rewritten", "files_kept"))
    // files_kept counts manifest ENTRIES (one directory) on the DV path
    assert(del.as[(Int, Int, Int)].head() == ((2, 0, 1)))
    assert(dataFiles(t, 2) == dataFiles(t, 1)) // zero data movement
    assert(Snapshots.deletionVectors(t, 2).nonEmpty)
    val ids = Snapshots.read(spark, t).select("id").as[Long].collect().toSet
    assert(ids.size == 98 && !ids.contains(7L) && !ids.contains(42L))

    // compact (named args, default target_bytes) reconciles: DV-free
    // next version, same surviving rows, vectorized read path back
    val cmp = spark.sql(
      s"CALL $cat.system.compact(table => '$t', sort_col => 'id')")
    val (v3, inF, outF) = cmp.as[(Int, Int, Int)].head()
    assert(v3 == 3 && inF == 4 && outF >= 1)
    assert(Snapshots.deletionVectors(t, 3).isEmpty)
    assert(Snapshots.read(spark, t).select("id").as[Long].collect().toSet
      == ids)
    // suppressed rows stayed out of the rewrite — not resurrected
    assert(spark.table(s"$cat.snap.`$t`").count() == 98)
  }

  test("compact_small packs ONLY the small files; big files republish " +
    "by reference; touched DVs apply, kept DVs carry") {
    val t = SparkHygiene.scratchDir("proctbl_small")
    // one big file (800 rows) + six small ones (10 rows each)
    Snapshots.commit(spark, t,
      spark.range(800).toDF("id").withColumn("v", col("id")).coalesce(1))
    (0 until 6).foreach { k =>
      Snapshots.commit(spark, t,
        spark.range(1000 + k * 10, 1010 + k * 10).toDF("id")
          .withColumn("v", col("id")).coalesce(1))
    }
    val bigFile = dataFiles(t, 1).head
    // DVs on BOTH sides of the split: one suppressed row in the big
    // file (must carry forward) and one in a small file (must apply)
    graft.operators.DeleteRows.deleteKeysWithVectors(spark, t, "id",
      Seq(5L, 1005L))
    val before = Snapshots.read(spark, t).select("id").as[Long]
      .collect().toSet
    assert(before.size == 858)

    val bigLen = new java.io.File(bigFile).length
    val r = graft.operators.Optimize.compactSmall(spark, t,
      targetBytes = bigLen) // big file ≥ target/2, small ones under
    assert(r.inFiles == 6 && r.outFiles == 1,
      s"packed ${r.inFiles} into ${r.outFiles}")
    val entriesAfter = Snapshots.manifestEntries(t, r.version)
    assert(entriesAfter.contains(bigFile),
      "the big file must republish BY REFERENCE (file-granular entry)")
    // content invariant; the small-file DV applied in the rewrite
    assert(Snapshots.read(spark, t).select("id").as[Long].collect().toSet
      == before)
    // the big file's DV carried; the rewritten small files' DVs dropped
    val dv = Snapshots.deletionVectors(t, r.version)
    assert(dv.keySet == Set(bigFile), dv.keySet.toString)
    // the CALL face: a second run is a no-op (only one small bin left)
    val again = spark.sql(s"CALL $cat.system.compact_small('$t', " +
      s"target_bytes => $bigLen)")
    assert(again.as[(Int, Int, Int)].head()._2 == 0,
      "nothing small left to pack")
  }

  test("CALL restore rolls back by reference and reports both versions") {
    val t = mkTable(50, 2)
    Snapshots.commit(spark, t, spark.range(1000, 1010).toDF("id")
      .withColumn("v", col("id") * 10))
    assert(Snapshots.read(spark, t).count() == 60)
    val res = spark.sql(s"CALL $cat.system.restore('$t', 1)")
    assert(res.as[(Int, Int)].head() == ((1, 3)))
    assert(Snapshots.read(spark, t).count() == 50)
    assert(Snapshots.manifestEntries(t, 3) == Snapshots.manifestEntries(t, 1))
  }

  test("CALL vacuum drops out-of-retention manifests; the declared " +
    "default keep=1 applies when omitted") {
    val t = mkTable(40, 2)
    graft.operators.DeleteRows.deleteRange(spark, t, "id", 0L, 9L) // v2
    Snapshots.commit(spark, t,
      spark.range(2000, 2005).toDF("id").withColumn("v", col("id"))) // v3
    val vac = spark.sql(s"CALL $cat.system.vacuum(table => '$t')")
    assert(vac.columns.toSeq ==
      Seq("manifests_dropped", "data_files_deleted"))
    val (dropped, deleted) = vac.as[(Int, Int)].head()
    assert(dropped == 2 && deleted > 0)
    // current version still reads; history is gone by construction
    assert(Snapshots.read(spark, t).count() == 35)
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, t, Some(1)).count()
    }
  }

  test("CALL cluster_by leaves identical content in a bucket layout") {
    val t = mkTable(60, 3)
    val before = Snapshots.read(spark, t).as[(Long, Long)].collect().toSet
    val r = spark.sql(s"CALL $cat.system.cluster_by('$t', 'id', 4)")
    assert(r.as[(Int, Int, Int)].head()._3 == 4)
    assert(graft.sources.v2.BucketLayout.read(t, 2).exists(_.n == 4))
    assert(Snapshots.read(spark, t).as[(Long, Long)].collect().toSet
      == before)
  }

  test("unknown procedure fails loudly with the available list") {
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.frobnicate('/tmp/x')").collect()
    }
    // Spark wraps the catalog's error in FAILED_TO_LOAD_ROUTINE; the
    // available-procedures list rides the cause
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val msgs = chain(e).mkString(" | ")
    assert(msgs.contains("frobnicate") && msgs.contains("vacuum"), msgs)
  }

  test("a DELETE condition the V1 vocabulary cannot express exactly " +
    "falls back to the row-level rewrite and deletes the RIGHT rows") {
    // Spark's default SupportsDelete bridge converts V2 predicates with
    // pushdown-grade (lossy) rules: `a OR b` with untranslatable `a`
    // arrived as just `b` (measured) — which would delete a SUBSET,
    // silently. The strict converter refuses, so this routes through
    // ReplaceData: both arms of the OR must be gone.
    val t = mkTable()
    spark.sql(s"DELETE FROM $cat.snap.`$t` WHERE id % 10 = 7 OR id >= 95")
    val ids = Snapshots.read(spark, t).select("id").as[Long].collect().toSet
    assert(ids.size == 86, s"got ${ids.size}")
    assert(!ids.exists(i => i % 10 == 7 || i >= 95))
    // and on a merge-on-read table the same statement still lands right
    // (the DV route serves only exactly-translatable predicates)
    val t2 = mkTable()
    spark.sql(s"CREATE TABLE proc_strict (id BIGINT, v BIGINT) " +
      s"USING graft_snapshots OPTIONS (path '$t2', " +
      "dmlMode 'merge-on-read')")
    try {
      spark.sql("DELETE FROM proc_strict WHERE id % 10 = 7 OR id >= 95")
      val ids2 = spark.table("proc_strict").select("id").as[Long]
        .collect().toSet
      assert(ids2.size == 86 && !ids2.exists(i => i % 10 == 7 || i >= 95))
    } finally spark.sql("DROP TABLE proc_strict")
  }

  test("dmlMode 'merge-on-read': SQL DELETE records DVs and rewrites " +
    "ZERO files; the default table stays copy-on-write") {
    val t = mkTable()
    spark.sql(s"CREATE TABLE proc_mor (id BIGINT, v BIGINT) " +
      s"USING graft_snapshots OPTIONS (path '$t', " +
      s"dmlMode 'merge-on-read')")
    try {
      spark.sql("DELETE FROM proc_mor WHERE id >= 90")
      // zero data movement, suppression via the sidecar
      assert(Snapshots.manifestEntries(t, 2) == Snapshots.manifestEntries(t, 1))
      assert(Snapshots.deletionVectors(t, 2).nonEmpty)
      assert(spark.table("proc_mor").count() == 90)
      // NULL-predicate semantics preserved: nothing matches, no commit
      spark.sql("DELETE FROM proc_mor WHERE id > 10000")
      assert(Snapshots.currentVersion(t) == 2)
    } finally spark.sql("DROP TABLE proc_mor")

    // default (no dmlMode): the same delete rewrites the touched files
    val t2 = mkTable()
    spark.sql(s"DELETE FROM $cat.snap.`$t2` WHERE id >= 90")
    assert(Snapshots.deletionVectors(t2, 2).isEmpty)
    assert(Snapshots.manifestEntries(t2, 2) != Snapshots.manifestEntries(t2, 1))
    assert(spark.table(s"$cat.snap.`$t2`").count() == 90)
  }
}
