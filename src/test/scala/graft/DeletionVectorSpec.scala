package graft

import org.apache.spark.sql.functions._

import graft.operators.DeleteRows
import graft.sources.Snapshots

/** MERGE-ON-READ row erasure via deletion vectors (VERDICT r13 #3):
  * a narrow DELETE records (file → suppressed row positions) in a
  * manifest-referenced sidecar instead of rewriting files.
  *
  * Pinned contracts:
  *  - a delete of a few rows on a multi-file table rewrites ZERO data
  *    files — the new manifest lists the same entries;
  *  - every reader agrees: Snapshots.read, the V2 connector (which
  *    drops to its position-skipping row path), SQL through the
  *    catalog;
  *  - time travel still reads the pre-delete rows;
  *  - a second erase MERGES positions; re-erasing the same keys is a
  *    no-op (no new version);
  *  - appends carry the vectors forward; copy-on-write surgery on a
  *    DV'd table applies the vectors while rewriting (never resurrects)
  *    and keeps the untouched files' vectors;
  *  - compaction reconciles to a DV-free layout;
  *  - footer-served aggregates refuse on DV'd versions (footer counts
  *    include suppressed rows);
  *  - vacuum sweeps sidecars no retained manifest references.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(n: Int = 100, files: Int = 4): String = {
    val t = SparkHygiene.scratchDir("dvtbl")
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

  test("a narrow delete rewrites ZERO files; all readers agree; " +
    "time travel keeps the rows") {
    val t = mkTable()
    val r = DeleteRows.deleteKeysWithVectors(spark, t, "id", Seq(7L, 42L))
    assert(r.version == 2 && r.filesRewritten == 0)
    // zero data movement: v2 publishes v1's entries verbatim
    assert(Snapshots.manifestEntries(t, 2) == Snapshots.manifestEntries(t, 1))
    assert(dataFiles(t, 2) == dataFiles(t, 1))
    // engine read
    val ids = Snapshots.read(spark, t).select("id").as[Long].collect().toSet
    assert(ids.size == 98 && !ids.contains(7L) && !ids.contains(42L))
    // V2 connector read (drops to the row path: no columnar transition)
    val v2 = spark.read.format("graft_snapshots").option("path", t).load()
    assert(v2.queryExecution.executedPlan.collect {
      case c: org.apache.spark.sql.execution.ColumnarToRowExec => c
    }.isEmpty, "a DV'd scan must plan row-based")
    assert(v2.count() == 98 &&
      v2.filter(col("id").isin(7L, 42L)).count() == 0)
    // time travel: v1 still has the rows
    assert(Snapshots.read(spark, t, Some(1)).count() == 100)
  }

  test("a second erase merges positions; re-erasing the same keys " +
    "is a no-op") {
    val t = mkTable()
    DeleteRows.deleteKeysWithVectors(spark, t, "id", Seq(7L, 42L))
    val r2 = DeleteRows.deleteKeysWithVectors(spark, t, "id", Seq(13L))
    assert(r2.version == 3)
    assert(Snapshots.read(spark, t).count() == 97)
    val dv = Snapshots.deletionVectors(t, 3)
    assert(dv.values.map(_.length).sum == 3, "positions must accumulate")
    // idempotence: the same keys again publish nothing
    val r3 = DeleteRows.deleteKeysWithVectors(spark, t, "id",
      Seq(7L, 13L, 42L))
    assert(r3.version == 3, "re-erasing suppressed keys must not commit")
  }

  test("appends carry the vectors; copy-on-write surgery applies them " +
    "and never resurrects") {
    val t = mkTable()
    DeleteRows.deleteKeysWithVectors(spark, t, "id", Seq(7L, 42L))
    // append: suppressed rows stay gone, new rows visible
    Snapshots.commit(spark, t,
      spark.range(100, 110).toDF("id").withColumn("v", col("id") * 10))
    val afterAppend = Snapshots.read(spark, t).select("id").as[Long]
      .collect().toSet
    assert(afterAppend.size == 108 && !afterAppend.contains(7L))
    // copy-on-write range erase touches every file (hash layout: full
    // range everywhere) — the rewrite must APPLY the vectors, so 7/42
    // may not come back, and the erased band must go
    DeleteRows.deleteRange(spark, t, "id", lo = 90L, hi = 104L)
    val ids = Snapshots.read(spark, t).select("id").as[Long].collect().toSet
    assert(!ids.contains(7L) && !ids.contains(42L),
      "a DV-suppressed row must not survive a copy-on-write rewrite")
    assert(ids.intersect((90L to 104L).toSet).isEmpty)
    assert(ids.size == 100 + 10 - 2 - 15)
  }

  test("compaction reconciles: the rewritten version is DV-free with " +
    "the same rows") {
    val t = mkTable()
    DeleteRows.deleteKeysWithVectors(spark, t, "id", Seq(7L, 42L))
    graft.operators.Optimize.zorder(spark, t, "id", "v",
      targetBytes = 1L << 20)
    val v = Snapshots.currentVersion(t)
    assert(Snapshots.deletionVectors(t, v).isEmpty,
      "a full rewrite must not carry deletion vectors")
    val ids = Snapshots.read(spark, t).select("id").as[Long].collect().toSet
    assert(ids.size == 98 && !ids.contains(7L))
  }

  test("footer aggregates refuse on DV'd versions; counts stay exact") {
    val t = mkTable()
    def countStar = spark.read.format("graft_snapshots").option("path", t)
      .load().groupBy().count()
    // before the delete: served from footers
    assert(countStar.queryExecution.executedPlan.toString
      .contains("FOOTER-AGG"))
    assert(countStar.head().getLong(0) == 100L)
    DeleteRows.deleteKeysWithVectors(spark, t, "id", Seq(7L))
    // after: the footer path must refuse (its counts include the
    // suppressed row) and the exact count flows through the row path
    assert(!countStar.queryExecution.executedPlan.toString
      .contains("FOOTER-AGG"))
    assert(countStar.head().getLong(0) == 99L)
  }

  test("merge-on-read UPDATE: old positions suppress, updated rows " +
    "append, zero files rewrite, time travel intact") {
    val t = mkTable()
    val v1Files = dataFiles(t, 1)
    val r = graft.operators.UpdateRows.updateWhereWithVectors(spark, t,
      col("id") % 25 === 0, Map("v" -> lit(-1L)))
    assert(r.version == 2 && r.rowsUpdated == 4)
    // every original file republished by reference + exactly one new dir
    assert(dataFiles(t, 2).intersect(v1Files) == v1Files,
      "a DV update must rewrite zero existing files")
    assert(Snapshots.manifestEntries(t, 2).size ==
      Snapshots.manifestEntries(t, 1).size + 1)
    // logically an update, on both read paths
    val engine = Snapshots.read(spark, t).select("id", "v")
      .as[(Long, Long)].collect().toMap
    assert(engine.size == 100)
    (0L until 100L).foreach { i =>
      assert(engine(i) == (if (i % 25 == 0) -1L else i * 10),
        s"id=$i wrong after DV update")
    }
    val v2 = spark.read.format("graft_snapshots").option("path", t).load()
    assert(v2.filter(col("v") === -1L).count() == 4)
    // pre-update version intact
    assert(Snapshots.read(spark, t, Some(1))
      .filter(col("v") === -1L).count() == 0)
    // a second DV update of an ALREADY-updated row supersedes it (the
    // appended row's position joins the map; no duplicates surface)
    graft.operators.UpdateRows.updateWhereWithVectors(spark, t,
      col("id") === 0L, Map("v" -> lit(-2L)))
    val after = Snapshots.read(spark, t).filter(col("id") === 0L)
      .select("v").as[Long].collect().toSeq
    assert(after == Seq(-2L), s"expected one superseding row, got $after")
    assert(Snapshots.read(spark, t).count() == 100)
  }

  test("a DV delete on a RENAMED (id-mapped) table resolves the key " +
    "column by id across old files") {
    val t = mkTable()
    val cat = "graft_dvr"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.sql(s"ALTER TABLE $cat.snap.`$t` RENAME COLUMN id TO row_id")
    val r = DeleteRows.deleteKeysWithVectors(spark, t, "row_id", Seq(7L))
    assert(r.filesRewritten == 0)
    val ids = Snapshots.read(spark, t).select("row_id").as[Long]
      .collect().toSet
    assert(ids.size == 99 && !ids.contains(7L))
  }

  test("a DV commit fails a snapshot stream unless ignoreChanges " +
    "(already-emitted rows were logically removed)") {
    val t = mkTable()
    DeleteRows.deleteKeysWithVectors(spark, t, "id", Seq(7L))
    def drain(ignore: Boolean): Long = {
      val out = SparkHygiene.scratchDir("dvstream_out")
      val ck = SparkHygiene.scratchDir("dvstream_ck")
      val q = spark.readStream.format("graft_snapshots").option("path", t)
        .option("ignoreChanges", ignore.toString).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(ignore = false)
    }
    assert(ex.getCause.getMessage.contains("deletion vectors"),
      ex.getCause.getMessage)
    // change-tolerant mode streams the append feed (v1's files — the
    // DV suppression applies to batch reads, not the replayed feed)
    assert(drain(ignore = true) == 100)
  }

  test("restore carries the restored version's vectors, not the " +
    "current ones; vacuum sweeps unreferenced sidecars") {
    val t = mkTable()
    DeleteRows.deleteKeysWithVectors(spark, t, "id", Seq(7L)) // v2
    DeleteRows.deleteKeysWithVectors(spark, t, "id", Seq(13L)) // v3
    Snapshots.restore(spark, t, 2) // v4: only 7 suppressed
    val ids = Snapshots.read(spark, t).select("id").as[Long].collect().toSet
    assert(!ids.contains(7L) && ids.contains(13L) && ids.size == 99)
    // three sidecars on disk (v2's, v3's, and the restore's explicit
    // copy for v4); retention to the last 1 version keeps only v4's
    val dvDir = new java.io.File(s"$t/dv")
    assert(dvDir.listFiles().length == 3)
    Snapshots.vacuum(spark, t, keepVersions = 1)
    assert(dvDir.listFiles().length == 1,
      "vacuum must sweep sidecars no retained manifest references")
    assert(Snapshots.read(spark, t).count() == 99)
  }
}
