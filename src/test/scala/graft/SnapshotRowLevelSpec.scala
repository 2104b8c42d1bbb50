package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Snapshots
import graft.sources.v2.{FileCommit, SnapshotCatalog}

/** SQL `UPDATE` / `MERGE INTO` on snapshot tables through group-based
  * row-level operations ([[graft.sources.v2.SnapshotRowLevelOperation]]):
  * copy-on-write at file granularity, reached from standard SQL DML.
  *
  * Pinned properties:
  *  - only files the condition can touch (by footer stats) rewrite;
  *    untouched files are republished by reference (same path);
  *  - non-matching rows of a REWRITTEN file survive byte-identically —
  *    the group scan hands back full files, never condition-filtered
  *    rows;
  *  - the pre-update version still time-travels;
  *  - a condition that prunes every file commits nothing;
  *  - MERGE INTO serves matched-update / matched-delete /
  *    not-matched-insert through the same replace-groups write;
  *  - a commit that lands between the statement's scan and its write
  *    is detected and refused (optimistic concurrency).
  */
class SnapshotRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private val cat = "graft_rl"

  private def withCatalog[T](f: => T): T = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    f
  }

  /** ids 0..99 range-clustered into 4 files (0-24 / 25-49 / 50-74 /
    * 75-99), each with a value and a tag column. */
  private def mkTable(): String = {
    val t = SparkHygiene.scratchDir("rowlvl")
    val df = spark.range(100).toDF("id")
      .withColumn("v", col("id") * 10)
      .withColumn("tag", lit("orig"))
    Snapshots.commit(spark, t, df.repartitionByRange(4, col("id")))
    t
  }

  /** Manifest entries expanded to parquet part files (entries may be
    * whole data/vN directories or single files — both read paths). */
  private def files(t: String, v: Int): Set[String] =
    Snapshots.manifestEntries(t, v).flatMap { e =>
      val f = new java.io.File(e)
      if (f.isDirectory)
        f.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath)
      else Seq(f.getAbsolutePath)
    }.toSet

  private def sqlTable(t: String): DataFrame = spark.table(s"$cat.snap.`$t`")

  test("UPDATE rewrites only footer-overlapping files; " +
    "non-matching rows of rewritten files survive") {
    withCatalog {
      val t = mkTable()
      val v1Files = files(t, 1)
      assert(v1Files.size == 4)

      spark.sql(s"UPDATE $cat.snap.`$t` SET tag = 'hit', v = v + 1 " +
        "WHERE id >= 10 AND id <= 30")

      assert(Snapshots.currentVersion(t) == 2)
      val v2Files = files(t, 2)
      // files [50-74] and [75-99] cannot overlap [10,30]: republished
      // by reference; the two overlapping files were replaced
      val keptByRef = v1Files.intersect(v2Files)
      assert(keptByRef.size == 2,
        s"expected 2 untouched files kept by reference, got $keptByRef")

      val out = sqlTable(t).orderBy("id").collect()
      assert(out.length == 100)
      out.foreach { r =>
        val id = r.getLong(0)
        if (id >= 10 && id <= 30) {
          assert(r.getString(2) == "hit", s"id=$id should be updated")
          assert(r.getLong(1) == id * 10 + 1)
        } else {
          // includes ids 0-9 and 31-49: NON-matching rows living in
          // REWRITTEN files — they must come through the copy branch
          assert(r.getString(2) == "orig", s"id=$id must not change")
          assert(r.getLong(1) == id * 10)
        }
      }

      // history: v1 still reads the original rows
      val v1 = Snapshots.read(spark, t, Some(1))
      assert(v1.filter(col("tag") === "hit").count() == 0)
      assert(v1.count() == 100)
    }
  }

  test("UPDATE whose condition prunes every file is a no-op commit") {
    withCatalog {
      val t = mkTable()
      spark.sql(s"UPDATE $cat.snap.`$t` SET tag = 'x' WHERE id >= 5000")
      assert(Snapshots.currentVersion(t) == 1,
        "a fully-pruned update must not publish a version")
      assert(sqlTable(t).filter(col("tag") === "x").count() == 0)
    }
  }

  test("UPDATE with a non-skippable condition still updates correctly " +
    "(every file scans, matching rows change, the rest copy through)") {
    withCatalog {
      val t = mkTable()
      spark.sql(s"UPDATE $cat.snap.`$t` SET tag = 'mod3' WHERE id % 3 = 0")
      val out = sqlTable(t).collect()
      assert(out.count(_.getString(2) == "mod3") == 34)
      assert(out.count(_.getString(2) == "orig") == 66)
      assert(out.length == 100)
    }
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    withCatalog {
      val t = mkTable()
      spark.range(90, 110).toDF("id")
        .withColumn("v", col("id") * 100)
        .createOrReplaceTempView("rl_src")

      spark.sql(
        s"""MERGE INTO $cat.snap.`$t` tgt
           |USING rl_src src ON tgt.id = src.id
           |WHEN MATCHED AND src.id < 95 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET v = src.v, tag = 'merged'
           |WHEN NOT MATCHED THEN INSERT (id, v, tag)
           |  VALUES (src.id, src.v, 'inserted')""".stripMargin)

      val out = sqlTable(t).orderBy("id").collect()
      // 0..89 untouched, 90..94 deleted, 95..99 updated, 100..109 inserted
      assert(out.length == 90 + 5 + 10)
      assert(out.count(_.getString(2) == "orig") == 90)
      val updated = out.filter(_.getString(2) == "merged")
      assert(updated.map(_.getLong(0)).toSeq == (95L to 99L))
      updated.foreach(r => assert(r.getLong(1) == r.getLong(0) * 100))
      val inserted = out.filter(_.getString(2) == "inserted")
      assert(inserted.map(_.getLong(0)).toSeq == (100L to 109L))
      assert(out.forall(r => r.getLong(0) < 90 || r.getLong(0) >= 95))

      // MERGE's affected groups come from the JOIN — runtime group
      // filtering (the matching-rows IN subquery) prunes the three
      // files whose id range contains no source key, so only the
      // [75-99] file rewrites and the rest republish by reference
      assert(Snapshots.currentVersion(t) == 2)
      assert(files(t, 1).intersect(files(t, 2)).size == 3,
        "merge must rewrite only files overlapping the source key range")

      // pre-merge version intact
      assert(Snapshots.read(spark, t, Some(1)).count() == 100)
    }
  }

  test("MERGE whose group filter matches ZERO target files still " +
    "publishes its NOT MATCHED inserts (never silently drops them)") {
    withCatalog {
      val t = mkTable()
      val v1Files = files(t, 1)
      // every source id is outside every file's footer range, so the
      // runtime group filter prunes ALL four files (_file IN () — the
      // scan plans zero groups) — but the right-outer join still emits
      // the NOT MATCHED insert rows, which MUST publish as an append
      // (ADVICE r13 high: these were deleted as spurious staging)
      spark.range(5000, 5005).toDF("id")
        .withColumn("v", col("id") * 100)
        .createOrReplaceTempView("rl_far")
      spark.sql(
        s"""MERGE INTO $cat.snap.`$t` tgt
           |USING rl_far src ON tgt.id = src.id
           |WHEN MATCHED THEN UPDATE SET tag = 'never'
           |WHEN NOT MATCHED THEN INSERT (id, v, tag)
           |  VALUES (src.id, src.v, 'inserted')""".stripMargin)
      assert(Snapshots.currentVersion(t) == 2,
        "inserts from a zero-match merge must publish a version")
      val out = sqlTable(t).collect()
      assert(out.length == 105)
      assert(out.count(_.getString(2) == "inserted") == 5)
      assert(out.count(_.getString(2) == "orig") == 100)
      // a pure append: all four original files republished by reference
      assert(files(t, 2).intersect(v1Files) == v1Files,
        "zero groups scanned means zero files replaced")
    }
  }

  test("MERGE with zero matches AND no insert arm is a no-op commit") {
    withCatalog {
      val t = mkTable()
      spark.range(5000, 5005).toDF("id").withColumn("v", lit(0L))
        .createOrReplaceTempView("rl_far2")
      spark.sql(
        s"""MERGE INTO $cat.snap.`$t` tgt
           |USING rl_far2 src ON tgt.id = src.id
           |WHEN MATCHED THEN UPDATE SET tag = 'never'""".stripMargin)
      assert(Snapshots.currentVersion(t) == 1,
        "nothing scanned and nothing written must not publish a version")
    }
  }

  test("MERGE preserves source-file clustering: each rewritten file's " +
    "rows stay together in one output file") {
    withCatalog {
      val t = mkTable()
      // touch every file so all four rewrite through the join shuffle
      spark.range(0, 100, 25).toDF("id").withColumn("v", lit(0L))
        .createOrReplaceTempView("rl_touch")
      spark.sql(
        s"""MERGE INTO $cat.snap.`$t` tgt
           |USING rl_touch src ON tgt.id = src.id
           |WHEN MATCHED THEN UPDATE SET tag = 'touched'""".stripMargin)
      // group integrity: the 25-row range of each ORIGINAL file must
      // land in exactly one rewritten file (the clustered+sorted write
      // keeps groups whole instead of interleaving them post-join)
      val placement = spark.sql(
        s"SELECT id DIV 25 AS grp, _file FROM $cat.snap.`$t`")
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getString(1)).toSet).toMap
      assert(placement.size == 4)
      placement.foreach { case (grp, fs) =>
        assert(fs.size == 1, s"group $grp scattered across $fs")
      }
      assert(spark.table(s"$cat.snap.`$t`")
        .filter(col("tag") === "touched").count() == 4)
    }
  }

  test("_file metadata column: per-row provenance, pruning-aware, " +
    "order-normalized") {
    withCatalog {
      val t = mkTable()
      // _file FIRST in the select list: the reader emits metadata slots
      // last, so readSchema must normalize — values still line up
      val rows = spark.sql(
        s"SELECT _file, id FROM $cat.snap.`$t` WHERE id < 30").collect()
      assert(rows.length == 30)
      rows.foreach(r => assert(r.getString(0).endsWith(".parquet")))
      val byFile = rows.groupBy(_.getString(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      // ids 0-29 span exactly two of the four range-clustered files
      // (the pushed filter prunes the other two from the scan)
      assert(byFile.size == 2, s"expected 2 source files, got $byFile")
      assert(byFile.values.map(_.size).toSet == Set(25, 5))
    }
  }

  test("a commit landing between scan and write is refused") {
    withCatalog {
      val t = mkTable()
      val op = new graft.sources.v2.SnapshotRowLevelOperation(
        t, sqlTable(t).schema,
        new graft.sources.v2.ParquetGroups.SerializableConf(
          spark.sparkContext.hadoopConfiguration),
        org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE,
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of("path", t)))
      // the statement's scan planned against v1...
      val scan = op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
      scan.toBatch.planInputPartitions()
      // ...but another writer commits v2 before our write commits
      Snapshots.commit(spark, t, Seq((200L, 0L, "late")).toDF("id", "v", "tag"))
      val write = op.newWriteBuilder(null) // info only feeds description/schema
      // the refusal is the manifest CAS itself (ADVICE r13): the commit
      // targets exactly scanned-version + 1, so the concurrent v2 makes
      // the CREATE_NEW fail atomically — no TOCTOU window between a
      // version check and the publish
      val ex = intercept[java.nio.file.FileAlreadyExistsException] {
        new graft.sources.v2.SnapshotReplaceGroupsWrite(
          t, sqlTable(t).schema,
          new graft.sources.v2.ParquetGroups.SerializableConf(
            spark.sparkContext.hadoopConfiguration), op)
          .commit(Array(FileCommit("/nonexistent.parquet", 1L)))
      }
      assert(ex.getMessage.contains("concurrent commit"))
      assert(write != null)
    }
  }
}
