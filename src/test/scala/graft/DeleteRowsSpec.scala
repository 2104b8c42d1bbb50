package graft

import org.apache.spark.sql.functions._

import graft.operators.DeleteRows
import graft.sources.Snapshots

/** Copy-on-write erasure: logically a filter, physically file surgery —
  * untouched files are republished BY REFERENCE (byte-identical paths,
  * never rewritten), only stat-overlapping files rewrite, the prior
  * version still time-travels to the pre-erasure rows, and a
  * no-overlap erase is a no-op commit.
  */
class DeleteRowsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val t = SparkHygiene.scratchDir("delrows") + "/t"
    val rows = (0L until 800L).map(i => (i, s"payload_$i")).toDF("id", "v")
    // 8 range-clustered files with disjoint id ranges
    Snapshots.commit(spark, t, rows.repartitionByRange(8, col("id")))
    t
  }

  test("erasing a contiguous band rewrites ONLY the overlapping files; " +
    "every other v1 file is referenced verbatim in the v2 manifest") {
    val t = freshTable()
    val v1Files = Snapshots.manifestEntries(t, 1).flatMap { d =>
      new java.io.File(d).listFiles.toSeq
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
    }
    assert(v1Files.size == 8, s"expected 8 range files, got ${v1Files.size}")
    val res = DeleteRows.deleteRange(spark, t, "id", 150L, 249L)
    assert(res.version == 2)
    // [150, 249] spans at most two 100-wide range files (plus boundary)
    assert(res.filesRewritten >= 1 && res.filesRewritten <= 3,
      s"band should touch 1-3 of 8 files, rewrote ${res.filesRewritten}")
    assert(res.filesRewritten + res.filesKept == 8)
    // manifest entries carry the Hadoop `file:` scheme; normalize
    val v2 = Snapshots.manifestEntries(t, 2).map(_.stripPrefix("file:"))
    val keptRefs = v2.filter(v1Files.contains)
    assert(keptRefs.size == res.filesKept,
      s"kept files must appear as verbatim v1 paths in v2: $v2")
    // logical contract: v2 = v1 minus the band
    val got = Snapshots.read(spark, t).select("id").as[Long].collect().toSet
    assert(got == (0L until 800L).filterNot(i => i >= 150 && i <= 249).toSet)
    // time travel: v1 is untouched
    assert(Snapshots.read(spark, t, Some(1)).count() == 800)
    // surviving payloads byte-equal the originals
    val v2Rows = Snapshots.read(spark, t).as[(Long, String)].collect().toMap
    assert(v2Rows(0L) == "payload_0" && v2Rows(799L) == "payload_799")
  }

  test("an erase range overlapping no file's stats is a NO-OP: same " +
    "version, nothing rewritten") {
    val t = freshTable()
    val res = DeleteRows.deleteRange(spark, t, "id", 5000L, 6000L)
    assert(res.version == 1 && res.filesRewritten == 0 && res.filesKept == 8)
    assert(Snapshots.currentVersion(t) == 1)
    assert(Snapshots.read(spark, t).count() == 800)
  }

  test("vacuum completes the erasure: out-of-retention manifests drop, " +
    "the superseded (pre-erasure) bytes are physically deleted, files " +
    "referenced by the retained version survive untouched") {
    val t = freshTable()
    val res = DeleteRows.deleteRange(spark, t, "id", 150L, 249L)
    val keptFiles = Snapshots.manifestEntries(t, 2)
      .map(_.stripPrefix("file:")).filter(_.endsWith(".parquet"))
    val (manifests, deleted) = Snapshots.vacuum(spark, t, keepVersions = 1)
    assert(manifests == 1, "v1's manifest must drop")
    // physically gone: exactly the files the erase superseded (the
    // touched originals) — their bytes held the erased rows
    assert(deleted == res.filesRewritten,
      s"expected the ${res.filesRewritten} superseded files deleted, got $deleted")
    // v1 is unreachable by construction
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, t, Some(1)).count()
    }
    // the retained version still reads completely, its by-reference
    // files untouched on disk
    assert(Snapshots.read(spark, t).count() == 700)
    keptFiles.foreach(f => assert(new java.io.File(f).isFile, s"lost $f"))
  }

  test("an erase that kills EVERY row of the touched files commits a " +
    "kept-only manifest — no empty data directory is ever published " +
    "(ADVICE r12)") {
    val t = SparkHygiene.scratchDir("delrows_empty") + "/t"
    // two files with exactly-known disjoint ranges via two commits
    Snapshots.commit(spark, t,
      (0L until 100L).map(i => (i, s"a_$i")).toDF("id", "v").coalesce(1))
    Snapshots.commit(spark, t,
      (100L until 200L).map(i => (i, s"b_$i")).toDF("id", "v").coalesce(1))
    val v2Dirs = Snapshots.manifestEntries(t, 2)
    val res = DeleteRows.deleteRange(spark, t, "id", 0L, 99L)
    assert(res.version == 3 && res.filesRewritten == 1 && res.filesKept == 1)
    // v3 must reference ONLY files living inside pre-existing version
    // directories — no fresh data directory for an empty rewrite
    val v3 = Snapshots.manifestEntries(t, 3).map(_.stripPrefix("file:"))
    assert(v3.nonEmpty && v3.forall(e => v2Dirs.exists(d => e.startsWith(d + "/"))),
      s"v3 must reference ONLY pre-existing files (no fresh data dir): $v3")
    assert(!new java.io.File(s"$t/data").listFiles.exists(_.getName.startsWith("v3")),
      "no v3 data directory may exist on disk")
    assert(Snapshots.read(spark, t).select("id").as[Long].collect().toSet ==
      (100L until 200L).toSet)
    assert(Snapshots.read(spark, t, Some(2)).count() == 200, "time travel intact")
  }

  test("a FULL-TABLE erase publishes a readable schema-only empty version") {
    val t = SparkHygiene.scratchDir("delrows_wipe") + "/t"
    Snapshots.commit(spark, t,
      (0L until 50L).map(i => (i, s"x_$i")).toDF("id", "v").coalesce(1))
    val res = DeleteRows.deleteRange(spark, t, "id", 0L, 49L)
    assert(res.version == 2 && res.filesRewritten == 1 && res.filesKept == 0)
    val wiped = Snapshots.read(spark, t)
    assert(wiped.count() == 0, "v2 is empty")
    assert(wiped.columns.toSeq == Seq("id", "v"),
      "the empty version still carries the table schema")
    assert(Snapshots.read(spark, t, Some(1)).count() == 50, "v1 time-travels")
  }

  test("key-list erase prunes with the BLOOM manifest: only the keys' " +
    "home files rewrite on a hash-distributed table, kept files are " +
    "referenced verbatim, and v1 still time-travels (VERDICT r12 #5)") {
    val t = SparkHygiene.scratchDir("delrows_keys") + "/t"
    val rows = (0L until 800L).map(i => (i, s"payload_$i")).toDF("id", "v")
    // hash-distributed: every file's [min,max] id range spans ~everything,
    // so footer-range pruning would rewrite ALL files — the bloom's case
    Snapshots.commit(spark, t, rows.repartition(8, col("id")))
    val v1Files = Snapshots.manifestEntries(t, 1).flatMap { d =>
      new java.io.File(d).listFiles.toSeq
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
    }
    assert(v1Files.size == 8)
    val keys = Seq(17L, 351L, 600L)
    // ground truth: the files that actually hold the keys
    val homes = v1Files.filter(f =>
      spark.read.parquet(f).filter(col("id").isin(keys: _*)).count() > 0)
    val res = DeleteRows.deleteKeys(spark, t, "id", keys)
    assert(res.version == 2)
    assert(res.filesRewritten >= homes.size && res.filesRewritten < 8,
      s"bloom pruning must touch the ${homes.size} home files (plus rare " +
        s"false positives), never all 8 — rewrote ${res.filesRewritten}")
    assert(res.filesRewritten + res.filesKept == 8)
    val v2 = Snapshots.manifestEntries(t, 2).map(_.stripPrefix("file:"))
    assert(v2.count(v1Files.contains) == res.filesKept,
      "kept files must appear as verbatim v1 paths in v2")
    // logical contract + time travel
    val got = Snapshots.read(spark, t).select("id").as[Long].collect().toSet
    assert(got == (0L until 800L).toSet -- keys)
    assert(Snapshots.read(spark, t, Some(1)).count() == 800)
  }

  test("a key-list erase whose keys are absent is a NO-OP (bloom " +
    "might-contain finds no file)") {
    val t = SparkHygiene.scratchDir("delrows_keys2") + "/t"
    Snapshots.commit(spark, t,
      (0L until 200L).map(i => (i, s"p_$i")).toDF("id", "v")
        .repartition(4, col("id")))
    val res = DeleteRows.deleteKeys(spark, t, "id", Seq(5000L, 6000L))
    assert(res.version == 1 && res.filesRewritten == 0)
    assert(Snapshots.read(spark, t).count() == 200)
  }

  test("deleteKeys consumes persisted bloom sidecars: an authoritative " +
    "sidecar replaces the key-column scan entirely, and a geometry " +
    "mismatch falls back to computing") {
    import graft.sources.Manifest
    val t = SparkHygiene.scratchDir("delrows_sidecar") + "/t"
    Snapshots.commit(spark, t,
      (0L until 200L).map(i => (i, s"p_$i")).toDF("id", "v")
        .repartition(4, col("id")))
    val dataDir = Snapshots.manifestEntries(t, 1).head
    val files = new java.io.File(dataDir).listFiles.toSeq
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    // an all-zero sidecar claims NO file can contain any key: if the
    // erase becomes a no-op despite key 5 existing, the sidecar — not
    // a data scan — drove the prune (the persisted-stats trust model:
    // filters are authoritative, exactly like a table format's stats)
    files.map(f => (f, Seq.fill(512)(0L), 1 << 15, 5))
      .toDF("path", "words", "bits", "hashes")
      .coalesce(1).write.mode("overwrite").parquet(s"$dataDir/_bloom_id")
    val res0 = DeleteRows.deleteKeys(spark, t, "id", Seq(5L))
    assert(res0.version == 1 && res0.filesRewritten == 0,
      "the all-zero sidecar must preempt the scan and prune every file")
    // a geometry-mismatched sidecar must be IGNORED (recompute), never
    // trusted: mismatched filters would produce false negatives
    Manifest.persistBlooms(spark, dataDir, "id", bits = 1 << 10, hashes = 3)
    val res1 = DeleteRows.deleteKeys(spark, t, "id", Seq(5L))
    assert(res1.version == 2 && res1.filesRewritten >= 1,
      "mismatched sidecar geometry must fall back to computing blooms")
    assert(!Snapshots.read(spark, t).select("id").as[Long]
      .collect().contains(5L))
    // the honest sidecar: persisted with the probe geometry, consumed,
    // and the erase still lands exactly
    val dirs2 = Snapshots.manifestEntries(t, 2)
    dirs2.filter(d => new java.io.File(d).isDirectory)
      .foreach(d => Manifest.persistBlooms(spark, d, "id"))
    val res2 = DeleteRows.deleteKeys(spark, t, "id", Seq(17L, 101L))
    assert(res2.version == 3 && res2.filesRewritten >= 1)
    val ids = Snapshots.read(spark, t).select("id").as[Long].collect().toSet
    assert(ids == (0L until 200L).toSet -- Seq(5L, 17L, 101L))
    // retention sweep tolerates sidecar DIRECTORIES inside dead version
    // dirs (they are parquet directories, not plain marker files)
    Snapshots.vacuum(spark, t, keepVersions = 1)
    assert(Snapshots.read(spark, t).count() == 197)
  }

  test("repeated erasures chain: each commits one more version, reads " +
    "compose, and every prior version remains readable") {
    val t = freshTable()
    DeleteRows.deleteRange(spark, t, "id", 0L, 99L)
    DeleteRows.deleteRange(spark, t, "id", 700L, 799L)
    assert(Snapshots.currentVersion(t) == 3)
    assert(Snapshots.read(spark, t).count() == 600)
    assert(Snapshots.read(spark, t, Some(2)).count() == 700)
    assert(Snapshots.read(spark, t, Some(1)).count() == 800)
  }
}
