package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Snapshot log: append commits version monotonically, time travel
  * reads exactly the historical manifest's files, the latest read sees
  * everything, and a historical read is immune to later commits.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("commit/read/time-travel: versions isolate, manifests plan " +
    "exactly their directories") {
    val t = SparkHygiene.scratchDir("snap_tbl")
    val v1 = Snapshots.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val v2 = Snapshots.commit(spark, t, Seq((3L, "c")).toDF("id", "s"))
    assert(v1 == 1 && v2 == 2 && Snapshots.currentVersion(t) == 2)

    val atV1 = Snapshots.read(spark, t, Some(1))
    assert(atV1.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    assert(atV1.inputFiles.forall(_.contains("/data/v1-")),
      "time travel must plan ONLY version-1 files")

    val latest = Snapshots.read(spark, t)
    assert(latest.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(latest.inputFiles.exists(_.contains("/data/v1-")) &&
      latest.inputFiles.exists(_.contains("/data/v2-")),
      "the latest read spans both versions' directories")

    // a historical DataFrame planned BEFORE a new commit is unaffected
    val pinned = Snapshots.read(spark, t, Some(2))
    Snapshots.commit(spark, t, Seq((4L, "d")).toDF("id", "s"))
    assert(pinned.count() == 3, "snapshot isolation: v2 stays 3 rows")
    assert(Snapshots.read(spark, t).count() == 4)
  }

  test("reading a version that was never committed fails loudly") {
    val t = SparkHygiene.scratchDir("snap_tbl2")
    Snapshots.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, t, Some(7))
    }
  }

  test("racing committers: the loser fails AT THE MANIFEST (before any " +
    "reader can see its data) and its orphan data directory is swept " +
    "by vacuum") {
    val t = SparkHygiene.scratchDir("snap_race")
    Snapshots.commit(spark, t, Seq((1L, "base")).toDF("id", "s"))
    // deterministic race: the loser derives next=2 and fully writes its
    // (writer-unique) data directory, then stalls before publishing...
    val loserData = Snapshots.versionDataDir(t, 2)
    Seq((99L, "loser")).toDF("id", "s").write.parquet(loserData)
    // ...while the winner commits v2 end-to-end
    assert(Snapshots.commit(spark, t, Seq((2L, "winner")).toDF("id", "s")) == 2)
    // the loser wakes up and attempts ITS publish of v2 — CREATE_NEW
    // makes it fail; nothing it wrote was ever visible
    intercept[java.nio.file.FileAlreadyExistsException] {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$t/_snapshots/v2.list"),
        (Snapshots.manifestEntries(t, 1) :+ loserData)
          .mkString("\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
    }
    assert(Snapshots.read(spark, t).select("s").as[String].collect().toSet ==
      Set("base", "winner"), "the loser's rows must never surface")
    assert(new java.io.File(loserData).isDirectory, "orphan exists pre-GC")
    // orphan GC: vacuum retains BOTH committed versions yet still
    // sweeps the unreferenced orphan directory
    val (manifestsDropped, filesDeleted) = Snapshots.vacuum(spark, t, 2)
    assert(manifestsDropped == 0, "both versions are inside retention")
    assert(filesDeleted > 0, "the orphan's files must be reclaimed")
    assert(!new java.io.File(loserData).exists, "orphan dir swept")
    assert(Snapshots.read(spark, t, Some(1)).count() == 1 &&
      Snapshots.read(spark, t).count() == 2, "retained versions intact")
  }

  test("truly concurrent committers: every commit lands under a distinct " +
    "version or fails loudly; the table is exactly the union of winners") {
    val t = SparkHygiene.scratchDir("snap_race2")
    Snapshots.commit(spark, t, Seq((0L, "w0")).toDF("id", "s"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        gate.await()
        try results.add(Right(
          Snapshots.commit(spark, t, Seq((i.toLong, s"w$i")).toDF("id", "s")))
        )
        catch { case e: Throwable => results.add(Left(e)) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val (losers, winners) = results.asScala.toSeq.partition(_.isLeft)
    assert(winners.nonEmpty, "at least one racer must commit")
    val versions = winners.map(_.toOption.get)
    assert(versions.distinct.size == versions.size, "no version collision")
    assert(Snapshots.currentVersion(t) == 1 + versions.size)
    // loser failures (if the race window was hit) are the CREATE_NEW
    // manifest refusal, never a corrupted read
    losers.foreach(l => assert(l.swap.toOption.get != null))
    assert(Snapshots.read(spark, t).count() == 1 + versions.size,
      "the table is exactly base + one row per successful commit")
  }

  test("vacuum after a smaller retention tolerates already-dropped " +
    "manifests instead of throwing (ADVICE r12)") {
    val t = SparkHygiene.scratchDir("snap_revac")
    Snapshots.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    Snapshots.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    Snapshots.commit(spark, t, Seq((3L, "c")).toDF("id", "s"))
    val (d1, _) = Snapshots.vacuum(spark, t, keepVersions = 1)
    assert(d1 == 2, "v1 and v2 manifests drop")
    // a LARGER retention later must clamp to what survives, not throw
    val (d2, f2) = Snapshots.vacuum(spark, t, keepVersions = 3)
    assert(d2 == 0 && f2 == 0, "nothing left to drop, nothing to delete")
    assert(Snapshots.read(spark, t).select("s").as[String].collect().toSet ==
      Set("a", "b", "c"))
  }

  test("restore republishes a historical manifest VERBATIM as the new " +
    "latest: zero data movement, history preserved, undoable") {
    val t = SparkHygiene.scratchDir("snap_restore")
    Snapshots.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    Snapshots.commit(spark, t, Seq((3L, "c")).toDF("id", "s"))
    val v3 = Snapshots.restore(spark, t, 1)
    assert(v3 == 3 && Snapshots.currentVersion(t) == 3)
    // zero-copy: v3's manifest is byte-identical to v1's
    assert(Snapshots.manifestEntries(t, 3) == Snapshots.manifestEntries(t, 1))
    assert(Snapshots.read(spark, t).select("s").as[String].collect().toSet ==
      Set("a", "b"), "latest reads as v1 again")
    // the rolled-back-over version is STILL time-travelable
    assert(Snapshots.read(spark, t, Some(2)).count() == 3)
    // restore is undoable by another restore
    Snapshots.restore(spark, t, 2)
    assert(Snapshots.read(spark, t).count() == 3)
    intercept[IllegalArgumentException] { Snapshots.restore(spark, t, 9) }
  }

  test("AS OF TIMESTAMP resolves to the newest version published at or " +
    "before the asked instant") {
    val t = SparkHygiene.scratchDir("snap_asof")
    Snapshots.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(1100) // manifest mtimes must be distinguishable
    Snapshots.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    val afterV2 = System.currentTimeMillis()
    assert(Snapshots.versionAsOf(t, afterV1) == 1)
    assert(Snapshots.readAsOf(spark, t, afterV1).count() == 1)
    assert(Snapshots.versionAsOf(t, afterV2) == 2)
    assert(Snapshots.readAsOf(spark, t, afterV2).count() == 2)
    // asking for a time before the table existed fails loudly
    intercept[IllegalArgumentException] {
      Snapshots.versionAsOf(t, afterV1 - 3600_000L)
    }
  }

  test("pointer hygiene: an empty (pre-atomic-rename) pointer and an " +
    "in-flight staging temp are both invisible to readers") {
    val t = SparkHygiene.scratchDir("snap_ptr")
    Snapshots.publishPointer(spark, t, 1L, 0L, s"$t/state/v1")
    // a corrupt/empty pointer such as a non-atomic filesystem could
    // leave behind, and a staging temp mid-publish
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$t/_snapshots"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$t/_snapshots/v9.3.ptr"), Array.empty[Byte])
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$t/_snapshots/.v9.4.ptr.abcd1234.tmp"),
      "half".getBytes("UTF-8"))
    val entries = Snapshots.pointerEntries(spark, t)
    assert(entries == Seq((1L, 0L, s"$t/state/v1")),
      s"only the atomically-published pointer resolves, got $entries")
    // idempotent replay is still a no-op; mismatch still throws
    Snapshots.publishPointer(spark, t, 1L, 0L, s"$t/state/v1")
    intercept[IllegalArgumentException] {
      Snapshots.publishPointer(spark, t, 1L, 0L, s"$t/state/OTHER")
    }
  }
}
