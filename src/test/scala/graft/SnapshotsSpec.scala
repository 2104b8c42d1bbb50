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
    assert(atV1.inputFiles.forall(_.contains("/data/v1/")),
      "time travel must plan ONLY version-1 files")

    val latest = Snapshots.read(spark, t)
    assert(latest.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(latest.inputFiles.exists(_.contains("/data/v1/")) &&
      latest.inputFiles.exists(_.contains("/data/v2/")),
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
}
