package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Shallow clone ([[Snapshots.cloneTable]]): zero-copy, independently
  * writable, and STRUCTURALLY safe against source vacuum via the
  * auto-pin tag — the hazard Delta documents away, closed. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  test("clone references the source's files (zero bytes under the " +
    "clone), reads identically, and evolves independently") {
    val src = SparkHygiene.scratchDir("clone_src")
    val dst = SparkHygiene.scratchDir("clone_dst") + "/t"
    Snapshots.commit(spark, src,
      spark.range(100).toDF("id").withColumn("v", lit("a"))
        .repartitionByRange(4, $"id"))
    val (v, tag) = Snapshots.cloneTable(spark, src, dst)
    assert(v == 1 && tag.startsWith("clone-"))
    // zero-copy: every clone entry points INTO the source directory
    assert(Snapshots.manifestEntries(dst, 1)
      .forall(_.startsWith(src)))
    assert(new java.io.File(s"$dst/data").listFiles() == null ||
      new java.io.File(s"$dst/data").listFiles().isEmpty)
    assert(Snapshots.read(spark, dst).count() == 100)
    // independent lineage: a write to the clone lands under the CLONE
    Snapshots.commit(spark, dst,
      spark.range(100, 120).toDF("id").withColumn("v", lit("b")))
    assert(Snapshots.read(spark, dst).count() == 120)
    assert(Snapshots.read(spark, src).count() == 100)
    // ...and a write to the source never shows in the clone
    Snapshots.commit(spark, src,
      spark.range(500, 600).toDF("id").withColumn("v", lit("c")))
    assert(Snapshots.read(spark, dst).count() == 120)
  }

  test("SOURCE vacuum cannot strand the clone: the auto-pin tag keeps " +
    "the cloned version's files; dropping the tag releases them") {
    val src = SparkHygiene.scratchDir("clone_vac_src")
    val dst = SparkHygiene.scratchDir("clone_vac_dst") + "/t"
    Snapshots.commit(spark, src,
      spark.range(50).toDF("id").repartitionByRange(2, $"id"))
    val (_, tag) = Snapshots.cloneTable(spark, src, dst)
    // source moves on: compact replaces every file, then vacuums hard
    graft.operators.Optimize.compactTable(spark, src, "id", 128L << 20)
    Snapshots.vacuum(spark, src, keepVersions = 1)
    // the clone still reads — its files survived the source vacuum
    assert(Snapshots.read(spark, dst).as[Long].collect().sorted
      .sameElements(0L until 50L))
    // releasing the pin lets the next source vacuum reclaim
    Snapshots.dropTag(src, tag)
    Snapshots.vacuum(spark, src, keepVersions = 1)
    intercept[Exception] { Snapshots.read(spark, dst).collect() }
  }

  test("clone of a DV'd version carries the suppressions; SQL CALL " +
    "face works end-to-end") {
    val src = SparkHygiene.scratchDir("clone_dv_src")
    val dst = SparkHygiene.scratchDir("clone_dv_dst") + "/t"
    Snapshots.commit(spark, src,
      spark.range(100).toDF("id").repartitionByRange(4, $"id"))
    graft.operators.DeleteRows.deleteKeysWithVectors(spark, src, "id",
      Seq(7L, 42L))
    val cat = "graft_clone"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    val row = spark.sql(s"CALL $cat.system.clone('$src', '$dst')")
      .collect().head
    assert(row.getInt(0) == 1 && row.getString(1).startsWith("clone-"))
    val ids = Snapshots.read(spark, dst).as[Long].collect().toSet
    assert(ids.size == 98 && !ids(7L) && !ids(42L))
    // the clone's own erase never touches the source
    graft.operators.DeleteRows.deleteKeysWithVectors(spark, dst, "id",
      Seq(1L))
    assert(Snapshots.read(spark, dst).count() == 97)
    assert(Snapshots.read(spark, src).count() == 98)
    // cloning onto an existing table refuses
    intercept[IllegalArgumentException] {
      Snapshots.cloneTable(spark, src, dst)
    }
  }
}
