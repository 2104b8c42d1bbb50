package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Tags — immutable named versions ([[Snapshots.createTag]]): the
  * training-data-lineage primitive. Pins survive vacuum, resolve from
  * SQL (`VERSION AS OF 'name'`, `snapshot_tags` TVF, CALL procedures),
  * and names never silently move. */
class TagSpec extends SparkSpec {
  import spark.implicits._

  private def threeVersions(): String = {
    val t = SparkHygiene.scratchDir("tag_tbl")
    (1 to 3).foreach { k =>
      Snapshots.commit(spark, t,
        spark.range((k - 1) * 10L, k * 10L).toDF("id")
          .withColumn("batch", lit(k)))
    }
    t
  }

  test("create/resolve/read: a tag names a version forever; re-tagging " +
    "refuses; dropping releases the name") {
    val t = threeVersions()
    assert(Snapshots.createTag(t, "gold", Some(2)) == 2)
    assert(Snapshots.createTag(t, "latest.run-1") == 3) // default: current
    assert(Snapshots.resolveTag(t, "gold") == 2)
    assert(Snapshots.readTag(spark, t, "gold").count() == 20)
    assert(Snapshots.tags(t) == Seq("gold" -> 2, "latest.run-1" -> 3))
    // immutable: the name never silently moves
    intercept[IllegalStateException] { Snapshots.createTag(t, "gold", Some(3)) }
    assert(Snapshots.resolveTag(t, "gold") == 2)
    // drop releases the name; a new pin may then re-use it
    assert(Snapshots.dropTag(t, "gold"))
    assert(!Snapshots.dropTag(t, "gold"))
    assert(Snapshots.createTag(t, "gold", Some(1)) == 1)
    // unknown tags and bad names refuse with the available list
    val ex = intercept[IllegalArgumentException] {
      Snapshots.resolveTag(t, "nope") }
    assert(ex.getMessage.contains("gold"))
    intercept[IllegalArgumentException] {
      Snapshots.createTag(t, "bad name with spaces") }
    // numeric names collide with VERSION AS OF version-number parsing
    intercept[IllegalArgumentException] { Snapshots.createTag(t, "42") }
    intercept[IllegalArgumentException] {
      Snapshots.createTag(t, "v99", Some(99)) }
  }

  test("a tagged version SURVIVES vacuum: manifest, data files, and " +
    "readability; dropping the tag releases it to the next vacuum") {
    val t = SparkHygiene.scratchDir("tag_vac")
    // v1, v2 appends; v3 COMPACTS (replaces every file) so the old
    // data dirs actually retire from the current manifest — the shape
    // where vacuum has something to reclaim and a pin has work to do
    Snapshots.commit(spark, t, spark.range(0L, 10L).toDF("id"))
    Snapshots.commit(spark, t, spark.range(10L, 20L).toDF("id"))
    Snapshots.createTag(t, "pinned", Some(1))
    graft.operators.Optimize.compactTable(spark, t, "id", 128L << 20)
    val (dropped1, _) = Snapshots.vacuum(spark, t, keepVersions = 1)
    // v2 dropped (and its incremental dir reclaimed); v1 pinned; v3 live
    assert(dropped1 == 1)
    assert(Snapshots.readTag(spark, t, "pinned")
      .as[Long].collect().sorted.sameElements(0L until 10L))
    assert(Snapshots.read(spark, t).count() == 20) // current untouched
    intercept[Exception] { Snapshots.read(spark, t, Some(2)).collect() }
    // release the pin: the next vacuum reclaims v1's manifest AND files
    Snapshots.dropTag(t, "pinned")
    val (dropped2, files2) = Snapshots.vacuum(spark, t, keepVersions = 1)
    assert(dropped2 == 1 && files2 > 0)
    intercept[Exception] { Snapshots.read(spark, t, Some(1)).collect() }
    assert(Snapshots.read(spark, t).count() == 20)
  }

  test("SQL surface: VERSION AS OF 'tag' resolves through the catalog; " +
    "snapshot_tags lists; CALL create_tag/drop_tag manage") {
    val t = threeVersions()
    val cat = "graft_tags"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.sql(s"CALL $cat.system.create_tag('$t', 'training_run_17', 2)")
    // the string version routes versionAsOf → tag resolution
    val tagged = spark.sql(
      s"SELECT * FROM $cat.snap.`$t` VERSION AS OF 'training_run_17'")
    assert(tagged.count() == 20)
    // numeric string still means a version number
    assert(spark.sql(s"SELECT * FROM $cat.snap.`$t` VERSION AS OF '1'")
      .count() == 10)
    val listed = spark.sql(s"SELECT * FROM snapshot_tags('$t')")
      .as[(String, Int)].collect().toSeq
    assert(listed == Seq("training_run_17" -> 2))
    val dropRow = spark.sql(
      s"CALL $cat.system.drop_tag('$t', 'training_run_17')")
      .collect().head
    assert(dropRow.getBoolean(1))
    assert(spark.sql(s"SELECT * FROM snapshot_tags('$t')").count() == 0)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.snap.`$t` " +
        "VERSION AS OF 'training_run_17'").collect()
    }
  }

  test("tags pin DV'd versions faithfully: the tagged read keeps the " +
    "tag-time suppressions after later deletes and a vacuum") {
    val t = SparkHygiene.scratchDir("tag_dv")
    Snapshots.commit(spark, t,
      spark.range(100).toDF("id").withColumn("v", lit("x"))
        .repartitionByRange(4, $"id"))
    graft.operators.DeleteRows.deleteKeysWithVectors(spark, t, "id",
      Seq(5L)) // v2: DV suppressing one row
    Snapshots.createTag(t, "post_erase") // pins v2
    graft.operators.DeleteRows.deleteKeysWithVectors(spark, t, "id",
      Seq(6L, 7L)) // v3
    Snapshots.vacuum(spark, t, keepVersions = 1)
    val pinned = Snapshots.readTag(spark, t, "post_erase")
      .as[(Long, String)].collect().map(_._1).toSet
    assert(pinned.size == 99 && !pinned(5L) && pinned(6L) && pinned(7L))
  }
}
