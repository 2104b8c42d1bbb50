package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshots
import graft.sources.v2.SnapshotCatalog

/** Schema evolution on snapshot tables: each commit records its schema
  * as a `#schema=` header INSIDE the manifest (shares the manifest's
  * single-file CREATE_NEW atomicity), readers resolve the schema of
  * the version they travel to, files predating an added column serve
  * it as null, and maintenance commits inherit the nearest schema.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val cat = "graft_se"

  private def evolvedTable(): String = {
    val t = SparkHygiene.scratchDir("schemaevo")
    Snapshots.commit(spark, t,
      spark.range(50).toDF("id").withColumn("a", col("id") * 2))
    Snapshots.commit(spark, t,
      spark.range(50, 80).toDF("id").withColumn("a", col("id") * 2)
        .withColumn("b", lit("new")))
    t
  }

  test("an added column reads as null from pre-evolution files; " +
    "time travel keeps each version's own columns") {
    val t = evolvedTable()
    val cur = Snapshots.read(spark, t)
    assert(cur.columns.toSeq == Seq("id", "a", "b"))
    assert(cur.count() == 80)
    assert(cur.filter(col("b").isNull).count() == 50)
    assert(cur.filter(col("b") === "new").count() == 30)
    // v1 still reads with v1's schema — the added column doesn't
    // retroactively appear in history
    val v1 = Snapshots.read(spark, t, Some(1))
    assert(v1.columns.toSeq == Seq("id", "a"))
    assert(v1.count() == 50)
  }

  test("the V2 connector and SQL catalog serve the evolved schema; " +
    "a pinned version serves its own") {
    val t = evolvedTable()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    val cur = spark.table(s"$cat.snap.`$t`")
    assert(cur.columns.toSeq == Seq("id", "a", "b"))
    assert(cur.filter(col("b").isNull).count() == 50)
    val v1 = spark.read.format("graft_snapshots")
      .option("path", t).option("versionAsOf", 1).load()
    assert(v1.columns.toSeq == Seq("id", "a"))
  }

  test("maintenance commits inherit the schema; restore to a " +
    "pre-evolution version restores its narrower schema") {
    val t = evolvedTable()
    // copy-on-write erase commits a header-less manifest → inherits
    graft.operators.DeleteRows.deleteRange(spark, t, "id", 0L, 4L)
    val afterErase = Snapshots.read(spark, t)
    assert(afterErase.columns.toSeq == Seq("id", "a", "b"))
    assert(afterErase.count() == 75)
    // restore to v1 carries v1's schema explicitly
    Snapshots.restore(spark, t, 1)
    val restored = Snapshots.read(spark, t)
    assert(restored.columns.toSeq == Seq("id", "a"))
    assert(restored.count() == 50)
  }

  test("restore to a HEADERLESS pre-evolution version records the " +
    "restored schema explicitly (walk-back must not resurrect the " +
    "newer, wider header)") {
    // a table created before schema headers existed: v1 committed with
    // no #schema= line, then a later commit recorded a wider header
    val t = SparkHygiene.scratchDir("schemaevo")
    val d1 = s"$t/data/v1-legacy"
    spark.range(10).toDF("id").withColumn("a", col("id") * 2)
      .write.parquet(d1)
    Snapshots.commitManifest(t, Seq(d1)) // headerless, pre-evolution
    Snapshots.commit(spark, t,
      spark.range(10, 15).toDF("id").withColumn("a", col("id") * 2)
        .withColumn("b", lit("new"))) // v2 records [id, a, b]
    assert(Snapshots.read(spark, t).columns.toSeq == Seq("id", "a", "b"))
    // restore to the headerless v1: schemaJsonOf(1) is None, so the fix
    // (ADVICE r13) infers v1's schema from its files and records it —
    // otherwise the restore commit would inherit v2's wider header
    Snapshots.restore(spark, t, 1)
    val restored = Snapshots.read(spark, t)
    assert(restored.columns.toSeq == Seq("id", "a"),
      s"restored schema must be v1's own, got ${restored.columns.toSeq}")
    assert(restored.count() == 10)
  }

  test("ALTER TABLE ADD COLUMNS is a zero-data-movement metadata " +
    "commit") {
    val t = SparkHygiene.scratchDir("schemaevo")
    Snapshots.commit(spark, t,
      spark.range(20).toDF("id").withColumn("a", col("id") * 2))
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    val v1Entries = Snapshots.manifestEntries(t, 1)

    spark.sql(s"ALTER TABLE $cat.snap.`$t` ADD COLUMNS (score BIGINT)")
    assert(Snapshots.currentVersion(t) == 2)
    // same files by reference, widened schema, old rows read null
    assert(Snapshots.manifestEntries(t, 2) == v1Entries)
    val cur = spark.table(s"$cat.snap.`$t`")
    assert(cur.columns.toSeq == Seq("id", "a", "score"))
    assert(cur.filter(col("score").isNull).count() == 20)

    // adding an existing name refuses
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.snap.`$t` ADD COLUMNS (a BIGINT)")
    }.getMessage.contains("already exists"))
  }

  test("ALTER RENAME COLUMN via column-id mapping: zero data movement, " +
    "old files' bytes read under the new name, time travel keeps the " +
    "old name") {
    val t = SparkHygiene.scratchDir("schemaevo")
    Snapshots.commit(spark, t,
      spark.range(50).toDF("id").withColumn("a", col("id") * 2))
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    val v1Entries = Snapshots.manifestEntries(t, 1)
    spark.sql(s"ALTER TABLE $cat.snap.`$t` RENAME COLUMN a TO doubled")
    // pure metadata: entries republished by reference
    assert(Snapshots.manifestEntries(t, 2) == v1Entries)
    // every reader serves the old bytes under the new name
    val viaCat = spark.table(s"$cat.snap.`$t`")
    assert(viaCat.columns.toSeq == Seq("id", "doubled"))
    assert(viaCat.select(sum(col("doubled"))).head().getLong(0) ==
      (0L until 50L).map(_ * 2).sum)
    val viaEngine = Snapshots.read(spark, t)
    assert(viaEngine.columns.toSeq == Seq("id", "doubled"))
    assert(viaEngine.filter(col("doubled") === 98L).count() == 1)
    // the row (non-vectorized) V2 path agrees
    val viaRow = spark.read.format("graft_snapshots").option("path", t)
      .option("vectorizedReader", "false").load()
    assert(viaRow.select(sum(col("doubled"))).head().getLong(0) ==
      (0L until 50L).map(_ * 2).sum)
    // time travel: v1 still reads the OLD name
    assert(Snapshots.read(spark, t, Some(1)).columns.toSeq == Seq("id", "a"))
    // appends after the rename write the NEW name; both eras read
    Snapshots.commit(spark, t,
      spark.range(50, 60).toDF("id").withColumn("doubled", col("id") * 2))
    assert(Snapshots.read(spark, t).select(sum(col("doubled")))
      .head().getLong(0) == (0L until 60L).map(_ * 2).sum)
  }

  test("ALTER DROP COLUMN never resurrects: re-adding the name gets a " +
    "fresh id, so old bytes stay dead") {
    val t = SparkHygiene.scratchDir("schemaevo")
    Snapshots.commit(spark, t,
      spark.range(30).toDF("id").withColumn("a", col("id") * 2))
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.sql(s"ALTER TABLE $cat.snap.`$t` DROP COLUMN a")
    assert(spark.table(s"$cat.snap.`$t`").columns.toSeq == Seq("id"))
    spark.sql(s"ALTER TABLE $cat.snap.`$t` ADD COLUMNS (a BIGINT)")
    val out = spark.table(s"$cat.snap.`$t`")
    assert(out.columns.toSeq == Seq("id", "a"))
    assert(out.filter(col("a").isNotNull).count() == 0,
      "re-added column must NOT serve the dropped column's old bytes")
    assert(Snapshots.read(spark, t).filter(col("a").isNotNull).count() == 0)
    // the dropped era still time-travels with its bytes
    assert(Snapshots.read(spark, t, Some(1))
      .filter(col("a") === 58L).count() == 1)
  }

  test("RENAME/DROP refuse on a legacy table whose files carry no " +
    "field ids") {
    val t = SparkHygiene.scratchDir("schemaevo")
    // legacy construction: raw parquet (no ids) + headerless manifest
    val d1 = s"$t/data/v1-legacy"
    spark.range(10).toDF("id").withColumn("a", col("id") * 2)
      .write.option("spark.sql.parquet.fieldId.write.enabled", "false")
      .parquet(d1)
    Snapshots.commitManifest(t, Seq(d1))
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    val ex = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.snap.`$t` RENAME COLUMN a TO b")
    }
    assert(ex.getMessage.contains("column-id mapping"), ex.getMessage)
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.snap.`$t` DROP COLUMN a")
    }.getMessage.contains("column-id mapping"))
  }

  test("MERGE WITH SCHEMA EVOLUTION auto-widens the target, keeps " +
    "untouched files by reference, and pre-evolution files serve null") {
    val t = SparkHygiene.scratchDir("schemaevo")
    Snapshots.commit(spark, t,
      spark.range(100).toDF("id").withColumn("a", col("id") * 2)
        .repartitionByRange(4, col("id")))
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    // expand manifest entries (dirs or files) to parquet parts
    def files(v: Int): Set[String] = Snapshots.manifestEntries(t, v)
      .flatMap { e =>
        val f = new java.io.File(e)
        if (f.isDirectory)
          f.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
            .map(_.getAbsolutePath)
        else Seq(f.getAbsolutePath)
      }.toSet
    val v1Files = files(1)
    spark.range(90, 110).toDF("id")
      .withColumn("a", col("id") * 2)
      .withColumn("extra", concat(lit("x"), col("id")))
      .createOrReplaceTempView("se_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.snap.`$t` tgt
         |USING se_src src ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET extra = src.extra
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.table(s"$cat.snap.`$t`")
    assert(out.columns.toSeq == Seq("id", "a", "extra"))
    assert(out.count() == 110)
    // pre-evolution rows in untouched files serve the new column null
    assert(out.filter(col("id") < 75 && col("extra").isNull).count() == 75)
    assert(out.filter(col("extra").startsWith("x")).count() == 20)
    // the evolution commit + the merge: only the file holding 90..99
    // rewrote; the other three v1 files survive by reference
    val curFiles = files(Snapshots.currentVersion(t))
    assert(v1Files.intersect(curFiles).size == 3,
      s"expected 3 files kept by reference: $v1Files vs $curFiles")
    // v1 still time-travels with its own narrower schema
    assert(Snapshots.read(spark, t, Some(1)).columns.toSeq == Seq("id", "a"))
  }

  test("snapshot_history serves the version log from manifests alone") {
    val t = evolvedTable()
    val h = spark.sql(s"SELECT * FROM snapshot_history('$t') ORDER BY version")
      .collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(h.map(_.getInt(2)).toSeq == Seq(2, 3)) // [id,a] then [id,a,b]
  }

  test("SQL UPDATE backfills an added column across pre-evolution " +
    "files (copy-on-write under the evolved schema)") {
    val t = evolvedTable()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.sql(s"UPDATE $cat.snap.`$t` SET b = 'backfilled' WHERE b IS NULL")
    val out = spark.table(s"$cat.snap.`$t`")
    assert(out.filter(col("b").isNull).count() == 0)
    assert(out.filter(col("b") === "backfilled").count() == 50)
    assert(out.filter(col("b") === "new").count() == 30)
    // pre-backfill version unchanged
    assert(Snapshots.read(spark, t, Some(2))
      .filter(col("b").isNull).count() == 50)
  }
}
