package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Snapshots
import graft.sources.v2.{FileCommit, SnapshotStreamingWrite, ParquetGroups}

/** The V2 WRITE side: append-only batch writes commit manifest
  * versions, the streaming sink is exactly-once under epoch replay,
  * and uncommitted task leftovers are unreferenced + vacuum-swept.
  */
class SnapshotWriteSpec extends SparkSpec {
  import spark.implicits._

  private def fmt = "graft_snapshots"

  test("batch append commits one version per write; reads equal") {
    val t = SparkHygiene.scratchDir("wr_tbl")
    // bootstrap the table (v1) through the engine API, then append
    // through the connector
    Snapshots.commit(spark, t,
      (0L until 50L).map(i => (i, s"n$i")).toDF("id", "name"))
    (50L until 120L).map(i => (i, s"n$i")).toDF("id", "name")
      .write.format(fmt).option("path", t).mode("append").save()
    assert(Snapshots.currentVersion(t) == 2)
    val back = spark.read.format(fmt).option("path", t).load()
    assert(back.count() == 120)
    assert(back.agg(sum($"id")).as[Long].head() == (0L until 120L).sum)
    // the appended version time-travels independently
    assert(Snapshots.read(spark, t, Some(1)).count() == 50)
    // arrays + timestamps written by the connector read back by Spark
    val t2 = SparkHygiene.scratchDir("wr_tbl2")
    Snapshots.commit(spark, t2, Seq(
      (1L, new java.sql.Timestamp(123456789L), Array(1.5f, -2f)))
      .toDF("id", "ts", "vec"))
    Seq((2L, new java.sql.Timestamp(987654321L), Array(0f)))
      .toDF("id", "ts", "vec")
      .write.format(fmt).option("path", t2).mode("append").save()
    val both = Snapshots.read(spark, t2)
      .as[(Long, java.sql.Timestamp, Seq[Float])].collect().sortBy(_._1)
    assert(both(1) == ((2L, new java.sql.Timestamp(987654321L), Seq(0f))))
  }

  test("empty append is a no-op version-wise") {
    val t = SparkHygiene.scratchDir("wr_empty")
    Snapshots.commit(spark, t, Seq((1L, "a")).toDF("id", "name"))
    Seq.empty[(Long, String)].toDF("id", "name")
      .write.format(fmt).option("path", t).mode("append").save()
    assert(Snapshots.currentVersion(t) == 1)
  }

  test("streaming sink: lakehouse-to-lakehouse pipe, restart adds only new data") {
    val src = SparkHygiene.scratchDir("wr_src")
    val dst = SparkHygiene.scratchDir("wr_dst")
    val ck = SparkHygiene.scratchDir("wr_ck")
    Snapshots.commit(spark, src, (0L until 30L).map(i => (i, i * 2)).toDF("id", "v"))
    Snapshots.commit(spark, dst, (-1L until 0L).map(i => (i, i)).toDF("id", "v"))

    def pipe(): Unit = {
      val q = spark.readStream.format(fmt).option("path", src)
        .option("maxVersionsPerTrigger", 1).load()
        .writeStream.format(fmt)
        .option("path", dst).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }
    pipe()
    assert(spark.read.format(fmt).option("path", dst).load().count() == 31)
    Snapshots.commit(spark, src, (30L until 45L).map(i => (i, i * 2)).toDF("id", "v"))
    pipe()
    val back = spark.read.format(fmt).option("path", dst).load()
    assert(back.count() == 46)
    assert(back.select(countDistinct($"id")).as[Long].head() == 46)
  }

  test("epoch replay is idempotent: a second commit of the same epoch publishes nothing") {
    val t = SparkHygiene.scratchDir("wr_epoch")
    Snapshots.commit(spark, t, Seq((1L, "a")).toDF("id", "name"))
    val conf = new ParquetGroups.SerializableConf(
      spark.sparkContext.hadoopConfiguration)
    val w = new SnapshotStreamingWrite(t,
      Seq((1L, "a")).toDF("id", "name").schema, conf, "q-test")
    // a real staged file so the duplicate path is exercised end to end
    val staged = s"$t/data/w-replay/part-e7-0-0.parquet"
    Seq((2L, "b")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(s"$t/data/w-replay-src")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$t/data/w-replay-src"))
      .find(_.getPath.getName.endsWith(".parquet")).get.getPath
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$t/data/w-replay"))
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
      new org.apache.hadoop.fs.Path(staged), false,
      spark.sparkContext.hadoopConfiguration)
    w.commit(7L, Array(FileCommit(staged, 1L)))
    assert(Snapshots.currentVersion(t) == 2)
    w.commit(7L, Array(FileCommit(staged, 1L))) // replay
    assert(Snapshots.currentVersion(t) == 2, "replayed epoch must not re-publish")

    // CRASH WINDOW between publish and marker: the replay guard is the
    // `#epoch=` header INSIDE the manifest, not the marker file — a
    // replay whose marker never landed must still see the epoch as
    // committed (the marker-first design silently DROPPED the epoch in
    // the inverse window; publish-first + manifest attribution has no
    // lossy window in either order)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$t/_snapshots/epoch-q-test-7.cmt"), false)
    w.commit(7L, Array(FileCommit(staged, 1L))) // replay without marker
    assert(Snapshots.currentVersion(t) == 2,
      "manifest epoch header must guard the replay when the marker is gone")
    assert(Snapshots.lastEpochOf(t, "q-test").contains(7L))
    // a LATER epoch still publishes normally (fresh staged file — the
    // v2-published one must not be listed twice)
    val staged8 = s"$t/data/w-replay/part-e8-0-0.parquet"
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
      new org.apache.hadoop.fs.Path(staged8), false,
      spark.sparkContext.hadoopConfiguration)
    w.commit(8L, Array(FileCommit(staged8, 1L)))
    assert(Snapshots.currentVersion(t) == 3)
    assert(Snapshots.lastEpochOf(t, "q-test").contains(8L))
  }

  test("overwrite publishes a REPLACE version; history still time-travels") {
    val t = SparkHygiene.scratchDir("wr_ovw")
    Snapshots.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    Seq((10L, "x"), (11L, "y"), (12L, "z")).toDF("id", "name")
      .write.format(fmt).option("path", t).mode("overwrite").save()
    val cur = spark.read.format(fmt).option("path", t).load()
    assert(cur.count() == 3 &&
      cur.agg(org.apache.spark.sql.functions.min($"id")).as[Long].head() == 10L)
    assert(Snapshots.read(spark, t, Some(1)).count() == 2,
      "pre-overwrite version must still time-travel")
    // SQL INSERT OVERWRITE through the catalog
    spark.conf.set("spark.sql.catalog.graft_snap",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.sql(s"INSERT OVERWRITE graft_snap.snap.`$t` " +
      "SELECT id AS id, CONCAT('q', id) AS name FROM range(5)")
    assert(spark.read.format(fmt).option("path", t).load().count() == 5)
    assert(Snapshots.read(spark, t, Some(2)).count() == 3)
  }

  test("overwrite-by-expression replaces exactly the matching slice in " +
    "ONE version; untouched files republish by reference; idempotent") {
    val t = SparkHygiene.scratchDir("wr_rw")
    // range-clustered: the condition's files are footer-prunable
    Snapshots.commit(spark, t,
      spark.range(100).toDF("id").withColumn("v", lit("old"))
        .repartitionByRange(4, $"id"))
    val entriesBefore = Snapshots.manifestEntries(t, 1)
    spark.conf.set("spark.sql.catalog.graft_snap",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    def reload(tag: String): Unit =
      spark.range(50, 75).toDF("id").withColumn("v", lit(tag))
        .writeTo(s"graft_snap.snap.`$t`")
        .overwrite($"id" >= 50 && $"id" < 75)
    reload("new")
    // one commit: delete + insert never observable apart
    assert(Snapshots.currentVersion(t) == 2)
    val after = Snapshots.read(spark, t).as[(Long, String)].collect().toSet
    assert(after.size == 100)
    assert(after.count(_._2 == "new") == 25)
    assert(after.filter(_._2 == "new").map(_._1).forall(i => i >= 50 && i < 75))
    // footer pruning: files fully outside [50, 75) republish verbatim
    // (kept entries are file-granular and may be scheme-qualified)
    def norm(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val keptRefs = Snapshots.manifestEntries(t, 2).map(norm)
      .filter(e => entriesBefore.map(norm).exists(b =>
        e == b || e.startsWith(b + "/")))
    assert(keptRefs.nonEmpty, "untouched files must republish by reference")
    // idempotent re-run: same slice replaced again, content stable
    reload("new")
    assert(Snapshots.currentVersion(t) == 3)
    assert(Snapshots.read(spark, t).as[(Long, String)].collect().toSet
      == after)
    // v1 still time-travels to the pre-reload rows
    assert(Snapshots.read(spark, t, Some(1)).as[(Long, String)]
      .collect().forall(_._2 == "old"))
    // a condition the V1 vocabulary cannot express exactly must refuse
    // loudly (the lossy-bridge hazard), never replace the wrong slice
    intercept[Exception] {
      spark.range(5).toDF("id").withColumn("v", lit("x"))
        .writeTo(s"graft_snap.snap.`$t`").overwrite($"id" % 10 === 0)
    }
    assert(Snapshots.currentVersion(t) == 3)
  }

  test("file-size hygiene: a task ROLLS its output at targetFileBytes — " +
    "one skewed task publishes several bounded files, content exact") {
    val t = SparkHygiene.scratchDir("wr_roll")
    // ONE partition carrying ~3 MB through a 256 KB target: the single
    // task must roll repeatedly instead of writing one oversized file
    spark.range(30000).toDF("id")
      .withColumn("pad", lpad(lit("x"), 100, "y"))
      .coalesce(1)
      .write.format("graft_snapshots")
      .option("path", t).option("targetFileBytes", 256L << 10)
      .mode("append").save()
    val conf = spark.sparkContext.hadoopConfiguration
    val files = Snapshots.manifestEntries(t, 1).flatMap { e =>
      val p = new org.apache.hadoop.fs.Path(e)
      val fs = p.getFileSystem(conf)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
          .map(s => (s.getPath.toUri.getPath, s.getLen)).toSeq
      else Seq((p.toUri.getPath, fs.getFileStatus(p).getLen))
    }
    assert(files.size > 1, s"expected a rolled multi-file commit, got $files")
    // every file bounded (roll cadence = 512 rows, so one row-group of
    // slack above the target is the contract, not a bug)
    assert(files.forall(_._2 < (1L << 20)),
      s"rolled files must stay bounded: $files")
    val back = spark.read.format("graft_snapshots").option("path", t).load()
    assert(back.count() == 30000)
    assert(back.agg(sum($"id")).as[Long].head ==
      30000L * 29999L / 2)
    // rolling composes with the manifest-as-committer contract: a
    // second append keeps the first commit's files by reference
    spark.range(5).toDF("id").withColumn("pad", lit("z"))
      .write.format("graft_snapshots").option("path", t)
      .mode("append").save()
    assert(spark.read.format("graft_snapshots").option("path", t).load()
      .count() == 30005)
  }

  test("concurrent APPENDERS all succeed: the CAS race auto-retries " +
    "(append entries recompute per attempt), no commit is lost") {
    val t = SparkHygiene.scratchDir("wr_conc")
    Snapshots.commit(spark, t, Seq((0L, "seed")).toDF("id", "name"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 16).map { k =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            // cloned session per thread: writes race only at the commit
            val s = spark.newSession()
            s.createDataFrame(
                java.util.List.of(org.apache.spark.sql.Row(k.toLong, s"w$k")),
                org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField("id",
                    org.apache.spark.sql.types.LongType, nullable = false),
                  org.apache.spark.sql.types.StructField("name",
                    org.apache.spark.sql.types.StringType, nullable = false))))
              .write.format("graft_snapshots").option("path", t)
              .mode("append").save()
          }
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // every append serialized into its own version; nothing was lost
    assert(Snapshots.currentVersion(t) == 17)
    val rows = Snapshots.read(spark, t).as[(Long, String)].collect().toMap
    assert(rows.size == 17 && (1 to 16).forall(k => rows(k.toLong) == s"w$k"))
  }

  test("an empty overwrite reads as an empty table, not a missing one") {
    val t = SparkHygiene.scratchDir("wr_ovw_empty")
    Snapshots.commit(spark, t, Seq((1L, "a")).toDF("id", "name"))
    Seq.empty[(Long, String)].toDF("id", "name")
      .write.format(fmt).option("path", t).mode("overwrite").save()
    val cur = spark.read.format(fmt).option("path", t).load()
    assert(cur.count() == 0 && cur.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(Snapshots.read(spark, t, Some(1)).count() == 1)
  }

  test("zombie-task leftovers are never referenced and vacuum sweeps them") {
    val t = SparkHygiene.scratchDir("wr_zombie")
    Snapshots.commit(spark, t, Seq((1L, "a")).toDF("id", "name"))
    Seq((2L, "b")).toDF("id", "name")
      .write.format(fmt).option("path", t).mode("append").save()
    // plant an uncommitted leftover in a staging-shaped dir
    val orphanDir = s"$t/data/w-zombie"
    Seq((99L, "zombie")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(orphanDir)
    assert(spark.read.format(fmt).option("path", t).load().count() == 2,
      "orphan must be invisible to reads")
    val (_, deleted) = Snapshots.vacuum(spark, t, keepVersions = 2)
    assert(deleted > 0, "vacuum should sweep the unreferenced staging files")
    assert(spark.read.format(fmt).option("path", t).load().count() == 2)
  }
}
