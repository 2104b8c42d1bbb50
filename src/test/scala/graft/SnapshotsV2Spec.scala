package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sources.Snapshots

/** The DataSource V2 connector over snapshot tables: batch reads with
  * time travel + manifest file skipping, type round-trips through the
  * record-API reader, schema evolution, and the version-offset
  * micro-batch stream (drain, incremental restart, per-version
  * batching, non-append refusal).
  */
class SnapshotsV2Spec extends SparkSpec {
  import spark.implicits._

  private def fmt = "graft_snapshots"

  private def freshTable(): String = {
    val d = SparkHygiene.scratchDir("v2tbl")
    // Snapshots.commit wants the dir to not pre-exist as a data dir;
    // scratchDir creates it empty, which is fine (commit writes under it)
    d
  }

  private def rows(n: Range): DataFrame =
    n.map(i => (i.toLong, s"doc_$i", i * 2.0)).toDF("id", "name", "score")

  test("batch read equals Snapshots.read; versionAsOf time-travels") {
    val t = freshTable()
    Snapshots.commit(spark, t, rows(0 until 100))
    Snapshots.commit(spark, t, rows(100 until 250))
    val latest = spark.read.format(fmt).option("path", t).load()
    assert(latest.count() == 250)
    assert(latest.select(sum($"id")).as[Long].head() ==
      Snapshots.read(spark, t).select(sum($"id")).as[Long].head())
    val v1 = spark.read.format(fmt).option("path", t)
      .option("versionAsOf", 1).load()
    assert(v1.count() == 100 && v1.agg(max($"id")).as[Long].head() == 99L)
  }

  test("timestampAsOf resolves from manifest publication times") {
    val t = freshTable()
    Snapshots.commit(spark, t, rows(0 until 10))
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    Snapshots.commit(spark, t, rows(10 until 30))
    val asOf = spark.read.format(fmt).option("path", t)
      .option("timestampAsOf", between.toString).load()
    assert(asOf.count() == 10)
  }

  test("column pruning reaches the scan and the reader") {
    val t = freshTable()
    Snapshots.commit(spark, t, rows(0 until 50))
    val q = spark.read.format(fmt).option("path", t).load()
      .select($"name")
    // the scan's readSchema is the pruned one
    val scans = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.head.scan.readSchema().fieldNames.toSeq == Seq("name"))
    assert(q.as[String].collect().sorted.head == "doc_0")
  }

  test("long-column filters skip non-overlapping files at plan time") {
    val t = freshTable()
    Snapshots.commit(spark, t,
      rows(0 until 800).repartitionByRange(8, $"id"))
    val q = spark.read.format(fmt).option("path", t).load()
      .filter($"id" >= 700L)
    val scans = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val desc = scans.head.scan.description()
    val kept = "files=(\\d+)".r.findFirstMatchIn(desc).get.group(1).toInt
    val skipped = "skipped=(\\d+)".r.findFirstMatchIn(desc).get.group(1).toInt
    assert(kept + skipped == 8, desc)
    assert(skipped >= 6, s"range-clustered table should skip most files: $desc")
    // and skipping is logically invisible
    assert(q.count() == 100)
    assert(q.agg(min($"id")).as[Long].head() == 700L)
  }

  test("string-column filters skip non-overlapping files at plan time " +
    "(equality and IN), and skipping is invisible") {
    val t = freshTable()
    // 8 files range-clustered on name: each file's footer carries a
    // tight binary [min, max] for the string column
    Snapshots.commit(spark, t,
      rows(0 until 800).repartitionByRange(8, $"name"))
    def scanOf(q: org.apache.spark.sql.DataFrame) =
      q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }.head
    val eq = spark.read.format(fmt).option("path", t).load()
      .filter($"name" === "doc_7")
    val descEq = scanOf(eq)
    val skippedEq = "skipped=(\\d+)".r.findFirstMatchIn(descEq).get
      .group(1).toInt
    assert(skippedEq >= 6, s"string-clustered table should skip: $descEq")
    assert(eq.count() == 1)
    val in = spark.read.format(fmt).option("path", t).load()
      .filter($"name".isin("doc_7", "doc_99"))
    val descIn = scanOf(in)
    assert("skipped=(\\d+)".r.findFirstMatchIn(descIn).get.group(1).toInt >= 5,
      s"string IN should skip: $descIn")
    assert(in.count() == 2)
    // full parity vs an unclustered read of the same predicate
    assert(spark.read.format(fmt).option("path", t).load()
      .filter($"name" >= "doc_95").count() ==
      rows(0 until 800).filter($"name" >= "doc_95").count())
  }

  test("a string-keyed runtime IN-filter from a broadcast dim prunes " +
    "files before tasks") {
    val t = freshTable()
    Snapshots.commit(spark, t,
      rows(0 until 800).repartitionByRange(8, $"name"))
    graft.sources.v2.SnapshotsDataSource.runtimeSkipCensus.remove(t)
    // dim filtered on a non-key attribute whose matching NAMES cluster
    // in one narrow range (same shape as the long-keyed test below)
    val dimDir = SparkHygiene.scratchDir("v2dimstr")
    rows(0 until 800)
      .select($"name".as("k"),
        (when($"name" === "doc_500", "hot").otherwise("cold")).as("grp"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"grp" === "hot")
    val fact = spark.read.format(fmt).option("path", t).load()
    val q = fact.join(dim, $"name" === $"k")
    assert(q.count() == 1, "join result wrong under string runtime pruning")
    val census = graft.sources.v2.SnapshotsDataSource.runtimeSkipCensus.get(t)
    assert(census != null, "string runtime skip census never recorded")
    assert(census._2 >= 6, s"kept/skipped = $census")
  }

  test("timestamps (INT96 default) and float arrays round-trip") {
    val t = freshTable()
    val df = Seq(
      (1L, new Timestamp(1723700000123456L / 1000), Array(0.25f, -1.5f)),
      (2L, null.asInstanceOf[Timestamp], Array.empty[Float]),
      (3L, new Timestamp(0L), null.asInstanceOf[Array[Float]]))
      .toDF("id", "ts", "vec")
    Snapshots.commit(spark, t, df)
    val back = spark.read.format(fmt).option("path", t).load()
      .as[(Long, Option[Timestamp], Option[Seq[Float]])].collect().sortBy(_._1)
    assert(back(0) == ((1L, Some(new Timestamp(1723700000123456L / 1000)),
      Some(Seq(0.25f, -1.5f)))))
    assert(back(1) == ((2L, None, Some(Seq.empty[Float]))))
    assert(back(2) == ((3L, Some(new Timestamp(0L)), None)))
  }

  test("the vectorized (columnar) read path is the default and is " +
    "row-identical to the record-API row path") {
    val t = freshTable()
    // every supported shape at once: bool/int/long/float/double/string/
    // binary/date/timestamp + float array, with nulls sprinkled, across
    // two commits (so one file predates the added column and must serve
    // null through BOTH readers)
    val df1 = spark.range(200).select(
      $"id",
      ($"id" % 2 === 0).as("flag"),
      $"id".cast("int").as("i"),
      ($"id" * 0.5f).cast("float").as("f"),
      ($"id" * 0.25).as("d"),
      concat(lit("name_"), $"id").as("name"),
      when($"id" % 7 === 0, lit(null)).otherwise(concat(lit("s"), $"id"))
        .cast("string").as("maybe"),
      encode(concat(lit("b"), $"id"), "UTF-8").as("bin"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        ($"id" % 365).cast("int")).as("dt"),
      timestamp_millis($"id" * 1000000L).as("ts"),
      array(($"id" * 1.0f).cast("float"),
        ($"id" * -2.0f).cast("float")).as("vec"))
    Snapshots.commit(spark, t, df1.repartition(3))
    Snapshots.commit(spark, t,
      df1.limit(5).withColumn("added", lit(42L)))
    def load(vectorized: Boolean) = spark.read.format(fmt)
      .option("path", t).option("vectorizedReader", vectorized.toString)
      .load()
    // the default plan really is columnar: a ColumnarToRow sits above
    // the BatchScan
    assert(load(true).queryExecution.executedPlan.collect {
      case c: org.apache.spark.sql.execution.ColumnarToRowExec => c
    }.nonEmpty, "the default V2 scan must produce columnar batches")
    assert(load(false).queryExecution.executedPlan.collect {
      case c: org.apache.spark.sql.execution.ColumnarToRowExec => c
    }.isEmpty, "vectorizedReader=false must keep the row path")
    // bit parity including the _file metadata column and null handling
    // (binary compared as hex — Row.toString renders raw bytes by
    // object identity)
    val cols = load(true).columns.map(c =>
      if (c == "bin") hex(col(c)).as("bin") else col(c)) :+ expr("_file")
    val vec = load(true).select(cols: _*).collect()
      .map(_.toString).sorted
    val row = load(false).select(cols: _*).collect()
      .map(_.toString).sorted
    assert(vec.length == 205 && vec.sameElements(row),
      "vectorized and row reads must agree row-for-row")
  }

  test("schema evolution: columns absent from old files read as null") {
    val t = freshTable()
    Snapshots.commit(spark, t, Seq((1L, "a")).toDF("id", "name"))
    Snapshots.commit(spark, t, Seq((2L, "b", 9.5)).toDF("id", "name", "score"))
    val evolved = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val back = spark.read.format(fmt).schema(evolved).option("path", t).load()
      .as[(Long, String, Option[Double])].collect().sortBy(_._1)
    assert(back.toSeq == Seq((1L, "a", None), (2L, "b", Some(9.5))))
  }

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.description()
    }.headOption.getOrElse("")

  test("global count/min/max are served from footers, zero data pages") {
    val t = freshTable()
    Snapshots.commit(spark, t, rows(0 until 100))
    Snapshots.commit(spark, t,
      Seq((999L, null.asInstanceOf[String], 1.0)).toDF("id", "name", "score"))
    val q = spark.read.format(fmt).option("path", t).load()
      .agg(count(lit(1)).as("n"), min($"id").as("lo"), max($"id").as("hi"),
        count($"name").as("named"))
    assert(scanDesc(q).contains("FOOTER-AGG"), scanDesc(q))
    val r = q.as[(Long, Long, Long, Long)].head()
    assert(r == ((101L, 0L, 999L, 100L)))
  }

  test("min/max over an all-null column serve null from footers") {
    val t = freshTable()
    Snapshots.commit(spark, t,
      Seq((1L, null.asInstanceOf[java.lang.Long]), (2L, null.asInstanceOf[java.lang.Long]))
        .toDF("id", "v"))
    val q = spark.read.format(fmt).option("path", t).load()
      .agg(min($"v").as("lo"), max($"v").as("hi"), count($"v").as("n"))
    assert(scanDesc(q).contains("FOOTER-AGG"), scanDesc(q))
    assert(q.as[(Option[Long], Option[Long], Long)].head() == ((None, None, 0L)))
  }

  test("filters and group-bys keep the row-level path, same answers") {
    val t = freshTable()
    Snapshots.commit(spark, t, rows(0 until 100))
    val filtered = spark.read.format(fmt).option("path", t).load()
      .filter($"id" >= 50L).agg(count(lit(1)).as("n"), max($"id").as("hi"))
    assert(!scanDesc(filtered).contains("FOOTER-AGG"), scanDesc(filtered))
    assert(filtered.as[(Long, Long)].head() == ((50L, 99L)))
    val grouped = spark.read.format(fmt).option("path", t).load()
      .groupBy(($"id" % 2).as("par")).agg(count(lit(1)).as("n"))
    assert(!scanDesc(grouped).contains("FOOTER-AGG"), scanDesc(grouped))
    assert(grouped.as[(Long, Long)].collect().toSet == Set((0L, 50L), (1L, 50L)))
  }

  test("SQL surface: CREATE TABLE USING, INSERT INTO, SELECT, footer agg") {
    val t = SparkHygiene.scratchDir("sql_tbl")
    spark.sql(s"CREATE TABLE graft_sql_tab (id BIGINT, name STRING) " +
      s"USING graft_snapshots OPTIONS (path '$t')")
    try {
      // CREATE supplies the schema (external metadata), so the FIRST
      // insert into the still-empty table works; each INSERT is one
      // manifest version
      spark.sql("INSERT INTO graft_sql_tab VALUES (1,'a'),(2,'b')")
      spark.sql("INSERT INTO graft_sql_tab VALUES (3,'c')")
      assert(Snapshots.currentVersion(t) == 2)
      assert(spark.sql("SELECT * FROM graft_sql_tab ORDER BY id")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
      val agg = spark.sql(
        "SELECT count(*) AS n, max(id) AS hi FROM graft_sql_tab")
      assert(scanDesc(agg).contains("FOOTER-AGG"), scanDesc(agg))
      assert(agg.as[(Long, Long)].head() == ((3L, 3L)))
    } finally spark.sql("DROP TABLE graft_sql_tab")
  }

  test("stream drains history, then a restart picks up ONLY new commits") {
    val t = freshTable()
    val out = SparkHygiene.scratchDir("v2out")
    val ckpt = SparkHygiene.scratchDir("v2ckpt")
    Snapshots.commit(spark, t, rows(0 until 40))
    Snapshots.commit(spark, t, rows(40 until 100))

    def drain(): Unit = {
      val q = spark.readStream.format(fmt).option("path", t).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }
    drain()
    assert(spark.read.parquet(out).count() == 100)

    // restart with the same checkpoint: the already-processed versions
    // must NOT replay; only the new commit arrives
    Snapshots.commit(spark, t, rows(100 until 130))
    drain()
    val all = spark.read.parquet(out)
    assert(all.count() == 130)
    assert(all.select(countDistinct($"id")).as[Long].head() == 130)
  }

  test("maxVersionsPerTrigger=1 yields one micro-batch per commit") {
    val t = freshTable()
    val out = SparkHygiene.scratchDir("v2out1")
    val ckpt = SparkHygiene.scratchDir("v2ckpt1")
    (0 until 3).foreach(i =>
      Snapshots.commit(spark, t, rows(i * 10 until (i + 1) * 10)))
    val q = spark.readStream.format(fmt).option("path", t)
      .option("maxVersionsPerTrigger", 1).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 3,
      batches.map(p => s"${p.batchId}:${p.numInputRows}").mkString(","))
    assert(batches.forall(_.numInputRows == 10))
    assert(spark.read.parquet(out).count() == 30)
  }

  test("readChangeFeed streams _change_type/_commit_version per commit") {
    val t = freshTable()
    val out = SparkHygiene.scratchDir("v2cdf")
    val ckpt = SparkHygiene.scratchDir("v2cdfck")
    (0 until 3).foreach(i =>
      Snapshots.commit(spark, t, rows(i * 5 until (i + 1) * 5)))
    val q = spark.readStream.format(fmt).option("path", t)
      .option("readChangeFeed", "true").load()
      .select($"id", $"_change_type", $"_commit_version")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.read.parquet(out)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.length == 15)
    assert(got.forall(_._2 == "insert"))
    // commit attribution: ids 0-4 → v1, 5-9 → v2, 10-14 → v3
    assert(got.forall { case (id, _, v) => v == id / 5 + 1 })
    // and the option is streaming-only on the batch path
    val e = intercept[Exception] {
      spark.read.format(fmt).option("path", t)
        .option("readChangeFeed", "true").load().count()
    }
    assert(e.getMessage.contains("STREAMING"), e.getMessage)
  }

  test("a non-append commit fails the stream unless ignoreChanges") {
    val t = freshTable()
    val out = SparkHygiene.scratchDir("v2out2")
    val ckpt = SparkHygiene.scratchDir("v2ckpt2")
    Snapshots.commit(spark, t,
      rows(0 until 400).repartitionByRange(4, $"id"))
    // drain v1 first so the erase is the only unprocessed commit
    val q1 = spark.readStream.format(fmt).option("path", t).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(60000)
    // copy-on-write erase: v2 removes entries
    graft.operators.DeleteRows.deleteRange(spark, t, "id", lo = 0L, hi = 99L)
    val q2 = spark.readStream.format(fmt).option("path", t).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination(60000)
    }
    assert(err.getMessage.contains("ignoreChanges") ||
      Option(err.getCause).exists(_.getMessage.contains("ignoreChanges")))
    // opting in replays the rewritten files (at-least-once)
    val ckpt3 = SparkHygiene.scratchDir("v2ckpt3")
    val out3 = SparkHygiene.scratchDir("v2out3")
    val q3 = spark.readStream.format(fmt).option("path", t)
      .option("ignoreChanges", "true").load()
      .writeStream.format("parquet")
      .option("path", out3).option("checkpointLocation", ckpt3)
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(60000)
    // full history replay under ignoreChanges: v1's 400 + v2's
    // rewritten survivors of the touched file(s)
    val n = spark.read.parquet(out3).count()
    assert(n >= 400, s"got $n")
  }

  test("runtime IN-filter from a broadcast dim prunes files before tasks") {
    val t = freshTable()
    Snapshots.commit(spark, t,
      rows(0 until 800).repartitionByRange(8, $"id"))
    graft.sources.v2.SnapshotsDataSource.runtimeSkipCensus.remove(t)
    // the classic star shape: the dim is FILTERED ON A NON-KEY
    // ATTRIBUTE whose matching keys happen to cluster in one narrow
    // range — statically uninferable onto the fact join key (unlike a
    // direct key-range dim filter, which InferFiltersFromConstraints
    // would copy across the join and the STATIC footer skip would
    // swallow). The dim must also be a SCAN, not a local relation:
    // Catalyst folds Filter-over-LocalRelation into the relation,
    // erasing the selective predicate the pruning rule looks for.
    val dimDir = SparkHygiene.scratchDir("v2dim")
    rows(0 until 800)
      .select($"id".as("k"),
        (when($"id" >= 100L && $"id" < 140L && $"id" % 10L === 0L, "hot")
          .otherwise("cold")).as("grp"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"grp" === "hot")
    val fact = spark.read.format(fmt).option("path", t).load()
    val q = fact.join(dim, $"id" === $"k")
    assert(q.select(sum($"id")).as[Long].head() ==
      (100L until 140L by 10L).sum,
      "join result wrong under runtime pruning")
    // run the JOIN plan itself so AQE finalizes; AQE query stages are
    // LEAF nodes, so descend with the adaptive helper, not collect
    q.collect()
    val helper =
      new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val scans = helper.collectWithSubqueries(q.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      s"no runtime filter reached the V2 scan:\n${q.queryExecution.executedPlan}")
    // ...and the re-plan dropped the 7 files whose [min,max] holds none
    // of the dim keys (800 rows range-clustered 8 ways → 100-row files;
    // all four surviving keys land in file [100,199])
    val census = graft.sources.v2.SnapshotsDataSource.runtimeSkipCensus.get(t)
    assert(census != null, "runtime skip census never recorded")
    assert(census == ((1, 7)), s"kept/skipped = $census")
  }

  test("runtime pruning is logically invisible vs the DPP-disabled plan") {
    val t = freshTable()
    Snapshots.commit(spark, t,
      rows(0 until 400).repartitionByRange(4, $"id"))
    val dimDir = SparkHygiene.scratchDir("v2dim2")
    rows(0 until 400)
      .select($"id".as("k"), ($"id" % 37L === 0L).as("hot"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"hot")
    def run(): Seq[(Long, String)] =
      spark.read.format(fmt).option("path", t).load()
        .join(dim, $"id" === $"k").select($"id", $"name")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    val pruned = run()
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try assert(run() == pruned)
    finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
  }

  test("reported statistics auto-broadcast a small snapshot table") {
    val tSmall = freshTable()
    Snapshots.commit(spark, tSmall, rows(0 until 50))
    val tBig = freshTable()
    Snapshots.commit(spark, tBig, rows(0 until 5000))
    // pin the STATIC planner decision (AQE would also get there from
    // runtime sizes, which would mask whether estimateStatistics works)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val small = spark.read.format(fmt).option("path", tSmall).load()
        .select($"id".as("k"), $"score".as("s"))
      val big = spark.read.format(fmt).option("path", tBig).load()
      val q = big.join(small, $"id" === $"k")
      val bhj = q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty,
        s"small snapshot side not broadcast:\n${q.queryExecution.executedPlan}")
      assert(q.count() == 50)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
