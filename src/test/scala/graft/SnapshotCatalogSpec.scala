package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.operators.Optimize
import graft.sources.Snapshots
import graft.sources.v2.{GraftBucketFunction, SnapshotCatalog}

/** Storage-partitioned joins over the snapshot catalog: two tables
  * bucket-clustered on their join key join with ZERO shuffle (and zero
  * broadcast) when read through [[SnapshotCatalog]]; the bucket
  * function's scalar twin matches the written layout byte-for-byte; and
  * an append after clustering degrades to a shuffling-but-correct join
  * instead of lying about co-partitioning.
  */
class SnapshotCatalogSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val cat = "graft_snap"

  private def withSpjConfs[T](f: => T): T = {
    val prevBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevBroadcast = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // force a non-broadcast join so shuffle ELIMINATION is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      prevBucketing.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      prevBroadcast.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }

  private def clusteredTable(rows: DataFrame, buckets: Int): String = {
    val t = SparkHygiene.scratchDir("spjtbl")
    Snapshots.commit(spark, t, rows)
    Optimize.clusterByBuckets(spark, t, "id", buckets)
    t
  }

  private def exchanges(plan: SparkPlan): Seq[String] = {
    val helper = this
    helper.collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        s"shuffle:${e.outputPartitioning}"
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        s"broadcast:${b.mode}"
    }
  }

  test("co-bucketed tables join with zero shuffle and zero broadcast") {
    withSpjConfs {
      val ta = clusteredTable(
        (0L until 400L).map(i => (i, s"name_$i")).toDF("id", "name"), 4)
      val tb = clusteredTable(
        (0L until 400L by 2L).map(i => (i, i * 1.5)).toDF("id", "score"), 4)
      val q = spark.table(s"$cat.snap.`$ta`")
        .join(spark.table(s"$cat.snap.`$tb`"), "id")
      assert(q.count() == 200)
      val ex = exchanges(q.queryExecution.executedPlan)
      assert(ex.isEmpty,
        s"expected a storage-partitioned join, found exchanges: $ex\n" +
          q.queryExecution.executedPlan)
      // sanity: it IS a real join over 4 key-grouped partitions
      assert(q.rdd.getNumPartitions == 4)
      assert(q.filter($"id" === 100L).select($"name", $"score")
        .as[(String, Double)].head() == (("name_100", 150.0)))
    }
  }

  test("the scalar bucket function matches the written layout") {
    withSpjConfs {
      val t = clusteredTable(
        (0L until 300L).map(i => (i * 7919L, s"d$i")).toDF("id", "name"), 8)
      // every file of bucket dir b holds only keys whose bucketId is b
      val spec = graft.sources.v2.BucketLayout.read(t,
        Snapshots.currentVersion(t)).get
      assert(spec.col == "id" && spec.n == 8)
      spec.entries.foreach { case (dir, b) =>
        val ids = spark.read.parquet(dir).select($"id").as[Long].collect()
        assert(ids.nonEmpty)
        ids.foreach(id =>
          assert(GraftBucketFunction.bucketId(id, 8) == b,
            s"key $id written to bucket $b but hashes to " +
              GraftBucketFunction.bucketId(id, 8)))
      }
      // and the scalar twin equals the write-side Column for a sample
      val viaExpr = spark.range(100)
        .select($"id", pmod(xxhash64($"id"), lit(8)).cast("int").as("b"))
        .as[(Long, Int)].collect()
      viaExpr.foreach { case (id, b) =>
        assert(GraftBucketFunction.bucketId(id, 8) == b)
      }
    }
  }

  test("SQL VERSION AS OF / TIMESTAMP AS OF resolve through the catalog") {
    withSpjConfs {
      val t = SparkHygiene.scratchDir("spj_tt")
      Snapshots.commit(spark, t,
        (0L until 40L).map(i => (i, s"a$i")).toDF("id", "name"))
      val betweenMs = System.currentTimeMillis()
      Thread.sleep(15)
      Snapshots.commit(spark, t,
        (40L until 100L).map(i => (i, s"a$i")).toDF("id", "name"))
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.snap.`$t` VERSION AS OF 1")
        .as[Long].head() == 40L)
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.snap.`$t`").as[Long].head() == 100L)
      val ts = new java.sql.Timestamp(betweenMs)
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.snap.`$t` TIMESTAMP AS OF '$ts'")
        .as[Long].head() == 40L)
    }
  }

  test("multi-file buckets group into co-located tasks, join exchange-free") {
    withSpjConfs {
      val ta = SparkHygiene.scratchDir("spjtbl_mf")
      Snapshots.commit(spark, ta,
        (0L until 800L).map(i => (i, s"n$i")).toDF("id", "name"))
      // ~200 rows/bucket split into ≤60-row files → >1 file per bucket
      Optimize.clusterByBuckets(spark, ta, "id", 4, maxRecordsPerFile = 60L)
      val spec = graft.sources.v2.BucketLayout.read(ta,
        Snapshots.currentVersion(ta)).get
      val filesPerBucket = spec.entries.keys.map { dir =>
        new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
      }
      assert(filesPerBucket.forall(_ > 1),
        s"expected multi-file buckets, got $filesPerBucket")
      val tb = clusteredTable(
        (0L until 800L by 4L).map(i => (i, i * 0.5)).toDF("id", "score"), 4)
      // the scan emits one key-tagged partition per file; Spark groups
      // key-equal partitions into one co-located task, so the join
      // still plans exchange-free over the multi-file layout
      val q = spark.table(s"$cat.snap.`$ta`")
        .join(spark.table(s"$cat.snap.`$tb`"), "id")
      assert(q.count() == 200)
      val ex = exchanges(q.queryExecution.executedPlan)
      assert(ex.isEmpty, s"expected SPJ over multi-file buckets: $ex")
      assert(q.rdd.getNumPartitions == 4)
    }
  }

  test("partially-clustered SPJ splits multi-file buckets instead of grouping") {
    withSpjConfs {
      val prev = Seq("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
        .map(k => k -> spark.conf.getOption(k))
      prev.foreach { case (k, _) => spark.conf.set(k, "true") }
      try {
        // the skewed side: every bucket split into many small files
        val ta = SparkHygiene.scratchDir("spj_pc_big")
        Snapshots.commit(spark, ta,
          (0L until 2000L).map(i => (i % 40L, i)).toDF("id", "payload"))
        Optimize.clusterByBuckets(spark, ta, "id", 4,
          maxRecordsPerFile = 100L)
        val tb = clusteredTable(
          (0L until 40L).map(i => (i, s"dim$i")).toDF("id", "name"), 4)
        val q = spark.table(s"$cat.snap.`$ta`")
          .join(spark.table(s"$cat.snap.`$tb`"), "id")
        assert(q.count() == 2000)
        val ex = exchanges(q.queryExecution.executedPlan)
        assert(ex.isEmpty, s"partially-clustered join still shuffled: $ex")
        // the skewed side's file splits stay SEPARATE tasks (the dim
        // partition replicates against each), instead of one
        // giant grouped task per bucket
        assert(q.rdd.getNumPartitions > 4,
          s"expected >4 split tasks, got ${q.rdd.getNumPartitions}")
      } finally prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    }
  }

  test("SQL DELETE FROM: file surgery, null semantics, pinned-version refusal") {
    withSpjConfs {
      val t = SparkHygiene.scratchDir("sqldel")
      Snapshots.commit(spark, t,
        (0L until 800L).map(i =>
          (i, if (i % 10 == 0) null else s"n$i"))
          .toDF("id", "name").repartitionByRange(8, $"id"))
      val v1Dir = Snapshots.manifestEntries(t, 1).head
      // range delete: footer stats keep 7 of 8 range-clustered files
      spark.sql(s"DELETE FROM $cat.snap.`$t` WHERE id >= 700")
      assert(Snapshots.currentVersion(t) == 2)
      assert(spark.table(s"$cat.snap.`$t`").count() == 700)
      // untouched files referenced verbatim (v2 lists v1's files
      // individually), v1 still time-travels
      val entriesAfter = Snapshots.manifestEntries(t, 2)
      assert(entriesAfter.count(_.contains(
        new org.apache.hadoop.fs.Path(v1Dir).getName)) >= 6,
        s"untouched files must survive by reference:\n$entriesAfter")
      assert(Snapshots.read(spark, t, Some(1)).count() == 800)
      // NULL predicate keeps the row (SQL semantics): name LIKE is not
      // pushed as a translatable filter, so use an IN over a null col
      spark.sql(s"DELETE FROM $cat.snap.`$t` WHERE name IN ('n5', 'n17')")
      val left = spark.table(s"$cat.snap.`$t`")
      assert(left.count() == 698)
      assert(left.filter($"name".isNull).count() == 70,
        "rows with NULL predicate value must be kept")
      // a no-op delete commits nothing
      val v = Snapshots.currentVersion(t)
      spark.sql(s"DELETE FROM $cat.snap.`$t` WHERE id >= 5000")
      assert(Snapshots.currentVersion(t) == v)
      // pinned-version relations refuse
      val e = intercept[Exception] {
        spark.sql(s"DELETE FROM $cat.snap.`$t` VERSION AS OF 1 WHERE id < 5")
      }
      assert(e.getMessage.toLowerCase.contains("delete") ||
        e.getMessage.contains("immutable"), e.getMessage)
    }
  }

  // Boundary, probed and documented rather than pinned: the physical
  // as-of exec does NOT ride SPJ — Spark's EnsureRequirements restricts
  // KeyGroupedPartitioning compatibility checks to its own join execs
  // (SortMergeJoin/ShuffledHashJoin), so a custom exec's
  // ClusteredDistribution is satisfied the ordinary way (hash
  // exchanges), even over co-bucketed inputs. Results stay correct.

  test("an append after clustering shuffles again but stays correct") {
    withSpjConfs {
      val ta = clusteredTable(
        (0L until 100L).map(i => (i, s"n$i")).toDF("id", "name"), 4)
      val tb = clusteredTable(
        (0L until 100L).map(i => (i, i * 2.0)).toDF("id", "score"), 4)
      Snapshots.commit(spark, ta,
        (100L until 120L).map(i => (i, s"n$i")).toDF("id", "name"))
      val q = spark.table(s"$cat.snap.`$ta`")
        .join(spark.table(s"$cat.snap.`$tb`"), "id")
      assert(q.count() == 100)
      assert(exchanges(q.queryExecution.executedPlan)
        .exists(_.startsWith("shuffle:")),
        "stale bucket layout must fall back to shuffling")
    }
  }
}
