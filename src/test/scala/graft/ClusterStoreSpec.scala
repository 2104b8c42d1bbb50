package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.ClusterStore

class ClusterStoreSpec extends SparkSpec {
  import spark.implicits._

  private def rows(pairs: (String, String, String)*) =
    pairs.toDF("PK", "SK", "description")

  test("merge is last-writer-wins and preserves untouched rows") {
    val path = Files.createTempDirectory("graft-store").toString + "/t"
    val store = new ClusterStore(spark, path, nBuckets = 16)
    store.merge(rows(("c1", "M", "v1"), ("c2", "M", "v1"), ("c3", "M", "v1")))
    store.merge(rows(("c2", "M", "v2")))
    val got = store.read().select("PK", "description")
      .as[(String, String)].collect().toMap
    assert(got == Map("c1" -> "v1", "c2" -> "v2", "c3" -> "v1"))
  }

  test("merge rewrites only touched bucket partitions (scale invariant)") {
    val path = Files.createTempDirectory("graft-store2").toString + "/t"
    val store = new ClusterStore(spark, path, nBuckets = 16)
    // seed many clusters spread over buckets
    store.merge(rows((0 until 50).map(i => (s"c$i", "M", "seed")): _*))
    val before = store.filesByBucket()

    // touch exactly one cluster
    store.merge(rows(("c7", "M", "updated")))
    val after = store.filesByBucket()

    val touchedBucket = spark.range(1)
      .select(pmod(xxhash64(lit("c7")), lit(16L))).as[Long].head()
    assert(after(touchedBucket) != before(touchedBucket))
    // every other bucket's files are byte-identical (same part files)
    (before.keySet - touchedBucket).foreach { b =>
      assert(after(b) == before(b), s"bucket $b was rewritten")
    }
    assert(store.read().filter(col("PK") === "c7").head().getString(2) == "updated")
  }

  test("rebuildBucketsFor repairs a bucket truncated by a crashed write") {
    val path = Files.createTempDirectory("graft-store4").toString + "/t"
    val nBuckets = 4 // few buckets => co-located clusters guaranteed
    val store = new ClusterStore(spark, path, nBuckets)
    val truth = rows((0 until 20).map(i => (s"c$i", "M", s"v$i")): _*)
    store.rebuildBucketsFor(truth, truth)

    // simulate a crash mid-write: one bucket directory is truncated,
    // losing every cluster that lived there
    val bucketOfC7 = spark.range(1)
      .select(pmod(xxhash64(lit("c7")), lit(nBuckets.toLong))).as[Long].head()
    val dir = new org.apache.hadoop.fs.Path(s"$path/bucket=$bucketOfC7")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dir, true)
    assert(store.read().count() < 20)

    // replaying the batch that touched c7 rebuilds the WHOLE bucket from
    // truth — co-bucketed clusters come back too (a merge of just c7's
    // upsert row could not restore them)
    store.rebuildBucketsFor(truth, truth.filter(col("PK") === "c7"))
    val got = store.read().select("PK", "description")
      .as[(String, String)].collect().toMap
    assert(got == (0 until 20).map(i => s"c$i" -> s"v$i").toMap)
  }

  test("rebuildBucketsFor leaves untouched buckets' files alone") {
    val path = Files.createTempDirectory("graft-store5").toString + "/t"
    val store = new ClusterStore(spark, path, nBuckets = 16)
    val truth = rows((0 until 50).map(i => (s"c$i", "M", "seed")): _*)
    store.rebuildBucketsFor(truth, truth)
    val before = store.filesByBucket()

    val truth2 = truth.withColumn("description",
      when(col("PK") === "c7", "updated").otherwise(col("description")))
    store.rebuildBucketsFor(truth2, truth2.filter(col("PK") === "c7"))
    val after = store.filesByBucket()

    val touchedBucket = spark.range(1)
      .select(pmod(xxhash64(lit("c7")), lit(16L))).as[Long].head()
    (before.keySet - touchedBucket).foreach { b =>
      assert(after(b) == before(b), s"bucket $b was rewritten")
    }
    assert(store.read().filter(col("PK") === "c7").head().getString(2) == "updated")
  }

  test("bucket-pruned point read returns one cluster's rows") {
    val path = Files.createTempDirectory("graft-store3").toString + "/t"
    val store = new ClusterStore(spark, path, nBuckets = 8)
    store.merge(rows(("c1", "M", "m"), ("c1", "A#1", "a"), ("c2", "M", "x")))
    val got = store.cluster("c1").select("SK").as[String].collect().toSet
    assert(got == Set("M", "A#1"))
  }
}
