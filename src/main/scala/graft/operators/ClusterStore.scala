package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned persistence for the clusters table — the 100 TB
  * shape of the upsert sink (SURVEY S9; VERDICT r1: "ClusterTable.merge
  * is a full-table read-modify-write per micro-batch").
  *
  * Layout: parquet partitioned by `bucket = pmod(xxhash64(PK), nBuckets)`.
  * A micro-batch touches a handful of clusters, so `merge`:
  *   1. computes the touched buckets from the upsert rows (small);
  *   2. reads ONLY those partitions (partition pruning — the scan's
  *      PartitionFilters carries `bucket IN (...)`);
  *   3. rewrites ONLY those partitions (dynamic partition overwrite).
  * Cost per batch is O(touched buckets), independent of table size —
  * the DynamoDB-batch-write equivalent, not a universe rewrite.
  *
  * Point lookups (S11/S12 `PK = x`) and the A9 scan also prune: queries
  * can derive the bucket from the PK predicate via [[bucketOf]].
  */
final class ClusterStore(spark: SparkSession, path: String, nBuckets: Int = 64) {

  import spark.implicits._

  def bucketOf(pk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(pk), lit(nBuckets.toLong))

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(path))

  /** Full table (bucket column dropped). */
  def read(): DataFrame =
    if (exists) spark.read.parquet(path).drop("bucket")
    else ClusterTable.emptyTable(spark)

  /** Rows of one cluster — bucket-pruned point read (S11). */
  def cluster(pk: String): DataFrame = {
    if (!exists) return ClusterTable.emptyTable(spark)
    spark.read.parquet(path)
      .filter(col("bucket") === bucketOf(lit(pk)) && col("PK") === pk)
      .drop("bucket")
  }

  /** Upsert with last-writer-wins on (PK,SK), rewriting only the buckets
    * the upsert touches.
    *
    * NOT crash-atomic: the dynamic partition overwrite deletes then
    * replaces whole buckets, so a crash mid-write can lose rows of
    * other clusters co-located in a touched bucket, and replaying the
    * same upserts merges against the truncated store and cannot restore
    * them. Callers that own an authoritative copy of the table (the
    * streaming pipeline's versioned state) should recover/write via
    * [[rebuildBucketsFor]], which rewrites complete buckets from truth
    * and is therefore self-healing under replay.
    */
  def merge(upserts: DataFrame): Unit = {
    val up = upserts.withColumn("bucket", bucketOf(col("PK")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (!exists) {
        up.write.partitionBy("bucket").mode("errorifexists").parquet(path)
        return
      }
      val touched = up.select("bucket").distinct().as[Long].collect()
      val current = spark.read.parquet(path)
        .filter(col("bucket").isin(touched: _*)) // partition-pruned scan
      val merged = current
        .join(up.select(col("PK"), col("SK")), Seq("PK", "SK"), "left_anti")
        .unionByName(up)
        // truncate lineage: parquet forbids overwriting a path that is
        // still referenced by the write's own input plan
        .localCheckpoint(true)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try merged.write.partitionBy("bucket").mode("overwrite").parquet(path)
      finally {
        graft.SparkHygiene.freeCheckpoint(merged)
        prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
    } finally up.unpersist()
  }

  /** Rewrite, from an authoritative table, every bucket that `touched`
    * rows land in. `truth` must contain ALL rows of the table (or at
    * least of the touched buckets); only the touched buckets are read
    * from it and rewritten — cost stays O(touched buckets), independent
    * of table size. Unlike [[merge]] this never reads the store itself,
    * so a replay after a crash mid-write restores complete bucket
    * contents (including co-bucketed clusters a truncated write lost).
    */
  def rebuildBucketsFor(truth: DataFrame, touched: DataFrame): Unit = {
    val touchedBuckets = touched.select(bucketOf(col("PK")).as("bucket"))
      .distinct().as[Long].collect()
    if (touchedBuckets.isEmpty) return
    val rows = truth.withColumn("bucket", bucketOf(col("PK")))
      .filter(col("bucket").isin(touchedBuckets: _*))
    if (!exists) {
      rows.write.partitionBy("bucket").mode("errorifexists").parquet(path)
      return
    }
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rows.write.partitionBy("bucket").mode("overwrite").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Data files per bucket partition — test/observability hook for
    * asserting untouched partitions are left alone.
    */
  def filesByBucket(): Map[Long, Set[String]] = {
    if (!exists) return Map.empty
    fs.listStatus(new Path(path)).toSeq
      .filter(_.getPath.getName.startsWith("bucket="))
      .map { dir =>
        val b = dir.getPath.getName.stripPrefix("bucket=").toLong
        b -> fs.listStatus(dir.getPath).map(_.getPath.getName)
          .filter(_.endsWith(".parquet")).toSet
      }.toMap
  }
}
