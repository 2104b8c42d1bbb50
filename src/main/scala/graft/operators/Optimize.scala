package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{call_function, col, lit, pmod, xxhash64}

import graft.sources.Snapshots
import graft.sources.v2.BucketLayout

/** OPTIMIZE ZORDER — multi-dimensional re-clustering of a snapshot
  * table as a maintenance COMMIT (the Delta `OPTIMIZE t ZORDER BY
  * (a, b)` shape): read the current version, interleave the two
  * cluster columns' bits into one Morton key (the engine's codegen'd
  * `z_interleave`, see [[graft.functions.ZInterleaveExpr]]),
  * range-partition + sort on that key, and publish the rewritten
  * layout as the next version through the ordinary manifest commit —
  * so the rewrite is atomic, the pre-optimize version still
  * time-travels, a concurrent reader never sees a half-rewritten
  * table, and [[Snapshots.vacuum]] reclaims the superseded files after
  * retention.
  *
  * Why Z-order and not a second range-cluster: [[Compaction]]'s 1-D
  * range layout makes footer min/max stats surgical on the sort key
  * and USELESS on every other column (each file spans the full domain
  * of the others). The Morton curve keeps both dimensions locally
  * contiguous, so every output file covers a small rectangle of
  * (a, b) space and per-file [lo, hi] stats prune point/range
  * predicates on EITHER column — the property OptimizeSpec measures
  * through the V2 connector's file-skip counts. At 100 TB this is the
  * difference between "fast on the cluster key, full scan on the
  * second access path" and one layout serving both.
  *
  * Cost = one read + one range exchange + one write of the current
  * version — the floor for any rewrite; file count is planned from the
  * input BYTE total (free from the listing), like [[Compaction]].
  */
object Optimize {

  case class Report(version: Int, inFiles: Int, inBytes: Long, outFiles: Int)

  /** Rewrite the table's current version Z-ordered on `(colA, colB)`
    * (integral columns in [0, 2^32) — out-of-domain values error
    * rather than scramble the curve) and commit it as the next
    * version. Returns the new version and the file-count accounting.
    */
  def zorder(spark: SparkSession, tableDir: String,
             colA: String, colB: String, targetBytes: Long): Report = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val cur = Snapshots.currentVersion(tableDir)
    require(cur > 0, s"no snapshots under $tableDir")
    val conf = spark.sparkContext.hadoopConfiguration
    val inFiles = Snapshots.manifestEntries(tableDir, cur).flatMap { e =>
      val p = new Path(e)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getLen)
      else Seq(st.getLen)
    }
    val inBytes = inFiles.sum
    val n = math.max(1L, (inBytes + targetBytes - 1) / targetBytes).toInt
    val out = Snapshots.versionDataDir(tableDir, cur + 1)
    // range-partition on the Morton key (disjoint z-ranges per file),
    // then sort within each partition so every file's footer stats are
    // tight on BOTH source columns, then drop the key (a projection
    // above the sort — row order is preserved into the writer)
    Snapshots.read(spark, tableDir, Some(cur))
      .withColumn("__z", call_function("z_interleave", col(colA), col(colB)))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("error")
      .option(org.apache.spark.sql.internal.SQLConf
        .PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
      .parquet(out)
    // CAS at cur+1: the rewrite read version cur, so a commit racing in
    // must fail the optimize atomically, not be silently replaced
    val v = Snapshots.commitManifest(tableDir, Seq(out),
      expectedVersion = Some(cur))
    val outFiles = {
      val p = new Path(out)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p).count(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    Report(v, inFiles.size, inBytes, outFiles)
  }

  /** OPTIMIZE (1-D compaction) — rewrite the table's current version
    * range-clustered on `sortCol` into ~`targetBytes` files and commit
    * it as the next version: the snapshot-table twin of
    * [[Compaction.compact]] (which rewrites a raw directory in place),
    * with the manifest commit providing atomicity, time travel to the
    * pre-compaction layout, and vacuum-based reclamation. Reading
    * through [[Snapshots.read]] makes the rewrite DELETION-VECTOR
    * AWARE: suppressed rows stay out of the output and the new version
    * commits DV-FREE (the explicit empty map below — the compaction IS
    * the reconciliation step of the merge-on-read story, restoring the
    * vectorized V2 read path), and re-stamps field ids so legacy
    * id-less files become id-mapped (RENAME-ready) in one rewrite.
    */
  def compactTable(spark: SparkSession, tableDir: String,
                   sortCol: String, targetBytes: Long): Report = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val cur = Snapshots.currentVersion(tableDir)
    require(cur > 0, s"no snapshots under $tableDir")
    val conf = spark.sparkContext.hadoopConfiguration
    val inFiles = Snapshots.manifestEntries(tableDir, cur).flatMap { e =>
      val p = new Path(e)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getLen)
      else Seq(st.getLen)
    }
    val inBytes = inFiles.sum
    val n = math.max(1L, (inBytes + targetBytes - 1) / targetBytes).toInt
    val out = Snapshots.versionDataDir(tableDir, cur + 1)
    Snapshots.read(spark, tableDir, Some(cur))
      .repartitionByRange(n, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("error")
      .option(org.apache.spark.sql.internal.SQLConf
        .PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
      .parquet(out)
    val v = Snapshots.commitManifest(tableDir, Seq(out),
      expectedVersion = Some(cur),
      dv = Some(Map.empty)) // reconciled: the DV-aware read applied them
    val outFiles = {
      val p = new Path(out)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p).count(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    Report(v, inFiles.size, inBytes, outFiles)
  }

  /** INCREMENTAL OPTIMIZE — bin-pack only the SMALL files (the Delta
    * `OPTIMIZE` default, as opposed to [[compactTable]]'s full
    * rewrite): files smaller than `targetBytes / 2` coalesce into
    * ~`targetBytes` outputs, every other file republishes BY REFERENCE.
    * This is the maintenance shape that scales — a nightly run costs
    * O(bytes written since the last run), never O(table), so the
    * small-file tax of frequent streaming/append commits is paid down
    * continuously without ever rewriting the compacted bulk.
    *
    * Deletion-vector interplay: touched (small) files rewrite through
    * the DV-aware read — their suppressions apply and vanish; kept
    * files' DVs carry forward verbatim (the manifest-commit inherit),
    * so the commit is always exactly content-preserving. The rewrite
    * coalesces rather than shuffles (bin-packing needs no
    * redistribution — pure IO). No-op (no new version) when fewer than
    * two small files exist.
    */
  def compactSmall(spark: SparkSession, tableDir: String,
                   targetBytes: Long): Report = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val cur = Snapshots.currentVersion(tableDir)
    require(cur > 0, s"no snapshots under $tableDir")
    val conf = spark.sparkContext.hadoopConfiguration
    val files: Seq[(String, Long)] =
      Snapshots.manifestEntries(tableDir, cur).flatMap { e =>
        val p = new Path(e)
        val fs = p.getFileSystem(conf)
        val st = fs.getFileStatus(p)
        if (st.isDirectory)
          fs.listStatus(p).toSeq
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(s => (s.getPath.toUri.getPath, s.getLen))
        else Seq((p.toUri.getPath, st.getLen))
      }
    val (small, big) = files.partition(_._2 < targetBytes / 2)
    if (small.size < 2)
      return Report(cur, 0, 0L, 0)
    val smallBytes = small.map(_._2).sum
    val n = math.max(1L, (smallBytes + targetBytes - 1) / targetBytes).toInt
    // rewrite the touched files under the version's schema (id-mapped
    // when the table is), applying exactly THEIR deletion vectors
    val norm: String => String = p => new Path(p).toUri.getPath
    val touchedSet = small.map(f => norm(f._1)).toSet
    val touchedDv = Snapshots.deletionVectors(tableDir, cur)
      .filter { case (f, _) => touchedSet.contains(norm(f)) }
    val paths = small.map(_._1)
    val base = Snapshots.schemaOf(tableDir, cur) match {
      case Some(s) if Snapshots.hasFieldIds(s) =>
        Snapshots.idMappedRead(spark, s, paths)
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
    val out = Snapshots.versionDataDir(tableDir, cur + 1)
    Snapshots.applyDeletionVectors(spark, base, touchedDv)
      .coalesce(n)
      .write.mode("error")
      .option(org.apache.spark.sql.internal.SQLConf
        .PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
      .parquet(out)
    val outFiles = {
      val p = new Path(out)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p).count(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    // every small-file row may be DV-suppressed (a post-wipe compact):
    // an all-empty rewrite must not reference a part-less directory.
    // With big files around, publish them alone; with nothing left at
    // all, refuse the compaction as a no-op (the DV'd version stays
    // correct as-is; the orphan output dir is vacuum-swept garbage) —
    // emptying a table is DELETE's job, not OPTIMIZE's.
    if (outFiles == 0 && big.isEmpty) return Report(cur, 0, 0L, 0)
    val entries =
      if (outFiles > 0) (big.map(_._1) :+ out).sorted
      else big.map(_._1).sorted
    val v = Snapshots.commitManifest(tableDir, entries,
      expectedVersion = Some(cur))
    Report(v, small.size, smallBytes, outFiles)
  }

  /** OPTIMIZE CLUSTER BY BUCKETS — rewrite the table's current version
    * hash-bucketed on `keyCol` (`pmod(xxhash64(key), buckets)`), one
    * manifest entry per bucket, and record the layout in a
    * [[graft.sources.v2.BucketLayout]] sidecar. Read back through
    * [[graft.sources.v2.SnapshotCatalog]], the V2 scan reports
    * `KeyGroupedPartitioning(bucket(n, keyCol))` — two tables clustered
    * with the same bucket count join with ZERO shuffle (the
    * storage-partitioned join). The rewrite itself is one read + one
    * bucket-keyed exchange + one write; the pre-optimize version still
    * time-travels and a later append simply un-reports the partitioning
    * (the sidecar no longer covers the manifest) rather than lying.
    */
  def clusterByBuckets(spark: SparkSession, tableDir: String,
                       keyCol: String, buckets: Int,
                       maxRecordsPerFile: Long = 0L): Report = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val cur = Snapshots.currentVersion(tableDir)
    require(cur > 0, s"no snapshots under $tableDir")
    val conf = spark.sparkContext.hadoopConfiguration
    val inFiles = Snapshots.manifestEntries(tableDir, cur).flatMap { e =>
      val p = new Path(e)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getLen)
      else Seq(st.getLen)
    }
    val out = Snapshots.versionDataDir(tableDir, cur + 1)
    // partitionBy splits the write per bucket; the exchange on __b puts
    // each bucket's rows in exactly one task, so each bucket dir holds
    // one file (plus Spark task-attempt bookkeeping)
    Snapshots.read(spark, tableDir, Some(cur))
      .withColumn("__b",
        pmod(xxhash64(col(keyCol)), lit(buckets)).cast("int"))
      .repartition(buckets, col("__b"))
      .write.mode("error")
      .option(org.apache.spark.sql.internal.SQLConf
        .PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
      // >0 splits each bucket into size-bounded files: the scan emits
      // one key-tagged partition per file, so reads parallelize INSIDE
      // a bucket while a storage-partitioned join still groups the
      // bucket's files into one co-located task
      .option("maxRecordsPerFile",
        if (maxRecordsPerFile > 0) maxRecordsPerFile.toString else "0")
      .partitionBy("__b").parquet(out)
    // rename __b=<i> → bucket<i>: a k=v directory name would trigger
    // Spark's partition-column inference on plain multi-dir reads and
    // graft a phantom __b column onto Snapshots.read's schema
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(conf)
    val entries = fs.listStatus(outPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__b="))
      .map { s =>
        val b = s.getPath.getName.stripPrefix("__b=").toInt
        val renamed = new Path(outPath, s"bucket$b")
        require(fs.rename(s.getPath, renamed),
          s"rename failed: ${s.getPath} -> $renamed")
        renamed.toUri.getPath -> b
      }.sortBy(_._2)
    val v = Snapshots.commitManifest(tableDir, entries.map(_._1),
      expectedVersion = Some(cur))
    BucketLayout.write(tableDir, v, keyCol, buckets, entries)
    Report(v, inFiles.size, inFiles.sum, entries.size)
  }
}
