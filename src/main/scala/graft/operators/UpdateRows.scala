package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, regexp_replace}

import graft.sources.Snapshots

/** MERGE-ON-READ row UPDATE over a snapshot table — the deletion-vector
  * twin of [[DeleteRows.deleteKeysWithVectors]] (the Delta DV-update
  * shape): a narrow UPDATE suppresses the OLD row positions in a
  * sidecar and APPENDS the updated rows, so a 1-row update of a 1 GB
  * file moves exactly one row:
  *
  *  1. one pass over the current version (id-mapped read — renamed
  *     columns resolve old files by field id) finds the matching rows
  *     WITH their (file, row position) provenance;
  *  2. the positions merge into the deletion-vector map (old copies
  *     become invisible to every reader — the same suppression
  *     machinery the DV delete uses);
  *  3. the updated rows — assignments applied, table schema preserved,
  *     field ids re-stamped — land in a fresh data directory;
  *  4. one CAS'd manifest commit publishes `old entries + new dir`
  *     under the merged `#dv=` header.
  *
  * Logically invisible: the new version equals
  * `old SET assignments WHERE cond` exactly (the p43 oracle). Prior
  * versions still time-travel to the pre-update rows. SQL-null
  * semantics: a NULL condition matches nothing.
  *
  * The matching positions are collected to the driver, so the op is
  * sized to the UPDATED rows, never the table — the same narrow-change
  * trade as the DV delete, with copy-on-write SQL UPDATE
  * ([[graft.sources.v2.SnapshotRowLevelOperation]]) remaining the
  * right choice when a large fraction of a file changes (every later
  * read of a DV'd version pays the row-path scan). Compaction
  * reconciles back to the vectorized layout.
  *
  * Reference context: the reference mutates cluster rows one item at a
  * time through DynamoDB update calls
  * (`/root/reference/business_logic/stream_consumer/process_records.py:182`);
  * this is the set-oriented, versioned re-expression of the same
  * point-update workload.
  */
object UpdateRows {

  /** @param version      committed version (unchanged if no match)
    * @param rowsUpdated  rows suppressed-and-rewritten
    * @param filesKept    entries republished by reference (all of them —
    *                     zero data files rewrite, that is the point) */
  final case class Result(version: Int, rowsUpdated: Long, filesKept: Int)

  def updateWhereWithVectors(spark: SparkSession, tableDir: String,
                             cond: Column,
                             set: Map[String, Column]): Result = {
    require(set.nonEmpty, "empty assignment list")
    val cur = Snapshots.currentVersion(tableDir)
    require(cur > 0, s"no snapshots under $tableDir")
    val entries = Snapshots.manifestEntries(tableDir, cur)
    val schema = Snapshots.schemaOf(tableDir, cur)
    val base = schema match {
      case Some(s) if Snapshots.hasFieldIds(s) =>
        Snapshots.idMappedRead(spark, s, entries)
      case Some(s) => spark.read.schema(s).parquet(entries: _*)
      case None => spark.read.parquet(entries: _*)
    }
    set.keys.foreach(c => require(base.columns.contains(c),
      s"no column $c on $tableDir"))
    val prev = Snapshots.deletionVectors(tableDir, cur)
    // ONE pass finds the matching LIVE rows with their provenance; the
    // position collection and the updated-row write share it. The
    // current suppressions must apply first: a raw read would also
    // match the already-suppressed ORIGINAL of a previously-updated
    // row and append a duplicate (measured)
    val withProv = base
      .withColumn("__f",
        regexp_replace(col("_metadata.file_path"), "^file:/+", "/"))
      .withColumn("__p", col("_metadata.row_index"))
    val live =
      if (prev.isEmpty) withProv
      else {
        val pairs = prev.iterator.flatMap { case (f, ps) =>
          ps.iterator.map(p => (f, p))
        }.toSeq
        withProv.join(
          org.apache.spark.sql.functions.broadcast(
            spark.createDataFrame(pairs).toDF("__dv_f", "__dv_p")),
          col("__f") === col("__dv_f") && col("__p") === col("__dv_p"),
          "left_anti")
      }
    val matching = live
      .filter(coalesce(cond, lit(false)))
      .localCheckpoint(true)
    val hits = matching.select(col("__f"), col("__p")).collect()
    if (hits.isEmpty) return Result(cur, 0L, entries.size)
    val fresh: Map[String, Array[Long]] = hits.groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1)) }
    val merged = (prev.keySet ++ fresh.keySet).iterator.map { f =>
      f -> (prev.getOrElse(f, Array.empty[Long]) ++
        fresh.getOrElse(f, Array.empty[Long])).distinct.sorted
    }.toMap
    // updated rows under the table schema: assignments applied, field
    // ids re-stamped so the appended file stays id-mapped
    val stampedCols = base.schema.fields.map { f =>
      set.get(f.name).map(_.cast(f.dataType)).getOrElse(col(f.name))
        .as(f.name, f.metadata)
    }
    val dataDir = Snapshots.versionDataDir(tableDir, cur + 1)
    matching.select(stampedCols.toIndexedSeq: _*)
      .write.mode("error")
      .option(org.apache.spark.sql.internal.SQLConf
        .PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
      .parquet(dataDir)
    val v = Snapshots.commitManifest(tableDir, entries :+ dataDir,
      expectedVersion = Some(cur), dv = Some(merged))
    Result(v, hits.length.toLong, entries.size)
  }
}
