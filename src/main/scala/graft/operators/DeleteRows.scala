package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.sources.{Manifest, Snapshots}

/** COPY-ON-WRITE row erasure over a snapshot table — the GDPR / right-
  * to-be-forgotten DELETE (Delta/Iceberg `DELETE FROM` semantics
  * reduced to their mechanism; the maintenance op the reference's
  * `data/clear_data.py` performs row-by-row against DynamoDB, upgraded
  * to set-oriented file surgery):
  *
  *  1. resolve the CURRENT snapshot version's file list from its
  *     manifest (never a directory walk of the data tree);
  *  2. footer-stats prune ([[Manifest.fileStat]]): only files whose
  *     [min, max] key range can intersect the erase range are touched —
  *     on a range-clustered table (the Compaction layout) that is O(1)
  *     files, not O(table);
  *  3. rewrite ONLY the touched files minus the matching rows into a
  *     fresh immutable version directory;
  *  4. publish untouched files BY REFERENCE plus the rewritten output
  *     as the next manifest ([[Snapshots.commitManifest]] — the atomic
  *     step). Prior versions remain readable (time travel shows the
  *     pre-erasure table until the retention sweep physically removes
  *     superseded files — the standard two-phase GDPR story: logical
  *     erasure now, physical reclamation at VACUUM).
  *
  * Why this matters at 100 TB: a naive DELETE rewrites the table; this
  * rewrites `targeted bytes / clustering selectivity` and republishes
  * everything else as pointers. An erase that touches nothing commits
  * nothing (no-op version). Erasure is logically invisible — the new
  * version equals `old WHERE NOT predicate` exactly (the p24 oracle);
  * the file-level surgery contract (untouched files referenced
  * verbatim, only overlapping files rewritten, old version intact) is
  * DeleteRowsSpec's.
  */
object DeleteRows {

  /** @param version        committed version (unchanged if no-op)
    * @param filesRewritten touched files (stats overlap the range)
    * @param filesKept      files republished by reference
    */
  final case class Result(version: Int, filesRewritten: Int, filesKept: Int)

  /** Erase all rows with `keyCol` in [lo, hi] from the table's current
    * snapshot version. `keyCol` must be a long column with parquet
    * min/max statistics (any Spark-written long column has them).
    */
  def deleteRange(spark: SparkSession, tableDir: String, keyCol: String,
                  lo: Long, hi: Long): Result = {
    require(lo <= hi, s"empty erase range [$lo, $hi]")
    val conf = spark.sparkContext.hadoopConfiguration
    val cur = Snapshots.currentVersion(tableDir)
    val files = Snapshots.manifestEntries(tableDir, cur).flatMap { e =>
      val p = new Path(e)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(s => (s.getPath, s.getLen))
      else Seq((p, st.getLen))
    }
    val stats = files.map { case (p, len) =>
      Manifest.fileStat(conf, p, len, keyCol)
    }
    // a file with NO stats for the key (lo > hi sentinel) must be
    // treated as touchable — stats are a pruning bound, never a filter
    val (touched, kept) = stats.partition(s =>
      s.lo > s.hi || (s.lo <= hi && s.hi >= lo))
    if (touched.isEmpty) return Result(cur, 0, kept.size)
    val next = cur + 1
    val dataDir = Snapshots.versionDataDir(tableDir, next)
    // materialize the surviving rows ONCE (touched-files-sized, the
    // surgery working set) so the empty-rewrite case can be detected
    // BEFORE committing: a predicate that kills every row of every
    // touched file would otherwise publish a part-file-less directory
    // that breaks schema inference for the whole version (ADVICE r12)
    val rewritten = spark.read.parquet(touched.map(_.path): _*)
      .filter(!(col(keyCol) >= lo && col(keyCol) <= hi))
      .localCheckpoint(true)
    if (rewritten.isEmpty) {
      if (kept.nonEmpty) {
        val v = Snapshots.commitManifest(tableDir, kept.map(_.path))
        return Result(v, touched.size, kept.size)
      }
      // the erase wipes the entire table: publish a schema-only empty
      // version — an explicitly-empty write goes through the empty-
      // LocalRelation path and emits ONE metadata-only parquet file,
      // so read() of this version still plans and schema-infers
      rewritten.limit(0).write.mode("error").parquet(dataDir)
      val v = Snapshots.commitManifest(tableDir, Seq(dataDir))
      return Result(v, touched.size, 0)
    }
    rewritten.write.mode("error").parquet(dataDir)
    val v = Snapshots.commitManifest(tableDir, kept.map(_.path) :+ dataDir)
    Result(v, touched.size, kept.size)
  }
}
