package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.sources.{AlwaysFalse, AlwaysTrue, And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not, Or}

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

  /** The current version's parquet files `(path, bytes)`, resolved from
    * its manifest (never a data-tree walk). */
  private def resolveFiles(spark: SparkSession, tableDir: String,
                           version: Int): Seq[(Path, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    Snapshots.manifestEntries(tableDir, version).flatMap { e =>
      val p = new Path(e)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(s => (s.getPath, s.getLen))
      else Seq((p, st.getLen))
    }
  }

  /** Shared surgery tail: rewrite `touched` minus the rows `keep`
    * rejects, republish `kept` by reference, commit. Detects the
    * empty-rewrite case BEFORE committing: a predicate that kills every
    * row of every touched file would otherwise publish a part-file-less
    * directory that breaks schema inference for the version (ADVICE
    * r12); a full-table erase publishes a schema-only empty version
    * (the empty-LocalRelation write emits ONE metadata-only parquet
    * file, so the version still plans and schema-infers).
    */
  private def commitSurgery(spark: SparkSession, tableDir: String,
                            cur: Int, touched: Seq[String],
                            kept: Seq[String],
                            keep: org.apache.spark.sql.Column): Result = {
    val dataDir = Snapshots.versionDataDir(tableDir, cur + 1)
    // a touched file may carry DELETION VECTORS from an earlier
    // merge-on-read erase: the rewrite must apply them, or the
    // rewritten copy would RESURRECT the suppressed rows. Kept files'
    // DVs carry forward automatically (commitManifest's inherit).
    val norm: String => String = p => new Path(p).toUri.getPath
    val touchedSet = touched.map(norm).toSet
    val touchedDv = Snapshots.deletionVectors(tableDir, cur)
      .filter { case (f, _) => touchedSet.contains(norm(f)) }
    // read the touched files under the VERSION's schema (not file
    // inference — a mixed pre/post-evolution touched set would
    // otherwise pick an arbitrary file's columns), id-mapped when the
    // table is (renamed columns resolve old files' bytes by id)
    val base = Snapshots.schemaOf(tableDir, cur) match {
      case Some(s) if Snapshots.hasFieldIds(s) =>
        Snapshots.idMappedRead(spark, s, touched)
      case Some(s) => spark.read.schema(s).parquet(touched: _*)
      case None => spark.read.parquet(touched: _*)
    }
    // materialize the survivors ONCE (touched-files-sized, the surgery
    // working set): the emptiness probe and the write share it
    val rewritten = Snapshots.applyDeletionVectors(spark, base, touchedDv)
      .filter(keep)
      .localCheckpoint(true)
    // every commit below CASes at cur+1 (ADVICE r13): the kept/touched
    // split derives from cur's manifest, so a commit racing in between
    // must fail this surgery atomically, never be silently dropped
    if (rewritten.isEmpty) {
      if (kept.nonEmpty) {
        val v = Snapshots.commitManifest(tableDir, kept,
          expectedVersion = Some(cur))
        return Result(v, touched.size, kept.size)
      }
      rewritten.limit(0).write.mode("error")
        .option(org.apache.spark.sql.internal.SQLConf
          .PARQUET_FIELD_ID_WRITE_ENABLED.key, "true").parquet(dataDir)
      val v = Snapshots.commitManifest(tableDir, Seq(dataDir),
        expectedVersion = Some(cur))
      return Result(v, touched.size, 0)
    }
    rewritten.write.mode("error")
      .option(org.apache.spark.sql.internal.SQLConf
        .PARQUET_FIELD_ID_WRITE_ENABLED.key, "true").parquet(dataDir)
    val v = Snapshots.commitManifest(tableDir, kept :+ dataDir,
      expectedVersion = Some(cur))
    Result(v, touched.size, kept.size)
  }

  /** Erase all rows with `keyCol` in [lo, hi] from the table's current
    * snapshot version. `keyCol` must be a long column with parquet
    * min/max statistics (any Spark-written long column has them).
    */
  def deleteRange(spark: SparkSession, tableDir: String, keyCol: String,
                  lo: Long, hi: Long): Result = {
    require(lo <= hi, s"empty erase range [$lo, $hi]")
    val conf = spark.sparkContext.hadoopConfiguration
    val cur = Snapshots.currentVersion(tableDir)
    val stats = resolveFiles(spark, tableDir, cur).map { case (p, len) =>
      Manifest.fileStat(conf, p, len, keyCol)
    }
    // a file with NO stats for the key (lo > hi sentinel) must be
    // treated as touchable — stats are a pruning bound, never a filter
    val (touched, kept) = stats.partition(s =>
      s.lo > s.hi || (s.lo <= hi && s.hi >= lo))
    if (touched.isEmpty) return Result(cur, 0, kept.size)
    commitSurgery(spark, tableDir, cur, touched.map(_.path), kept.map(_.path),
      !(col(keyCol) >= lo && col(keyCol) <= hi))
  }

  /** Erase all rows whose `keyCol` is in `keys` — the shape a real GDPR
    * request has ("erase user X", VERDICT r12 #5): a handful of
    * NON-CONTIGUOUS keys that footer [min, max] ranges cannot prune (on
    * an unclustered table every file's range covers everything). File
    * pruning instead uses the p22 BLOOM manifest
    * ([[Manifest.bloomStatsForPaths]]): only files whose filter says
    * might-contain for at least one key rewrite; a false positive ADDS
    * a file to the rewrite (its rows all survive the exact residual
    * predicate — byte-equal content under a new path), never loses a
    * row, and false negatives are impossible by construction (build
    * and probe share Spark's xxhash64). On a hash-distributed layout
    * the rewrite set is ~(distinct home files of the keys), not
    * O(table).
    *
    * Per-file filters persisted by [[Manifest.persistBlooms]] (one
    * sidecar per version data directory, written at commit time) are
    * consumed FIRST; only files no sidecar covers pay the key-column
    * scan — with sidecars everywhere the prune costs footer-weight
    * metadata reads, the p21/p22 "pay the build once per write"
    * economics.
    *
    * Boundary: the bloom build reads files by COLUMN NAME, so on a
    * table whose key column was RENAMED this op fails loudly (never
    * silently) for files predating the rename — use
    * [[deleteKeysWithVectors]] (id-mapped) or [[deleteWhere]] there.
    */
  def deleteKeys(spark: SparkSession, tableDir: String, keyCol: String,
                 keys: Seq[Long], bits: Int = 1 << 15,
                 hashes: Int = 5): Result = {
    require(keys.nonEmpty, "empty erase key list")
    val cur = Snapshots.currentVersion(tableDir)
    val entries = Snapshots.manifestEntries(tableDir, cur)
    val paths = resolveFiles(spark, tableDir, cur).map(_._1.toString)
    // input_file_name() URIs vs manifest paths can differ in scheme
    // spelling (file:/ vs file:///) — compare on scheme-less paths
    def norm(p: String): String = new Path(p).toUri.getPath
    // sidecars first: every manifest DIRECTORY entry may carry one
    val persisted: Map[String, Manifest.BloomStat] = entries
      .flatMap(e => Manifest.readBlooms(spark, e, keyCol, bits, hashes)
        .getOrElse(Nil))
      .map(b => norm(b.path) -> b).toMap
    val uncovered = paths.filterNot(p => persisted.contains(norm(p)))
    val computed =
      if (uncovered.isEmpty) Nil
      else Manifest.bloomStatsForPaths(spark, uncovered, keyCol, bits, hashes)
    val blooms = persisted.values.toSeq ++ computed
    val pos = Manifest.bloomPositions(spark, keys, bits, hashes)
    val mightContain: Map[String, Boolean] = blooms.map(b =>
      norm(b.path) -> keys.exists(k => b.mightContain(pos(k)))).toMap
    // a file absent from the bloom census (no rows surfaced) stays
    // touchable — the filter is a pruning bound, never a row filter
    val (touched, kept) = paths.partition(p =>
      mightContain.getOrElse(norm(p), true))
    if (touched.isEmpty) return Result(cur, 0, kept.size)
    commitSurgery(spark, tableDir, cur, touched, kept,
      !col(keyCol).isin(keys: _*))
  }

  /** MERGE-ON-READ erase via DELETION VECTORS (VERDICT r13 #3) — the
    * Delta-DV shape: a DELETE touching few rows of large files records
    * a (file → suppressed row positions) sidecar in the next manifest
    * instead of rewriting any file. ZERO data files move — the commit
    * republishes every entry by reference plus the `#dv=` header;
    * every reader ([[Snapshots.read]], the V2 connector's row readers,
    * SQL through the catalog) filters the suppressed positions; prior
    * versions still time-travel to the pre-delete rows; compaction
    * ([[Optimize]]) reconciles by rewriting through the DV-aware read
    * and committing DV-free output.
    *
    * Copy-on-write ([[deleteRange]]/[[deleteKeys]]/[[deleteWhere]])
    * stays the DEFAULT delete: at 100 TB a delete that kills a large
    * fraction of a file should rewrite it (every later read pays the
    * DV filter otherwise). DVs win exactly when the delete is narrow —
    * the GDPR-key case, where rewriting a 1 GB file for one row is the
    * wrong trade. The matching (file, position) pairs are collected to
    * the driver, so the op is sized to the DELETED rows, never to the
    * table.
    *
    * A repeat erase of already-suppressed keys is a no-op (no new
    * version); a second erase of NEW keys merges position lists into a
    * fresh sidecar.
    */
  def deleteKeysWithVectors(spark: SparkSession, tableDir: String,
                            keyCol: String, keys: Seq[Long]): Result = {
    require(keys.nonEmpty, "empty erase key list")
    // positions of matching rows are keyed by the file that holds them —
    // the parquet source's own row ordinals, the same coordinate system
    // the readers' skip logic uses; the read is id-mapped when the
    // table is (on a RENAMED table the key column's new name doesn't
    // exist in old files by name). filesRewritten = 0 is the whole
    // point of the merge-on-read path.
    deleteWhereWithVectors(spark, tableDir, col(keyCol).isin(keys: _*))
  }

  /** MERGE-ON-READ erase by PREDICATE — [[deleteKeysWithVectors]]
    * generalized to an arbitrary delete condition: one pass finds the
    * matching rows' (file, position) provenance, the positions merge
    * into the `#dv=` sidecar, ZERO data files move. This is what SQL
    * `DELETE FROM` routes to when the table opts into merge-on-read
    * (`dmlMode 'merge-on-read'` — the Delta
    * `delta.enableDeletionVectors` table-property shape): the narrow
    * nightly-erase workload keeps its vectorized layout intact and
    * pays one sidecar write instead of rewriting every touched file.
    * SQL-null semantics preserved: a NULL predicate matches nothing
    * (`coalesce(cond, false)`). Reads raw (not DV-filtered): a
    * position already suppressed re-merges to the identical set, so
    * repeat deletes are no-ops and never resurrect anything.
    */
  def deleteWhereWithVectors(spark: SparkSession, tableDir: String,
                             cond: Column): Result = {
    val cur = Snapshots.currentVersion(tableDir)
    require(cur > 0, s"no snapshots under $tableDir")
    val entries = Snapshots.manifestEntries(tableDir, cur)
    import org.apache.spark.sql.functions.regexp_replace
    val raw = Snapshots.schemaOf(tableDir, cur) match {
      case Some(s) if Snapshots.hasFieldIds(s) =>
        Snapshots.idMappedRead(spark, s, entries)
      case Some(s) => spark.read.schema(s).parquet(entries: _*)
      case None => spark.read.parquet(entries: _*)
    }
    val hits = raw
      .filter(coalesce(cond, lit(false)))
      .select(
        regexp_replace(col("_metadata.file_path"), "^file:/+", "/").as("f"),
        col("_metadata.row_index").as("p"))
      .collect()
    val fresh: Map[String, Array[Long]] = hits.groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1)) }
    val prev = Snapshots.deletionVectors(tableDir, cur)
    val merged = (prev.keySet ++ fresh.keySet).iterator.map { f =>
      f -> (prev.getOrElse(f, Array.empty[Long]) ++
        fresh.getOrElse(f, Array.empty[Long])).distinct.sorted
    }.toMap
    val unchanged = merged.size == prev.size && merged.forall {
      case (f, ps) => prev.get(f).exists(_.sameElements(ps))
    }
    if (unchanged) return Result(cur, 0, entries.size)
    val v = Snapshots.commitManifest(tableDir, entries,
      expectedVersion = Some(cur), dv = Some(merged))
    Result(v, 0, entries.size)
  }

  /** Can the SQL-delete path serve this pushed filter? (The vocabulary
    * [[toCondition]] translates — comparisons, IN, null tests, and
    * their boolean closure.) */
  private[graft] def translatable(f: Filter): Boolean =
    toCondition(f).isDefined

  /** Source filter → delete predicate Column. */
  private[graft] def toCondition(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case Not(c) => toCondition(c).map(not)
    case And(l, r) =>
      for (lc <- toCondition(l); rc <- toCondition(r)) yield lc && rc
    case Or(l, r) =>
      for (lc <- toCondition(l); rc <- toCondition(r)) yield lc || rc
    case _: AlwaysTrue => Some(lit(true))
    case _: AlwaysFalse => Some(lit(false))
    case _ => None
  }

  /** Per-conjunct footer pruning on long comparisons/IN: a file is
    * touchable unless some conjunct PROVES no row of it can match
    * (files with no usable stats stay touchable — stats are a bound,
    * never a filter). Shared by [[deleteWhere]] and [[prepareReplace]].
    */
  private def pruneByFilters(spark: SparkSession, tableDir: String,
                             cur: Int, filters: Seq[Filter])
      : (Seq[(Path, Long)], Seq[(Path, Long)]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = resolveFiles(spark, tableDir, cur)
    val statCache = scala.collection.mutable.Map.empty[(String, String),
      Manifest.FileStat]
    def stat(p: Path, len: Long, c: String): Manifest.FileStat =
      statCache.getOrElseUpdate((p.toString, c),
        Manifest.fileStat(conf, p, len, c))
    def overlaps(p: Path, len: Long, f: Filter): Boolean = f match {
      case EqualTo(c, v: Long) =>
        val s = stat(p, len, c); s.lo > s.hi || (s.lo <= v && v <= s.hi)
      case GreaterThan(c, v: Long) =>
        val s = stat(p, len, c); s.lo > s.hi || s.hi > v
      case GreaterThanOrEqual(c, v: Long) =>
        val s = stat(p, len, c); s.lo > s.hi || s.hi >= v
      case LessThan(c, v: Long) =>
        val s = stat(p, len, c); s.lo > s.hi || s.lo < v
      case LessThanOrEqual(c, v: Long) =>
        val s = stat(p, len, c); s.lo > s.hi || s.lo <= v
      case In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Long]) =>
        val s = stat(p, len, c)
        s.lo > s.hi || vs.exists { case v: Long => s.lo <= v && v <= s.hi }
      case _ => true
    }
    files.partition { case (p, len) =>
      filters.forall(overlaps(p, len, _))
    }
  }

  /** OVERWRITE-BY-EXPRESSION support (`df.writeTo(t).overwrite(cond)` —
    * the daily-partition-reload pattern): the DELETE half of the
    * replace, WITHOUT the commit — footer-prune the files the condition
    * can touch, rewrite their surviving (non-matching, DV-applied) rows
    * into a fresh directory, and hand back what the caller must publish
    * TOGETHER with its new data files so delete + insert land as ONE
    * atomic version.
    *
    * @return (base version the plan derived from — CAS the commit at
    *         base+1, kept entries republished by reference, the
    *         survivors directory when any survivor exists)
    */
  private[graft] def prepareReplace(spark: SparkSession, tableDir: String,
                                    filters: Seq[Filter])
      : (Int, Seq[String], Option[String]) = {
    val cur = Snapshots.currentVersion(tableDir)
    require(cur > 0, s"no snapshots under $tableDir")
    val conds = filters.map(f => toCondition(f).getOrElse(
      throw new IllegalArgumentException(
        s"overwrite condition not translatable by this table: $f")))
    val cond = conds.reduceOption(_ && _).getOrElse(lit(true))
    val (touched, kept) = pruneByFilters(spark, tableDir, cur, filters)
    if (touched.isEmpty) return (cur, kept.map(_._1.toString), None)
    val touchedPaths = touched.map(_._1.toString)
    val norm: String => String = p => new Path(p).toUri.getPath
    val touchedSet = touchedPaths.map(norm).toSet
    val touchedDv = Snapshots.deletionVectors(tableDir, cur)
      .filter { case (f, _) => touchedSet.contains(norm(f)) }
    val base = Snapshots.schemaOf(tableDir, cur) match {
      case Some(s) if Snapshots.hasFieldIds(s) =>
        Snapshots.idMappedRead(spark, s, touchedPaths)
      case Some(s) => spark.read.schema(s).parquet(touchedPaths: _*)
      case None => spark.read.parquet(touchedPaths: _*)
    }
    val survivors = Snapshots.applyDeletionVectors(spark, base, touchedDv)
      .filter(not(coalesce(cond, lit(false))))
      .localCheckpoint(true)
    if (survivors.isEmpty) return (cur, kept.map(_._1.toString), None)
    val dataDir = Snapshots.versionDataDir(tableDir, cur + 1)
    survivors.write.mode("error")
      .option(org.apache.spark.sql.internal.SQLConf
        .PARQUET_FIELD_ID_WRITE_ENABLED.key, "true").parquet(dataDir)
    (cur, kept.map(_._1.toString), Some(dataDir))
  }

  /** GENERIC predicate erase — the engine behind SQL `DELETE FROM`
    * ([[graft.sources.v2.SnapshotTable]]'s `SupportsDelete`): the
    * filters (a conjunction, as Spark pushes them) become the delete
    * predicate, long-column comparison/IN conjuncts prune untouched
    * files via footer [min, max] before any byte is read, and the same
    * copy-on-write surgery publishes survivors + references. SQL
    * semantics exactly: a row is deleted only when the predicate is
    * TRUE — a NULL predicate keeps the row (the `coalesce(…, false)`
    * below). Prior versions still time-travel; a delete that cannot
    * touch anything commits nothing.
    */
  def deleteWhere(spark: SparkSession, tableDir: String,
                  filters: Seq[Filter]): Result = {
    val cur = Snapshots.currentVersion(tableDir)
    require(cur > 0, s"no snapshots under $tableDir")
    val conds = filters.map(f => toCondition(f).getOrElse(
      throw new IllegalArgumentException(
        s"DELETE predicate not translatable by this table: $f")))
    // no predicate = delete everything (TRUE), per SQL
    val cond = conds.reduceOption(_ && _).getOrElse(lit(true))
    val (touched, kept) = pruneByFilters(spark, tableDir, cur, filters)
    if (touched.isEmpty) return Result(cur, 0, kept.size)
    commitSurgery(spark, tableDir, cur,
      touched.map(_._1.toString), kept.map(_._1.toString),
      not(coalesce(cond, lit(false))))
  }
}
