package graft.sources.v2

import java.util
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Snapshots

/** What a row-level operation needs back from ITS scan: the manifest
  * version the plan resolved (the commit CASes at version+1) and the
  * post-pruning file list (the replace set for group-based ops; a
  * bookkeeping record for delta-based ones). [[SnapshotScanBuilder]]
  * calls this at the post-runtime-filter `planInputPartitions` — the
  * call whose partitions actually execute. */
private[v2] trait RowLevelScanListener {
  def record(version: Int, files: Seq[String]): Unit
}

/** GROUP-BASED row-level operations (SQL `UPDATE` / `MERGE INTO`) on
  * snapshot tables — the copy-on-write contract at FILE granularity,
  * riding the same manifest-commit atomicity as every other mutation:
  *
  *  - Spark's analyzer rewrites `UPDATE t SET … WHERE c` /
  *    `MERGE INTO t USING s …` over a [[SnapshotTable]] into a
  *    `ReplaceData` plan (the table implements
  *    `SupportsRowLevelOperations`): ONE scan of the affected groups
  *    feeds a projection that emits every row of those groups —
  *    updated where the condition/clause matches, byte-identical
  *    copies elsewhere — and the write REPLACES exactly the scanned
  *    groups.
  *  - Our "group" is a parquet FILE. The operation's scan is the
  *    ordinary [[SnapshotScan]] (footer-stats file skipping included),
  *    so a condition on a range-clustered long column prunes the files
  *    it cannot touch BEFORE any task launches — those files never
  *    rewrite, and the commit republishes them by reference. This is
  *    the p24/p25 copy-on-write surgery, now reached from standard SQL
  *    DML instead of an engine-specific API. The scan records the file
  *    list it finally planned; the write's driver-side commit publishes
  *    `current files − scanned files + replacement files` as the next
  *    manifest version. Prior versions still time-travel; vacuum
  *    reclaims retired files after retention.
  *  - Group-filter semantics: Spark pushes the DML condition into the
  *    scan builder for GROUP pruning only (`SupportsPushDownFilters`) —
  *    the scan must still return EVERY row of the kept files, because
  *    non-matching rows of a rewritten file survive only by being
  *    copied through the write. [[SnapshotScanBuilder]] already treats
  *    pushed filters as a skip-bound, never a row filter, so the read
  *    contract is identical to the plain path. RUNTIME group filtering
  *    applies on top (`SupportsRuntimeFiltering` on the scan): Spark
  *    plans a separate matching-rows subquery over a fresh plain scan
  *    of the table and feeds the matching join keys back as an IN
  *    filter, so a MERGE rewrites only the files whose footer range
  *    contains a source key — O(matching files), not O(table). The
  *    replaced set still equals the scanned set: the group record is
  *    taken at the post-runtime-filter `planInputPartitions` call, the
  *    one whose partitions execute.
  *  - Optimistic concurrency: the scan records the version it planned
  *    against; the commit refuses if the table moved underneath the
  *    statement (the loser retries, never half-writes) — same
  *    discipline as the CREATE_NEW manifest commit itself.
  *
  * At 100 TB the properties that matter: rewrite volume is
  * O(files overlapping the predicate), not O(table); the scan, the
  * update projection, and the replacement write are all fully
  * distributed; and the commit is one driver-side manifest swap.
  *
  * Reference context: the reference stack mutates per-item rows
  * through DynamoDB batch writes
  * (`/root/reference/business_logic/stream_consumer/process_records.py:182`,
  * `add_items_to_dynamodb`); this is the set-oriented re-expression —
  * declarative DML over immutable versioned files.
  */
class SnapshotRowLevelOperation(tableDir: String, tableSchema: StructType,
                                conf: ParquetGroups.SerializableConf,
                                cmd: Command,
                                tableOptions: CaseInsensitiveStringMap)
    extends RowLevelOperation with RowLevelScanListener {

  /** What the operation's scan finally planned: the resolved manifest
    * version and the post-pruning file list. Written on the driver at
    * `planInputPartitions` time (always before the write commits —
    * the scan feeds the replacement rows). */
  private[v2] val scanned =
    new AtomicReference[SnapshotRowLevelOperation.ScanRecord](null)

  override def record(version: Int, files: Seq[String]): Unit =
    scanned.set(SnapshotRowLevelOperation.ScanRecord(version, files))

  override def command(): Command = cmd

  override def description(): String =
    s"graft_snapshots $cmd $tableDir (copy-on-write file groups)"

  /** Requiring `_file` does two jobs: (1) it makes Spark's rewrite
    * carry a METADATA projection, so the replacement write receives
    * data rows projected to the clean table schema (without it, the
    * plain writing task hands the connector raw query-output rows
    * including the `__row_operation` marker column — positionally
    * corrupt for any schema-driven writer); (2) it gives the rewrite
    * plan per-row provenance, the natural group id for a file-granular
    * copy-on-write. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(ParquetGroups.FilePathCol))

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap({
      val m = new util.HashMap[String, String](tableOptions)
      m.putAll(o)
      m
    })
    new SnapshotScanBuilder(tableSchema, merged, rowLevel = Some(this))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val op = this
    new WriteBuilder {
      override def build(): Write = new Write
          with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        override def toBatch: BatchWrite =
          // re-stamp the table's field ids (Spark strips metadata from
          // the logical write schema): replacement files of an
          // id-mapped table must carry ids, or an id-enabled read
          // would null-fill them
          new SnapshotReplaceGroupsWrite(tableDir,
            graft.sources.Snapshots.withFieldIds(tableDir, info.schema()),
            conf, op)
        override def description(): String = op.description()

        // ---- LAYOUT PRESERVATION for MERGE: the join shuffles group
        // rows across tasks, so an unconstrained rewrite would
        // interleave every touched file into arbitrary output files —
        // clustering the write back by `_file` keeps each rewritten
        // group whole (its footer stats stay as tight as the source
        // file's, so p22/p24-style pruning survives the merge).
        // NON-strict + advisory size: Spark plans an AQE REBALANCE
        // rather than a hard hash — the not-matched INSERT rows all
        // carry _file = null, and a strict hash would funnel an
        // insert-heavy 100 TB merge into ONE task; rebalance splits
        // that skew while file groups (≤ one file ≤ advisory bytes)
        // stay unsplit. UPDATE/DELETE rewrites are narrow (whole-file
        // scan bins, no shuffle) and already group-aligned — no
        // distribution requested, no shuffle added.
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          if (cmd == Command.MERGE)
            org.apache.spark.sql.connector.distributions.Distributions
              .clustered(Array(
                org.apache.spark.sql.connector.expressions.Expressions
                  .column(ParquetGroups.FilePathCol)))
          else org.apache.spark.sql.connector.distributions.Distributions
            .unspecified()

        override def distributionStrictlyRequired(): Boolean = false

        override def advisoryPartitionSizeInBytes(): Long =
          if (cmd == Command.MERGE) 128L << 20 else 0L

        // groups contiguous inside each output file → row-group stats
        // stay as selective as the source layout's
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          if (cmd == Command.MERGE)
            Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
              org.apache.spark.sql.connector.expressions.Expressions
                .column(ParquetGroups.FilePathCol),
              org.apache.spark.sql.connector.expressions.SortDirection
                .ASCENDING))
          else Array.empty
      }
    }
  }
}

private[v2] object SnapshotRowLevelOperation {
  final case class ScanRecord(version: Int, files: Seq[String])
}

/** The REPLACE-GROUPS batch write behind `ReplaceData`: tasks stage
  * replacement parquet files exactly like an append
  * ([[SnapshotWriteSupport.TaskWriter]] — unreferenced leftovers swept
  * by vacuum), and the driver commit swaps the scanned files for the
  * staged ones in one manifest publication.
  */
class SnapshotReplaceGroupsWrite(tableDir: String, schema: StructType,
                                 conf: ParquetGroups.SerializableConf,
                                 op: SnapshotRowLevelOperation)
    extends BatchWrite {

  private val staging = SnapshotWriteSupport.stagingDir(tableDir)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val dir = staging; val c = conf; val s = schema
    (partitionId: Int, taskId: Long) =>
      new SnapshotWriteSupport.TaskWriter(
        s"$dir/part-$partitionId-$taskId.parquet", c.value, s)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rec = op.scanned.get()
    require(rec != null,
      "row-level write committed before its scan planned any groups")
    val newFiles = SnapshotWriteSupport.committed(messages)
      .collect { case FileCommit(p, rows) if rows > 0 => p }
    if (rec.files.isEmpty && newFiles.isEmpty) {
      // the condition pruned every file AND the write produced no rows:
      // nothing was scanned, nothing was added — a no-op, not a new
      // version. (A MERGE whose group filter matched zero target files
      // can still emit NOT MATCHED insert rows — newFiles non-empty —
      // and those MUST publish as an append, never be discarded:
      // ADVICE r13, the zero-match-with-inserts data loss.)
      return
    }
    val scannedSet = rec.files.toSet
    val kept = SnapshotsDataSource.filesOf(conf.value,
        Snapshots.manifestEntries(tableDir, rec.version))
      .map(_._1).filterNot(scannedSet)
    val published = (kept ++ newFiles).sorted
    val entries =
      if (published.nonEmpty) published
      else {
        // every row of every file updated away to zero output (only
        // possible for MERGE deleting all rows): keep the version
        // readable with one schema-only file, mirroring INSERT OVERWRITE
        val f = s"$staging/part-empty.parquet"
        new SnapshotWriteSupport.FileWriter(f, conf.value, schema).close()
        Seq(f)
      }
    // compare-and-swap at exactly scanned-version + 1: a commit landing
    // between the scan and this publish surfaces atomically as
    // FileAlreadyExistsException (the statement retries) instead of
    // being clobbered by entries derived from the stale version
    // (ADVICE r13 TOCTOU)
    Snapshots.commitManifest(tableDir, entries,
      expectedVersion = Some(rec.version))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    SnapshotWriteSupport.deleteQuietly(conf.value,
      SnapshotWriteSupport.committed(messages).map(_.path))
}
