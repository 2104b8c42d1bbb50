package graft.sources.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructField, StructType}

import graft.operators.{DeleteRows, Optimize}
import graft.sources.Snapshots

/** SQL stored procedures for snapshot-table MAINTENANCE — the
  * `CALL catalog.system.<proc>(...)` surface (Spark 4's
  * `ProcedureCatalog`, the Iceberg-procedures shape), served by
  * [[SnapshotCatalog]]:
  *
  * {{{
  *   CALL graft_snap.system.compact(table => '/data/t',
  *                                  sort_col => 'doc_id')
  *   CALL graft_snap.system.zorder('/data/t', 'a', 'b')
  *   CALL graft_snap.system.cluster_by('/data/t', 'key', 8)
  *   CALL graft_snap.system.restore('/data/t', 3)
  *   CALL graft_snap.system.delete_keys('/data/t', 'user_id', '7,42')
  *   CALL graft_snap.system.vacuum('/data/t', keep => 3)
  * }}}
  *
  * Why procedures and not API calls: table maintenance is an
  * OPERATIONAL surface — the person running a nightly OPTIMIZE or a
  * GDPR erase drives SQL, not a Scala REPL with the engine on the
  * classpath. Every procedure here is a thin SQL face over the same
  * commit operators the API exposes ([[graft.operators.Optimize]],
  * [[graft.sources.Snapshots]], [[graft.operators.DeleteRows]]), so
  * the semantics — manifest-commit atomicity, time travel, CAS'd
  * concurrency, DV reconciliation — are identical by construction,
  * and each returns a one-row result set reporting what the commit
  * did (versions, file counts) for runbook assertions.
  *
  * Reference context: the reference's maintenance is ad-hoc scripts
  * against DynamoDB (`/root/reference/data/clear_data.py:24` wipes the
  * table row-by-row); this is the declarative, audited re-expression.
  */
object SnapshotProcedures {

  /** One-row, fixed-schema procedure: `run` performs the commit on the
    * driver and reports the result row; the CALL's result set is a
    * [[LocalScan]] of exactly that row (nothing to distribute — the
    * work inside is ordinary Spark jobs launched by the operator).
    * Procedures are bound to their declared parameters as-is: Spark
    * coerces arguments to the declared types and fills defaults before
    * [[call]] sees the row.
    */
  private abstract class OneRowProcedure(
      procName: String, procDescription: String,
      params: Array[ProcedureParameter], out: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    // every procedure here commits table state — never constant-fold
    override def isDeterministic: Boolean = false
    protected def run(spark: SparkSession, input: InternalRow): Array[Any]
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val values = run(SparkSession.active, input)
      require(values.length == out.length,
        s"$procName returned ${values.length} values for ${out.length} columns")
      val schema = out
      util.Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(new GenericInternalRow(values))
        override def readSchema(): StructType = schema
        override def description(): String = s"CALL $procName result"
      }).iterator()
    }
  }

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def pd(name: String, dt: DataType,
                 defaultSql: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(defaultSql).build()
  private def out(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, dt) =>
      StructField(n, dt, nullable = false) })
  private def str(r: InternalRow, i: Int): String = {
    require(!r.isNullAt(i), s"procedure argument #$i must not be NULL")
    r.getUTF8String(i).toString
  }

  /** `compact(table, sort_col, target_bytes)` —
    * [[Optimize.compactTable]]: range-clustered rewrite committed as
    * the next version; deletion vectors reconcile (the output is
    * DV-free, restoring the vectorized read path). */
  private object CompactProcedure extends OneRowProcedure(
    "compact",
    "rewrite the current version range-clustered on sort_col; " +
      "reconciles deletion vectors",
    Array(p("table", StringType), p("sort_col", StringType),
      pd("target_bytes", LongType, (128L << 20).toString)),
    out("version" -> IntegerType, "in_files" -> IntegerType,
      "out_files" -> IntegerType)) {
    override protected def run(spark: SparkSession,
                               in: InternalRow): Array[Any] = {
      val r = Optimize.compactTable(spark, str(in, 0), str(in, 1),
        in.getLong(2))
      Array(r.version, r.inFiles, r.outFiles)
    }
  }

  /** `compact_small(table, target_bytes)` — [[Optimize.compactSmall]]:
    * the INCREMENTAL optimize — bin-pack only files under
    * target_bytes/2, keep everything else by reference. O(small
    * bytes), never O(table): the nightly maintenance shape. */
  private object CompactSmallProcedure extends OneRowProcedure(
    "compact_small",
    "bin-pack only the small files (< target_bytes/2); big files " +
      "republish by reference — O(small bytes), never O(table)",
    Array(p("table", StringType),
      pd("target_bytes", LongType, (128L << 20).toString)),
    out("version" -> IntegerType, "files_packed" -> IntegerType,
      "out_files" -> IntegerType)) {
    override protected def run(spark: SparkSession,
                               in: InternalRow): Array[Any] = {
      val r = Optimize.compactSmall(spark, str(in, 0), in.getLong(1))
      Array(r.version, r.inFiles, r.outFiles)
    }
  }

  /** `zorder(table, col_a, col_b, target_bytes)` — [[Optimize.zorder]]:
    * Morton-interleaved rewrite so footer stats prune on BOTH columns. */
  private object ZorderProcedure extends OneRowProcedure(
    "zorder",
    "rewrite the current version Z-ordered on (col_a, col_b)",
    Array(p("table", StringType), p("col_a", StringType),
      p("col_b", StringType),
      pd("target_bytes", LongType, (128L << 20).toString)),
    out("version" -> IntegerType, "in_files" -> IntegerType,
      "out_files" -> IntegerType)) {
    override protected def run(spark: SparkSession,
                               in: InternalRow): Array[Any] = {
      val r = Optimize.zorder(spark, str(in, 0), str(in, 1), str(in, 2),
        in.getLong(3))
      Array(r.version, r.inFiles, r.outFiles)
    }
  }

  /** `cluster_by(table, key_col, buckets, max_records_per_file)` —
    * [[Optimize.clusterByBuckets]]: hash-bucketed rewrite recorded in a
    * BucketLayout sidecar, unlocking storage-partitioned joins. */
  private object ClusterByProcedure extends OneRowProcedure(
    "cluster_by",
    "rewrite the current version hash-bucketed on key_col " +
      "(storage-partitioned joins)",
    Array(p("table", StringType), p("key_col", StringType),
      p("buckets", IntegerType),
      pd("max_records_per_file", LongType, "0")),
    out("version" -> IntegerType, "in_files" -> IntegerType,
      "buckets" -> IntegerType)) {
    override protected def run(spark: SparkSession,
                               in: InternalRow): Array[Any] = {
      val r = Optimize.clusterByBuckets(spark, str(in, 0), str(in, 1),
        in.getInt(2), in.getLong(3))
      Array(r.version, r.inFiles, r.outFiles)
    }
  }

  /** `restore(table, version)` — [[Snapshots.restore]]: roll back by
    * republishing the old manifest (zero data movement), schema and
    * deletion vectors carried explicitly. */
  private object RestoreProcedure extends OneRowProcedure(
    "restore",
    "roll the table back to a version (zero data movement, undoable)",
    Array(p("table", StringType), p("version", IntegerType)),
    out("restored_version" -> IntegerType, "new_version" -> IntegerType)) {
    override protected def run(spark: SparkSession,
                               in: InternalRow): Array[Any] = {
      val target = in.getInt(1)
      val v = Snapshots.restore(spark, str(in, 0), target)
      Array(target, v)
    }
  }

  /** `delete_keys(table, key_col, keys)` — the GDPR erase from SQL:
    * [[DeleteRows.deleteKeysWithVectors]], the merge-on-read path — a
    * `#dv=` sidecar suppresses the rows, ZERO data files move. `keys`
    * is a comma-separated long list (procedure arguments are scalars).
    * `compact` reconciles the vectors away. */
  private object DeleteKeysProcedure extends OneRowProcedure(
    "delete_keys",
    "merge-on-read erase of key_col IN (keys): records deletion " +
      "vectors, rewrites zero files",
    Array(p("table", StringType), p("key_col", StringType),
      p("keys", StringType)),
    out("version" -> IntegerType, "files_rewritten" -> IntegerType,
      "files_kept" -> IntegerType)) {
    override protected def run(spark: SparkSession,
                               in: InternalRow): Array[Any] = {
      val keys = str(in, 2).split(",").map(_.trim).filter(_.nonEmpty)
        .map(_.toLong).toSeq
      val r = DeleteRows.deleteKeysWithVectors(spark, str(in, 0),
        str(in, 1), keys)
      Array(r.version, r.filesRewritten, r.filesKept)
    }
  }

  /** `vacuum(table, keep)` — [[Snapshots.vacuum]]: physical
    * reclamation of out-of-retention versions (the second half of the
    * GDPR story). */
  private object VacuumProcedure extends OneRowProcedure(
    "vacuum",
    "drop manifests older than the newest `keep` versions and delete " +
      "unreferenced data files",
    Array(p("table", StringType), pd("keep", IntegerType, "1")),
    out("manifests_dropped" -> IntegerType,
      "data_files_deleted" -> IntegerType)) {
    override protected def run(spark: SparkSession,
                               in: InternalRow): Array[Any] = {
      val (m, f) = Snapshots.vacuum(spark, str(in, 0), in.getInt(1))
      Array(m, f)
    }
  }

  /** `create_tag(table, name, version)` — [[Snapshots.createTag]]:
    * pin a version under an immutable name (version -1 = current).
    * The pin survives vacuum; `VERSION AS OF 'name'` reproduces the
    * snapshot — training-data lineage as one ref file. */
  private object CreateTagProcedure extends OneRowProcedure(
    "create_tag",
    "pin a version under an immutable name (survives vacuum; " +
      "readable via VERSION AS OF 'name')",
    Array(p("table", StringType), p("name", StringType),
      pd("version", IntegerType, "-1")),
    out("tag" -> StringType, "pinned_version" -> IntegerType)) {
    override protected def run(spark: SparkSession,
                               in: InternalRow): Array[Any] = {
      val version = if (in.getInt(2) < 0) None else Some(in.getInt(2))
      val v = Snapshots.createTag(str(in, 0), str(in, 1), version)
      Array(org.apache.spark.unsafe.types.UTF8String
        .fromString(str(in, 1)), v)
    }
  }

  /** `drop_tag(table, name)` — release the pin; the next vacuum may
    * reclaim the version. */
  private object DropTagProcedure extends OneRowProcedure(
    "drop_tag",
    "drop a tag (releases the retention pin)",
    Array(p("table", StringType), p("name", StringType)),
    out("tag" -> StringType, "existed" -> BooleanType)) {
    override protected def run(spark: SparkSession,
                               in: InternalRow): Array[Any] = {
      val existed = Snapshots.dropTag(str(in, 0), str(in, 1))
      Array(org.apache.spark.unsafe.types.UTF8String
        .fromString(str(in, 1)), existed)
    }
  }

  /** `clone(src, dst, version)` — [[Snapshots.cloneTable]]: shallow
    * clone (zero data movement); auto-pins the source version with a
    * `clone-<id>` tag so source vacuum can never strand the clone. */
  private object CloneProcedure extends OneRowProcedure(
    "clone",
    "shallow-clone a version into a new table (zero bytes move); " +
      "pins the source with a clone-<id> tag",
    Array(p("src", StringType), p("dst", StringType),
      pd("version", IntegerType, "-1")),
    out("clone_version" -> IntegerType, "source_tag" -> StringType)) {
    override protected def run(spark: SparkSession,
                               in: InternalRow): Array[Any] = {
      val version = if (in.getInt(2) < 0) None else Some(in.getInt(2))
      val (v, tag) = Snapshots.cloneTable(spark, str(in, 0), str(in, 1),
        version)
      Array(v, org.apache.spark.unsafe.types.UTF8String.fromString(tag))
    }
  }

  val all: Seq[UnboundProcedure] = Seq(CompactProcedure,
    CompactSmallProcedure, ZorderProcedure, ClusterByProcedure,
    RestoreProcedure, DeleteKeysProcedure, VacuumProcedure,
    CreateTagProcedure, DropTagProcedure, CloneProcedure)

  def byName(name: String): Option[UnboundProcedure] =
    all.find(_.name().equalsIgnoreCase(name))
}
