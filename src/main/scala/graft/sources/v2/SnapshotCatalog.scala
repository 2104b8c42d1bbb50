package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Snapshots

/** V2 CATALOG over snapshot tables — the piece that unlocks
  * STORAGE-PARTITIONED JOINS (SPARK-37377): Spark only resolves a
  * scan-reported `bucket(n, col)` partitioning when the relation came
  * through a catalog that can also serve the bucket FUNCTION (the
  * `FunctionCatalog` face), so path-based `spark.read.format(...)`
  * reads can never shuffle-eliminate. Register once and address tables
  * by directory:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_snap",
  *     classOf[graft.sources.v2.SnapshotCatalog].getName)
  *   spark.table("graft_snap.snap.`/data/events_tbl`")
  * }}}
  *
  * With both join sides bucket-clustered by
  * [[graft.operators.Optimize.clusterByBuckets]] on their join keys
  * (same bucket count) and `spark.sql.sources.v2.bucketing.enabled`,
  * the join plans with ZERO shuffle exchanges: each task reads bucket i
  * of both tables and joins locally — at 100 TB the difference between
  * re-shuffling two fact tables per join and a metadata handshake.
  *
  * The catalog is read-facing (load/list); DDL mutations go through the
  * engine's commit operators, so create/alter/drop refuse loudly.
  */
class SnapshotCatalog extends TableCatalog with FunctionCatalog
    with ProcedureCatalog {

  private var catName: String = "graft_snap"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
  }

  override def name(): String = catName

  /** The identifier's NAME is the table directory (backtick-quote it:
    * `` graft_snap.snap.`/tmp/t` ``). The namespace selects the DML
    * family: `snap` (default) = copy-on-write; `mor` = merge-on-read
    * (`dmlMode 'merge-on-read'` — DELETE/UPDATE/MERGE write deletion
    * vectors / position deltas instead of rewriting files). Same
    * directory, same data — the namespace is a per-statement routing
    * choice, exactly like opening the table with the option. */
  override def loadTable(ident: Identifier): Table = {
    val dir = ident.name()
    if (Snapshots.currentVersion(dir) == 0) throw new NoSuchTableException(ident)
    val base = Map("path" -> dir)
    val opts = new CaseInsensitiveStringMap(
      (if (ident.namespace().lastOption.contains("mor"))
         base + ("dmlMode" -> "merge-on-read")
       else base).asJava)
    val schema = new SnapshotsDataSource().inferSchema(opts)
    new SnapshotTable(schema, opts)
  }

  /** SQL `VERSION AS OF n` — the version string resolves through the
    * same read option the DataFrame path uses. */
  override def loadTable(ident: Identifier, version: String): Table =
    withOption(ident, "versionAsOf", version)

  /** SQL `TIMESTAMP AS OF t` — Spark hands MICROseconds since epoch;
    * the manifest log resolves at millisecond publication times. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    withOption(ident, "timestampAsOf", (timestampMicros / 1000L).toString)

  private def withOption(ident: Identifier, key: String,
                         value: String): Table = {
    val dir = ident.name()
    if (Snapshots.currentVersion(dir) == 0) throw new NoSuchTableException(ident)
    val opts = new CaseInsensitiveStringMap(
      Map("path" -> dir, key -> value).asJava)
    val schema = new SnapshotsDataSource().inferSchema(opts)
    new SnapshotTable(schema, opts)
  }

  override def tableExists(ident: Identifier): Boolean =
    Snapshots.currentVersion(ident.name()) > 0

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "snapshot tables are created by Snapshots.commit, not catalog DDL")

  /** SQL `ALTER TABLE … ADD COLUMNS / RENAME COLUMN / DROP COLUMN` —
    * pure-metadata schema evolution: the commit republishes the current
    * entries BY REFERENCE under a new `#schema=` header (zero data
    * movement; old files serve an added column as null).
    *
    * RENAME and DROP are served through COLUMN-ID MAPPING
    * (VERDICT r13 #6, the Iceberg approach): ids are stable across
    * renames (old files' bytes resolve by id under the new name) and
    * never reused (a dropped-then-re-added name gets a fresh id, so the
    * old bytes stay dead). Both therefore require every CURRENT data
    * file to carry parquet field ids — id-less legacy files can only
    * match by name, which is exactly the resurrection hazard — and
    * refuse loudly otherwise (compaction/OPTIMIZE re-stamps a legacy
    * table in one rewrite).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = ident.name()
    val cur = Snapshots.currentVersion(dir)
    if (cur == 0) throw new NoSuchTableException(ident)
    val base = Snapshots.schemaOf(dir, cur).getOrElse {
      val opts = new CaseInsensitiveStringMap(Map("path" -> dir).asJava)
      new SnapshotsDataSource().inferSchema(opts)
    }
    // RENAME/DROP gate: the header AND every current file must be
    // id-mapped, or old bytes could resurrect / silently vanish
    lazy val idMapped = Snapshots.hasFieldIds(base) && {
      val conf = org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration
      SnapshotsDataSource.filesOf(conf, Snapshots.manifestEntries(dir, cur))
        .forall { case (f, _) => SnapshotsDataSource.fileHasFieldIds(conf, f) }
    }
    def requireIdMapped(what: String): Unit = require(idMapped,
      s"$what needs column-id mapping: every data file of $dir must " +
        "carry parquet field ids (id-less files match by name, which " +
        "would resurrect or lose bytes) — legacy tables stay id-less " +
        "by design; re-commit the rows into a fresh table (every table " +
        "this engine bootstraps is id-mapped from v1), then retry")
    var nextId = Snapshots.maxFieldIdEver(dir)
    val widened = changes.foldLeft(base) {
      case (s, add: TableChange.AddColumn) =>
        require(add.fieldNames.length == 1,
          "snapshot tables are flat: nested column adds are not supported")
        val name = add.fieldNames.head
        require(!s.fieldNames.contains(name),
          s"column $name already exists on $dir")
        // always nullable: pre-evolution files have no values for it.
        // On an id-mapped table the new column gets a FRESH id (above
        // the max EVER assigned — never a reused one)
        val md =
          if (!Snapshots.hasFieldIds(s))
            org.apache.spark.sql.types.Metadata.empty
          else {
            nextId += 1
            new org.apache.spark.sql.types.MetadataBuilder()
              .putLong("parquet.field.id", nextId.toLong).build()
          }
        s.add(org.apache.spark.sql.types.StructField(
          name, add.dataType, nullable = true, metadata = md))
      case (s, ren: TableChange.RenameColumn) =>
        require(ren.fieldNames.length == 1,
          "snapshot tables are flat: nested renames are not supported")
        requireIdMapped("RENAME COLUMN")
        val from = ren.fieldNames.head
        require(s.fieldNames.contains(from), s"no column $from on $dir")
        require(!s.fieldNames.contains(ren.newName),
          s"column ${ren.newName} already exists on $dir")
        // same id, new name — readers resolve old files by id
        org.apache.spark.sql.types.StructType(s.fields.map(f =>
          if (f.name == from) f.copy(name = ren.newName) else f))
      case (s, del: TableChange.DeleteColumn) =>
        require(del.fieldNames.length == 1,
          "snapshot tables are flat: nested drops are not supported")
        requireIdMapped("DROP COLUMN")
        val name = del.fieldNames.head
        require(s.fieldNames.contains(name), s"no column $name on $dir")
        require(s.fields.length > 1, s"cannot drop the last column of $dir")
        org.apache.spark.sql.types.StructType(
          s.fields.filterNot(_.name == name))
      case (_, other) => throw new UnsupportedOperationException(
        s"snapshot tables support ADD/RENAME/DROP COLUMN (got $other)")
    }
    SnapshotsDataSource.validate(widened)
    // CAS at cur+1: a concurrent commit between the schema read above
    // and this publish fails the ALTER atomically instead of being
    // silently dropped from the republished entry list (ADVICE r13)
    Snapshots.commitManifest(dir, Snapshots.manifestEntries(dir, cur),
      Some(widened.json), expectedVersion = Some(cur))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "refusing catalog-driven drop of a snapshot table")

  override def renameTable(old: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException(
      "snapshot tables are addressed by directory; rename the directory")

  // ---- FunctionCatalog: exactly the bucket function the clustered
  // write used, so both join sides' TransformExpressions bind to the
  // same canonical function and compare equal
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, GraftBucketFunction.name()))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase(GraftBucketFunction.name()))
      GraftBucketFunction
    else throw new NoSuchFunctionException(ident)

  // ---- ProcedureCatalog: `CALL <cat>.system.<proc>(...)` — the SQL
  // maintenance surface ([[SnapshotProcedures]]: compact / zorder /
  // cluster_by / restore / delete_keys / vacuum). The namespace is
  // cosmetic like the table namespace; `system` is the convention.
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    SnapshotProcedures.all
      .map(pr => Identifier.of(namespace, pr.name())).toArray

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    SnapshotProcedures.byName(ident.name()).getOrElse(
      throw new RuntimeException(
        s"no procedure ${ident.name()} in catalog $catName (available: " +
          SnapshotProcedures.all.map(_.name()).mkString(", ") + ")"))
}

/** `bucket(numBuckets, key)` — the function behind the connector's
  * reported KeyGroupedPartitioning. The WRITE side
  * ([[graft.operators.Optimize.clusterByBuckets]]) computes the same
  * value as a Column (`pmod(xxhash64(key), n)`), and
  * [[GraftBucketFunction.bucketId]] is the scalar twin (same XXH64,
  * same seed, same sign fold) — SnapshotCatalogSpec pins the two equal,
  * because a layout whose metadata disagrees with its bytes would make
  * the shuffle-free join silently wrong.
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets INT, key BIGINT) -> INT: pmod(xxhash64(key), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType &&
      inputType.fields(1).dataType == LongType,
      s"bucket expects (INT numBuckets, BIGINT key), got $inputType")
    Bound
  }

  /** xxhash64(key) folded to [0, n) — identical to Spark's
    * `pmod(xxhash64(key), n)` (seed 42, null hashes to the seed). */
  def bucketId(key: java.lang.Long, n: Int): Int = {
    val h =
      if (key == null) 42L
      else org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(key.longValue(), 42L)
    (((h % n) + n) % n).toInt
  }

  private object Bound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input:
        org.apache.spark.sql.catalyst.InternalRow): Integer =
      Integer.valueOf(bucketId(
        if (input.isNullAt(1)) null else java.lang.Long.valueOf(input.getLong(1)),
        input.getInt(0)))
  }
}

/** Sidecar recording a snapshot version's hash-bucket layout: which
  * manifest entry (directory) holds which bucket of which column. A
  * version WITHOUT a covering sidecar simply reports unknown
  * partitioning — appends after a clustering never lie, they just lose
  * the shuffle-free property until the next OPTIMIZE.
  */
object BucketLayout {

  case class Spec(col: String, n: Int, entries: Map[String, Int])

  private def path(tableDir: String, version: Int) =
    Paths.get(s"$tableDir/_bucketspec/v$version.txt")

  def write(tableDir: String, version: Int, col: String, n: Int,
            entries: Seq[(String, Int)]): Unit = {
    Files.createDirectories(Paths.get(s"$tableDir/_bucketspec"))
    val body = (s"$col\t$n" +: entries.map { case (p, b) => s"$b\t$p" })
      .mkString("\n")
    Files.write(path(tableDir, version),
      body.getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    ()
  }

  def read(tableDir: String, version: Int): Option[Spec] = {
    val p = path(tableDir, version)
    if (!Files.exists(p)) None
    else {
      val lines = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .split("\n").toSeq
      val head = lines.head.split("\t")
      Some(Spec(head(0), head(1).toInt,
        lines.tail.filter(_.nonEmpty).map { l =>
          val Array(b, dir) = l.split("\t", 2)
          dir -> b.toInt
        }.toMap))
    }
  }
}
